"""2D feature CNN (FPN-lite) for the MVS encoder — Flax, channels-last.

Re-design of the reference ``FeatureNet`` (``/root/reference/networks.py:961-1001``).
The reference's fused InPlaceABN (CUDA ext) is replaced by BatchNorm + leaky_relu(0.01)
— InPlaceABN's default activation (SURVEY §2.7); "in-place" is meaningless under XLA
buffer assignment.

BatchNorm always normalizes with the *current batch* statistics: the reference forces
``.train()`` on the encoder even at eval (train.py:868, networks.py:626-643), so batch
stats are its effective behavior everywhere; we make that the only mode (no running
averages — functionally pure, shard-friendly).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .init import torch_conv_kernel_init


class BatchNormAct(nn.Module):
    """BatchNorm (batch stats only) + leaky_relu, matching InPlaceABN defaults
    (eps=1e-5, leaky slope 0.01).

    Stats are computed over a 2D [N·spatial, C] view in f32 — reducing the
    channel-minor 2D layout avoids XLA materializing transposed high-rank
    temporaries (observed 16x-padded 1.3 GB buffers when reducing the 5-D cost
    volume directly), and keeps bf16 inputs numerically stable.
    """
    use_act: bool = True
    eps: float = 1e-5
    slope: float = 0.01

    @nn.compact
    def __call__(self, x):
        x2d = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
        mean = jnp.mean(x2d, axis=0)
        var = jnp.mean(x2d * x2d, axis=0) - mean * mean
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        offset = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        inv = jax.lax.rsqrt(var + self.eps) * scale
        y = x * inv.astype(x.dtype) + (offset - mean * inv).astype(x.dtype)
        if self.use_act:
            y = nn.leaky_relu(y, negative_slope=self.slope)
        return y


class ConvBnReLU(nn.Module):
    """Conv2d(bias=False) + BN + leaky_relu. Mirrors networks.py:935-946."""
    out_ch: int
    kernel: int = 3
    stride: int = 1
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out_ch, (self.kernel, self.kernel), strides=self.stride,
                    padding=self.kernel // 2, use_bias=False, dtype=self.dtype,
                    kernel_init=torch_conv_kernel_init, name="conv")(x)
        return BatchNormAct(name="bn")(x)


class FeatureNet(nn.Module):
    """3-level FPN: 3→8 (H,W) →16 (H/2) →32 (H/4) + 1x1 toplayer.

    Mirrors networks.py:961-1001. Input [B, H, W, 3]; output [B, H/4, W/4, 32].
    Submodule names follow the reference state-dict layout (conv0_0 = conv0[0]
    etc.) so checkpoint conversion is a pure key/layout transform.

    Note: the reference's ``_upsample_add`` lateral connections exist in the class
    but its forward never calls them (networks.py:989-1001 is a straight
    downsampling chain); we reproduce the executed topology.
    """

    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        x = x.astype(dt)
        x = ConvBnReLU(8, 3, 1, dtype=dt, name="conv0_0")(x)
        x = ConvBnReLU(8, 3, 1, dtype=dt, name="conv0_1")(x)
        x = ConvBnReLU(16, 5, 2, dtype=dt, name="conv1_0")(x)
        x = ConvBnReLU(16, 3, 1, dtype=dt, name="conv1_1")(x)
        x = ConvBnReLU(16, 3, 1, dtype=dt, name="conv1_2")(x)
        x = ConvBnReLU(32, 5, 2, dtype=dt, name="conv2_0")(x)
        x = ConvBnReLU(32, 3, 1, dtype=dt, name="conv2_1")(x)
        x = ConvBnReLU(32, 3, 1, dtype=dt, name="conv2_2")(x)
        x = nn.Conv(32, (1, 1), dtype=dt, kernel_init=torch_conv_kernel_init,
                    name="toplayer")(x)
        return x
