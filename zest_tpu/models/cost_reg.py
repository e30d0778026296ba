"""3D cost-volume regularization U-Net — Flax, channels-last.

Re-design of the reference ``CostRegNet`` (``/root/reference/networks.py:1003-1059``):
encoder 41→8→16→32→64 (three stride-2 3D convs), decoder via transposed 3D convs with
skip *additions*, 8 output channels. InPlaceABN → BatchNorm(batch stats) + leaky_relu
(see feature_net.py docstring for the rationale).

Transposed convs use kernel 3, stride 2, 'SAME' padding — output size exactly 2x input,
matching torch's (k=3, s=2, p=1, output_padding=1) shape arithmetic. Spatial dims must be
divisible by 8 (three halvings), guaranteed by the /32-divisible image sizes + pad.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .feature_net import BatchNormAct
from .init import torch_conv_kernel_init


class ConvBnReLU3D(nn.Module):
    """Conv3d(bias=False) + BN + leaky_relu. Mirrors networks.py:948-959."""
    out_ch: int
    kernel: int = 3
    stride: int = 1
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel
        x = nn.Conv(self.out_ch, (k, k, k), strides=self.stride, padding=k // 2,
                    use_bias=False, dtype=self.dtype,
                    kernel_init=torch_conv_kernel_init, name="conv")(x)
        return BatchNormAct(name="bn")(x)


class _UpConvBn(nn.Module):
    """ConvTranspose3d(k=3, s=2, bias=False) + BN+act: decoder upsampling block."""
    out_ch: int
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x):
        # exact torch ConvTranspose3d(k=3, s=2, p=1, output_padding=1) semantics:
        # lhs-dilated conv with padding (k-1-p, k-1-p+op) = (1, 2); the kernel is
        # stored pre-flipped in [kd, kh, kw, in, out] layout so torch weights
        # convert by flip(spatial) + transpose(2,3,4,0,1)
        in_ch = x.shape[-1]
        kernel = self.param("deconv_kernel", torch_conv_kernel_init,
                            (3, 3, 3, in_ch, self.out_ch)).astype(self.dtype)
        x = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel, window_strides=(1, 1, 1),
            padding=[(1, 2)] * 3,
            lhs_dilation=(2, 2, 2),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        return BatchNormAct(name="bn")(x)


class CostRegNet(nn.Module):
    """Cost volume [B, D, h, w, C_in] → encoding volume [B, D, h, w, 8].

    Submodule names follow the reference state-dict layout (networks.py:1010-1034)."""

    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        x = x.astype(dt)
        conv0 = ConvBnReLU3D(8, dtype=dt, name="conv0")(x)
        conv2 = ConvBnReLU3D(16, dtype=dt, name="conv2")(
            ConvBnReLU3D(16, stride=2, dtype=dt, name="conv1")(conv0))
        conv4 = ConvBnReLU3D(32, dtype=dt, name="conv4")(
            ConvBnReLU3D(32, stride=2, dtype=dt, name="conv3")(conv2))
        x = ConvBnReLU3D(64, dtype=dt, name="conv6")(
            ConvBnReLU3D(64, stride=2, dtype=dt, name="conv5")(conv4))
        x = conv4 + _UpConvBn(32, dtype=dt, name="conv7")(x)
        x = conv2 + _UpConvBn(16, dtype=dt, name="conv9")(x)
        x = conv0 + _UpConvBn(8, dtype=dt, name="conv11")(x)
        return x
