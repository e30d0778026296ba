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

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp

from .feature_net import BatchNormAct
from .init import torch_conv_kernel_init
from .. import flags


def _widened_conv(xb, k2, s):
    return jax.lax.conv_general_dilated(
        xb, k2, (s, s), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _taps(o, s, d_out, oc):
    # out[i] = Σ_dz conv(x[s·i+dz-1], k[dz]) = Σ_dz op[s·i+dz, ..., blk dz]
    op = jnp.pad(o, ((1, 1), (0, 0), (0, 0), (0, 0)))

    def tap(dz):
        return jax.lax.slice(op, (dz, 0, 0, dz * oc),
                             (dz + (d_out - 1) * s + 1,) + op.shape[1:3]
                             + ((dz + 1) * oc,), (s, 1, 1, 1))

    return tap(0) + tap(1) + tap(2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _conv3dz2d_concat(xb, k2, s, d_out, oc):
    """Conv3dZ2D body with a concat-built adjoint (bit-exact).

    XLA transposes the z-tap shift-add into pad/slice adjoints on 3·oc-minor
    layouts — the same narrow-minor relayout tax measured on the paired-build
    fold (BENCH_NOTES round 4). Building the widened-conv cotangent d_o
    DIRECTLY as one lane-concat of z-shifted d_out blocks skips those
    intermediates: isolated U-Net fwd+bwd 17.6 → 13.3 ms on the real chip,
    grads bitwise equal (tools/probe_unet.py, round 5)."""
    return _taps(_widened_conv(xb, k2, s), s, d_out, oc)


def _c3_fwd(xb, k2, s, d_out, oc):
    return _conv3dz2d_concat(xb, k2, s, d_out, oc), (xb, k2)


def _c3_bwd(s, d_out, oc, res, g):
    xb, k2 = res
    Dz = xb.shape[0]
    # out[i] = Σ_dz o[s·i + dz - 1, dz-block] → d_o[r, dz-block] =
    # g[(r + 1 - dz)/s] (exact division only). Interleave g into the o row
    # space (s-1 zero rows per row), z-shift by dz-1, then ONE wide
    # lane-concat; d_xb/d_k2 via XLA's conv-grad machinery on the widened conv.
    if s == 1:
        gz = g
    else:
        gz = jnp.concatenate(
            [g[:, None], jnp.zeros((g.shape[0], s - 1) + g.shape[1:],
                                   g.dtype)], 1).reshape(
            (g.shape[0] * s,) + g.shape[1:])
    pad1 = jnp.zeros_like(gz[:1])

    def block(dz):
        shift = dz - 1                      # block[r] = gz[r - shift]
        if shift == 0:
            t = gz
        elif shift > 0:
            t = jnp.concatenate([pad1, gz[:-1]], 0)
        else:
            t = jnp.concatenate([gz[1:], pad1], 0)
        return t[:Dz]

    d_o = jnp.concatenate([block(0), block(1), block(2)], -1)
    _, vjp = jax.vjp(lambda a, b: _widened_conv(a, b, s), xb, k2)
    return vjp(d_o)


_conv3dz2d_concat.defvjp(_c3_fwd, _c3_bwd)


class Conv3dZ2D(nn.Module):
    """3D conv (k=3, 'SAME') as 3 z-shifted 2D convs with D folded into batch.

    XLA's TPU 3D convolutions choose channels-minor layouts; with the U-Net's
    tiny channel counts (8-64) that wastes up to 94% of the vector lanes —
    the 48→8 conv0 ran at ~1.6 TFLOP/s (round-2 profile). Folding the 128-deep
    D axis into the conv batch gives XLA a large batch to tile over: measured
    332→13 ms fwd / 50→23 ms fwd+bwd for conv0 shapes on a v5e. Exactly
    equivalent (the z taps become shifted batch slices; stride-2 z becomes a
    strided slice), same param tree as nn.Conv ("kernel", [3,3,3,in,out]).
    """
    out_ch: int
    stride: int = 1
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x):
        N, D, H, W, C = x.shape
        kernel = self.param("kernel", torch_conv_kernel_init,
                            (3, 3, 3, C, self.out_ch)).astype(self.dtype)
        s = self.stride
        d_out = -(-D // s)
        # folding D into the conv batch and z-padding/shifting THAT axis bleeds
        # data across samples for N > 1 — enforce the single-volume contract
        assert N == 1, f"Conv3dZ2D requires N == 1 (got N={N}); vmap over N"
        xb = x.reshape(N * D, H, W, C)
        # ONE widened conv (3·out channels, k2[..., o·3+dz] = kernel[dz]) over
        # the unpadded input, then shift-add the OUTPUT z-taps. The round-2
        # form padded + 3x z-shift-sliced the INPUT: ~37 ms/step of pad/slice
        # (+ their transposes) on the sub-128-lane volume layouts (round-3
        # profile); outputs are up to 6x narrower and the shift-adds fuse.
        # Stride-2 (z) pays 2x conv FLOPs (all D rows computed, half kept) —
        # those layers are 8-16x smaller, the pad/slice savings dominate.
        # kz-major widened channels ([dz·out + o]): keeps the shift-add
        # operands 4D with a dense 3·out-lane minor — the 5D [.., out, 3] form
        # ran its pads/slices on a minor-3 tile layout (42x lane-pad waste;
        # ~68 ms of pad/slice in the round-3 step profile)
        k2 = kernel.transpose(1, 2, 3, 0, 4).reshape(3, 3, C, self.out_ch * 3)
        if flags.UNET_CONCAT_ADJOINT:
            out = _conv3dz2d_concat(xb, k2, s, d_out, self.out_ch)
        else:
            out = _taps(_widened_conv(xb, k2, s), s, d_out, self.out_ch)
        return out.reshape((N, d_out) + out.shape[1:])


class ConvBnReLU3D(nn.Module):
    """Conv3d(bias=False) + BN + leaky_relu. Mirrors networks.py:948-959."""
    out_ch: int
    kernel: int = 3
    stride: int = 1
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = Conv3dZ2D(self.out_ch, stride=self.stride, dtype=self.dtype,
                      name="conv")(x.astype(self.dtype))
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
        # convert by flip(spatial) + transpose(2,3,4,0,1).
        #
        # The z (depth) dilation is phase-split instead of materialized: with
        # z-dilated input xdil[2i]=x[i] and padding (1,2), output plane p draws
        # from taps j=p+dz where only odd j hit data → even planes see only
        # k[1], odd planes k[0] and k[2] (shifted). Folding D into the conv
        # batch this becomes three 2D lhs-dilated convs + an interleave —
        # avoiding XLA's slow channels-minor 3D conv path (see Conv3dZ2D).
        N, D, H, W, C = x.shape
        # same single-volume contract as Conv3dZ2D: the x_next roll below is a
        # cross-sample bleed for N > 1
        assert N == 1, f"_UpConvBn requires N == 1 (got N={N}); vmap over N"
        kernel = self.param("deconv_kernel", torch_conv_kernel_init,
                            (3, 3, 3, C, self.out_ch)).astype(self.dtype)
        xb = x.astype(self.dtype).reshape(N * D, H, W, C)

        def up2d(xs, k2):
            return jax.lax.conv_general_dilated(
                xs, k2, window_strides=(1, 1), padding=[(1, 2)] * 2,
                lhs_dilation=(2, 2),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        out_even = up2d(xb, kernel[1])                       # plane 2i ← x[i]
        x_next = jnp.concatenate([xb[1:], jnp.zeros_like(xb[:1])], axis=0)
        out_odd = up2d(xb, kernel[0]) + up2d(x_next, kernel[2])  # plane 2i+1
        out = jnp.stack([out_even, out_odd], axis=1)         # [D, 2, 2H, 2W, C']
        out = out.reshape((N, 2 * D) + out.shape[2:])
        return BatchNormAct(name="bn")(out)


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
