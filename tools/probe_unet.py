"""A/B probe: CostRegNet (3D U-Net) backward formulations on the real chip.

VERDICT r4 next #4: the widened-conv z-fold took the U-Net FORWARD to ~15 ms
(both volumes) but its backward (~31 ms incl. banded-trilinear d_vol) never
got the same treatment. This probe stage-attributes the isolated U-Net
fwd/bwd at flagship shape ([1, 128, 120, 176, 41] bf16, the static cost
volume — reference CostRegNet /root/reference/networks.py:1003-1059) and A/Bs
an adjoint reformulation:

  base    — Conv3dZ2D as shipped; XLA autodiff (the z-tap shift-add
            transposes to pad/slice adjoints on 3·oc-minor layouts — the
            same narrow-minor tiling that cost the paired-build fold 2x,
            BENCH_NOTES round 4)
  concat  — custom VJP: the widened-conv cotangent d_o is built DIRECTLY as
            a lane-concat of z-shifted d_out blocks (d_o[r, dz·oc:(dz+1)·oc]
            = d_out[(r+1-dz)/s]), so the adjoint never materializes the
            padded/sliced 3·oc-minor intermediates; d_xb/d_k then come from
            one jax.vjp of the plain 2D conv (XLA's conv-grad machinery,
            unchanged).

Variants are exact (same conv, reassociated adjoint adds).

Timing: chained on-device, one value fetch per window (CLAUDE.md rules).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/probe_unet.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import flax.linen as nn  # noqa: E402

from zest_tpu.models.cost_reg import CostRegNet, ConvBnReLU3D  # noqa: E402
from zest_tpu.models.feature_net import BatchNormAct  # noqa: E402
from zest_tpu.models.init import torch_conv_kernel_init  # noqa: E402

D, H, W, C = 128, 120, 176, 41
STEPS = 30


def timed(name, loss_fn, params, x0):
    g_fn = jax.jit(jax.grad(loss_fn))

    # x0 rides as a jit ARGUMENT — closing over the ~440 MB slab serializes
    # it into the remote compile request → HTTP 413 (CLAUDE.md).
    def chain(p, i, x):
        g = g_fn(p, x + (i + 1) * 1e-4)
        return jax.tree.map(lambda a, b: a + 1e-4 * b, p, g), i + 1, g

    chain_j = jax.jit(chain)
    p, i, g = chain_j(params, jnp.float32(0.0), x0)
    float(jax.tree.leaves(g)[0].reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(STEPS):
        p, i, g = chain_j(p, i, x0)
    float(jax.tree.leaves(g)[0].reshape(-1)[0])
    dt = (time.perf_counter() - t0) / STEPS * 1e3
    print(f"fwd+bwd {name:18s} {dt:8.2f} ms", flush=True)
    return dt


def timed_fwd(name, fn, params, x0):
    f = jax.jit(lambda p, x: jnp.sum(fn(p, x).astype(jnp.float32)))
    float(f(params, x0))
    t0 = time.perf_counter()
    outs = []
    for i in range(STEPS):
        outs.append(f(params, x0 + (i + 1) * 1e-6))
    float(outs[-1])
    dt = (time.perf_counter() - t0) / STEPS * 1e3
    print(f"fwd     {name:18s} {dt:8.2f} ms", flush=True)
    return dt


# ---------------------------------------------------------------------------
# concat-adjoint Conv3dZ2D (exact reformulation of models/cost_reg.py:22-71)
# ---------------------------------------------------------------------------

def _widened_conv(xb, k2, s):
    return jax.lax.conv_general_dilated(
        xb, k2, (s, s), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def conv3dz2d_concat(xb, k2, s, d_out_z, oc):
    o = _widened_conv(xb, k2, s)
    op = jnp.pad(o, ((1, 1), (0, 0), (0, 0), (0, 0)))

    def tap(dz):
        return jax.lax.slice(op, (dz, 0, 0, dz * oc),
                             (dz + (d_out_z - 1) * s + 1,) + op.shape[1:3]
                             + ((dz + 1) * oc,), (s, 1, 1, 1))

    return tap(0) + tap(1) + tap(2)


def _c3_fwd(xb, k2, s, d_out_z, oc):
    return conv3dz2d_concat(xb, k2, s, d_out_z, oc), (xb, k2)


def _c3_bwd(s, d_out_z, oc, res, g):
    xb, k2 = res
    Dz = xb.shape[0]
    # out[i] = Σ_dz o[s·i + dz - 1, dz-block]  →  the o-cotangent is
    # d_o[r, dz-block] = g[(r + 1 - dz)/s] (exact division only). Build each
    # block by interleaving g into the o row space (s-1 zero rows per row)
    # and z-shifting by dz-1, then ONE wide lane-concat — no pad/slice
    # adjoint intermediates on 1·oc-minor layouts.
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
    d_xb, d_k2 = vjp(d_o)
    return d_xb, d_k2


conv3dz2d_concat.defvjp(_c3_fwd, _c3_bwd)


class Conv3dZ2DConcat(nn.Module):
    """Conv3dZ2D with the concat-adjoint custom VJP (probe variant)."""
    out_ch: int
    stride: int = 1
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x):
        N, Dz, Hh, Ww, Cc = x.shape
        kernel = self.param("kernel", torch_conv_kernel_init,
                            (3, 3, 3, Cc, self.out_ch)).astype(self.dtype)
        s = self.stride
        d_out = -(-Dz // s)
        assert N == 1
        xb = x.reshape(N * Dz, Hh, Ww, Cc)
        k2 = kernel.transpose(1, 2, 3, 0, 4).reshape(3, 3, Cc,
                                                     self.out_ch * 3)
        out = conv3dz2d_concat(xb, k2, s, d_out, self.out_ch)
        return out.reshape((N, d_out) + out.shape[1:])


class ConvBnReLU3DConcat(nn.Module):
    out_ch: int
    stride: int = 1
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = Conv3dZ2DConcat(self.out_ch, stride=self.stride, dtype=self.dtype,
                            name="conv")(x.astype(self.dtype))
        return BatchNormAct(name="bn")(x)


class CostRegNetConcat(nn.Module):
    """CostRegNet with concat-adjoint convs (decoder unchanged)."""
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x):
        from zest_tpu.models.cost_reg import _UpConvBn
        dt = self.dtype
        x = x.astype(dt)
        conv0 = ConvBnReLU3DConcat(8, dtype=dt, name="conv0")(x)
        conv2 = ConvBnReLU3DConcat(16, dtype=dt, name="conv2")(
            ConvBnReLU3DConcat(16, stride=2, dtype=dt, name="conv1")(conv0))
        conv4 = ConvBnReLU3DConcat(32, dtype=dt, name="conv4")(
            ConvBnReLU3DConcat(32, stride=2, dtype=dt, name="conv3")(conv2))
        x = ConvBnReLU3DConcat(64, dtype=dt, name="conv6")(
            ConvBnReLU3DConcat(64, stride=2, dtype=dt, name="conv5")(conv4))
        x = conv4 + _UpConvBn(32, dtype=dt, name="conv7")(x)
        x = conv2 + _UpConvBn(16, dtype=dt, name="conv9")(x)
        x = conv0 + _UpConvBn(8, dtype=dt, name="conv11")(x)
        return x


class EncoderOnly(nn.Module):
    """conv0..conv6 (encoder half) for stage attribution."""
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
        return x


class Conv0Only(nn.Module):
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x):
        return ConvBnReLU3D(8, dtype=self.dtype, name="conv0")(
            x.astype(self.dtype))


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(1, D, H, W, C)).astype(np.float32))

    base = CostRegNet(dtype=jnp.bfloat16)
    params = base.init(jax.random.PRNGKey(0), x0)

    # --- correctness: concat variant vs base (same params, f32, small slab)
    conc = CostRegNetConcat(dtype=jnp.float32)
    base32 = CostRegNet(dtype=jnp.float32)
    xs = x0[:, :16, :24, :32]
    ga = jax.jit(jax.grad(lambda p, x: jnp.sum(
        base32.apply(p, x).astype(jnp.float32) ** 2), argnums=(0, 1))
        )(params, xs)
    gb = jax.jit(jax.grad(lambda p, x: jnp.sum(
        conc.apply(p, x).astype(jnp.float32) ** 2), argnums=(0, 1))
        )(params, xs)
    for i, nm in ((1, "d_x"),):
        err = float(jnp.max(jnp.abs(ga[i] - gb[i])))
        ref = float(jnp.max(jnp.abs(ga[i]))) or 1.0
        print(f"concat/{nm}: max|dlt| = {err:.3e} (rel {err / ref:.2e})",
              flush=True)
    errs = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                        ga[0], gb[0])
    print(f"concat/d_params: max over tree = "
          f"{max(jax.tree.leaves(errs)):.3e}", flush=True)

    def loss_of(net):
        return lambda p, x: jnp.sum(
            net.apply(p, x).astype(jnp.float32) ** 2) * 1e-7

    timed_fwd("unet_base", lambda p, x: base.apply(p, x), params, x0)
    timed("unet_base", loss_of(base), params, x0)

    concb = CostRegNetConcat(dtype=jnp.bfloat16)
    timed("unet_concat", loss_of(concb), params, x0)

    enc = EncoderOnly(dtype=jnp.bfloat16)
    pe = enc.init(jax.random.PRNGKey(0), x0)
    timed("encoder_only", loss_of(enc), pe, x0)

    c0 = Conv0Only(dtype=jnp.bfloat16)
    p0 = c0.init(jax.random.PRNGKey(0), x0)
    timed_fwd("conv0_only", lambda p, x: c0.apply(p, x), p0, x0)
    timed("conv0_only", loss_of(c0), p0, x0)


if __name__ == "__main__":
    main()
