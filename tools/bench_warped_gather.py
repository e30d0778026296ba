"""Microbench: warped-sites trilinear sample+grad variants on the real chip.

The flagship step's largest single cost at random init is the XLA fallback for
scene-flow-warped volume sampling (~170 ms fwd gather + d_vol scatter,
BENCH_NOTES round 2). This compares gather layouts:

  v0: current grid_sample_3d            — 8 gathers of C     (C=8 lanes)
  v1: x-paired rows                      — 4 gathers of 2C
  v2: xz-paired super-volume             — 2 gathers of 4C    (32 lanes)
  v3: xz-paired + y-paired super-volume  — 1 gather  of 8C    (64 lanes)

All variants compute the exact same trilinear math (same taps/weights) with
coordinate gradients and volume gradients, timed fwd+bwd with forced value
fetches (the axon tunnel defers execution; block_until_ready is a no-op).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

D, H, W, C = 128, 120, 176, 8
R, S = 1112, 128
N = R * S * 3  # prev+post+chain points per step


def unnorm(g, n):
    return (g + 1.0) * 0.5 * (n - 1)


def taps_1d(v, n):
    v0 = jnp.floor(v)
    f = v - v0
    m0 = (v0 >= 0) & (v0 <= n - 1)
    m1 = (v0 + 1 >= 0) & (v0 + 1 <= n - 1)
    w0 = jnp.where(m0, 1.0 - f, 0.0)
    w1 = jnp.where(m1, f, 0.0)
    i0 = jnp.clip(v0, 0, n - 1).astype(jnp.int32)
    i1 = jnp.clip(v0 + 1, 0, n - 1).astype(jnp.int32)
    return i0, i1, w0, w1


def v0_sample(vol, grid):
    from zest_tpu.ops.grid_sample import grid_sample_3d
    return grid_sample_3d(vol.astype(jnp.bfloat16), grid).astype(jnp.float32)


def v1_sample(vol, grid):
    """x-paired: vol2[z,y,x] = concat(vol[z,y,x], vol[z,y,x+1]) -> 4 gathers of 2C."""
    v = vol.astype(jnp.bfloat16)
    vol2 = jnp.concatenate(
        [v, jnp.concatenate([v[:, :, 1:], jnp.zeros_like(v[:, :, :1])], 2)], -1)
    flat = vol2.reshape(D * H * W, 2 * C)
    x = unnorm(grid[..., 0], W)
    y = unnorm(grid[..., 1], H)
    z = unnorm(grid[..., 2], D)
    ix0, _, wx0, wx1 = taps_1d(x, W)
    iy0, iy1, wy0, wy1 = taps_1d(y, H)
    iz0, iz1, wz0, wz1 = taps_1d(z, D)

    def tap(zi, yi, wz, wy):
        rows = jnp.take(flat, (zi * H + yi) * W + ix0, axis=0)  # [..., 2C]
        pair = rows.reshape(rows.shape[:-1] + (2, C)).astype(jnp.float32)
        wx = jnp.stack([wx0, wx1], -1) * (wz * wy)[..., None]
        return jnp.einsum("...pc,...p->...c", pair, wx)

    return (tap(iz0, iy0, wz0, wy0) + tap(iz0, iy1, wz0, wy1)
            + tap(iz1, iy0, wz1, wy0) + tap(iz1, iy1, wz1, wy1))


def _pair_last(v, axis):
    shifted = jnp.concatenate(
        [jax.lax.slice_in_dim(v, 1, v.shape[axis], axis=axis),
         jnp.zeros_like(jax.lax.slice_in_dim(v, 0, 1, axis=axis))], axis)
    return jnp.concatenate([v, shifted], -1)


def v2_sample(vol, grid):
    """xz-paired: rows carry (x,x+1)x(z,z+1)xC = 4C -> 2 gathers (y0,y1)."""
    v = vol.astype(jnp.bfloat16)
    v = _pair_last(v, 2)           # x pair -> [D,H,W,2C]
    v = _pair_last(v, 0)           # z pair -> [D,H,W,4C]  (z,z+1 blocks)
    flat = v.reshape(D * H * W, 4 * C)
    x = unnorm(grid[..., 0], W)
    y = unnorm(grid[..., 1], H)
    z = unnorm(grid[..., 2], D)
    ix0, _, wx0, wx1 = taps_1d(x, W)
    iy0, iy1, wy0, wy1 = taps_1d(y, H)
    iz0, _, wz0, wz1 = taps_1d(z, D)

    def tap(yi, wy):
        rows = jnp.take(flat, (iz0 * H + yi) * W + ix0, axis=0)  # [..., 4C]
        quad = rows.reshape(rows.shape[:-1] + (2, 2, C)).astype(jnp.float32)
        wzx = (jnp.stack([wz0, wz1], -1)[..., :, None]
               * jnp.stack([wx0, wx1], -1)[..., None, :]) * wy[..., None, None]
        return jnp.einsum("...zxc,...zx->...c", quad, wzx)

    return tap(iy0, wy0) + tap(iy1, wy1)


def v3_sample(vol, grid):
    """xyz-paired: one gather of 8C per point."""
    v = vol.astype(jnp.bfloat16)
    v = _pair_last(v, 2)
    v = _pair_last(v, 1)
    v = _pair_last(v, 0)           # -> [D,H,W,8C]
    flat = v.reshape(D * H * W, 8 * C)
    x = unnorm(grid[..., 0], W)
    y = unnorm(grid[..., 1], H)
    z = unnorm(grid[..., 2], D)
    ix0, _, wx0, wx1 = taps_1d(x, W)
    iy0, _, wy0, wy1 = taps_1d(y, H)
    iz0, _, wz0, wz1 = taps_1d(z, D)
    rows = jnp.take(flat, (iz0 * H + iy0) * W + ix0, axis=0)      # [..., 8C]
    oct_ = rows.reshape(rows.shape[:-1] + (2, 2, 2, C)).astype(jnp.float32)
    wzyx = (jnp.stack([wz0, wz1], -1)[..., :, None, None]
            * jnp.stack([wy0, wy1], -1)[..., None, :, None]
            * jnp.stack([wx0, wx1], -1)[..., None, None, :])
    return jnp.einsum("...zyxc,...zyx->...c", oct_, wzyx)


def make_step(fn):
    @jax.jit
    def step(vol, ndc, g):
        def loss(vol, ndc):
            out = fn(vol, ndc * 2.0 - 1.0)
            return jnp.vdot(out, g)
        l, grads = jax.value_and_grad(loss, argnums=(0, 1))(vol, ndc)
        return l, grads[0].sum(), grads[1].sum()
    return step


def main():
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.normal(size=(D, H, W, C)).astype(np.float32))
    ndc0 = jnp.asarray(rng.uniform(0, 1, size=(N, 3)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(N, C)).astype(np.float32))

    fns = {"v0_8xC": v0_sample, "v1_4x2C": v1_sample, "v2_2x4C": v2_sample,
           "v3_1x8C": v3_sample}
    # correctness vs v0 first (loose: bf16 rounding differs by assoc order)
    outs = {}
    for name, fn in fns.items():
        outs[name] = np.asarray(jax.jit(fn)(vol, ndc0[:4096] * 2.0 - 1.0))
    for name in list(fns)[1:]:
        err = np.max(np.abs(outs[name] - outs["v0_8xC"]))
        print(f"{name}: max|Δ| vs v0 = {err:.4f}")

    for name, fn in fns.items():
        step = make_step(fn)
        l, gv, gn = step(vol, ndc0, g)
        float(l)  # force compile+exec
        n_it = 8
        t0 = time.perf_counter()
        prev = 0.0
        for i in range(n_it):
            # vary inputs: tunnel memoizes identical executions
            l, gv, gn = step(vol, ndc0 + prev * 1e-6, g)
            prev = float(l) % 1.0
        dt = (time.perf_counter() - t0) / n_it * 1000
        print(f"{name}: {dt:.1f} ms fwd+bwd ({N} pts)")


if __name__ == "__main__":
    main()
