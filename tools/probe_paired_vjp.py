"""HISTORICAL A/B probe: 4D paired-build adjoint formulations (real chip).

Round-4 first wave measured the octo-paired build's d_vol backward against a
hand slicefold VJP while the build was still the 4D stack+moveaxis form. The
shipped build has since moved to the 2D-flat lane-concat form (see
tools/probe_paired_build.py and ops/grid_sample.paired_volume) which beats
everything below — this probe keeps the superseded forms runnable so the
BENCH_NOTES round-4 rows stay reproducible:

  autodiff4d  — 4D stack+moveaxis build, XLA-transposed adjoint   (94.1 ms dvol)
  slicefold   — 4D build + hand separable 8-slice fold VJP        (77.1 ms dvol)
  current     — shipped 2D-flat build, plain autodiff             (48.1 ms dvol)

(A fourth form — a fully hand-written sampler VJP with a separable pad-shift
octant fold over (2, 2, 2, C) minor axes — measured SLOWER than autodiff,
109.6 vs 95.0 ms full, and was deleted; lane-poor minor layout.)

Timing: iterations chained on-device (next grid derives from prev grads), one
value fetch per window (tunnel defers + memoizes; CLAUDE.md rules).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/probe_paired_vjp.py \
           [fwd|dvol|dgrid|full ...]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

D, H, W, C = 128, 120, 176, 8
N = 1112 * 128 * 3
STEPS = 30


def _build_4d(vol):
    """Superseded 4D stack+moveaxis build (rows (D+1)(H+1)(W+1), oct*C lanes)."""
    volZ2 = jnp.pad(vol, ((1, 1), (1, 1), (1, 1), (0, 0)))
    octants = [volZ2[dz:dz + D + 1, dy:dy + H + 1, dx:dx + W + 1]
               for dz in (0, 1) for dy in (0, 1) for dx in (0, 1)]
    volP = jnp.moveaxis(jnp.stack(octants, 0), 0, 3)
    return volP.reshape((D + 1) * (H + 1) * (W + 1), 8 * C)


@jax.custom_vjp
def _build_4d_slicefold(vol):
    return _build_4d(vol)


def _b4s_fwd(vol):
    return _build_4d(vol), None


def _b4s_bwd(_, d_flat):
    dP = d_flat.reshape(D + 1, H + 1, W + 1, 8, C)
    A = dP[1:, :, :, 0:4] + dP[:-1, :, :, 4:8]
    B = A[:, 1:, :, 0:2] + A[:, :-1, :, 2:4]
    return (B[:, :, 1:, 0] + B[:, :, :-1, 1],)


_build_4d_slicefold.defvjp(_b4s_fwd, _b4s_bwd)


def _sample_4d(build, vol, grid):
    from zest_tpu.ops.grid_sample import _rows_weights_combine, _unnormalize
    flat = build(vol)
    x = _unnormalize(grid[..., 0], W)
    y = _unnormalize(grid[..., 1], H)
    z = _unnormalize(grid[..., 2], D)

    def taps(v, n):
        v0 = jnp.floor(v)
        f = v - v0
        w0 = jnp.where((v0 >= 0) & (v0 <= n - 1), 1.0 - f, 0.0)
        w1 = jnp.where((v0 + 1 >= 0) & (v0 + 1 <= n - 1), f, 0.0)
        return (jnp.clip(v0 + 1, 0, n).astype(jnp.int32),
                jnp.stack([w0, w1], -1))

    ix0, wx = taps(x, W)
    iy0, wy = taps(y, H)
    iz0, wz = taps(z, D)
    row_idx = (iz0 * (H + 1) + iy0) * (W + 1) + ix0     # 4D-table strides
    w = (wz[..., :, None, None] * wy[..., None, :, None]
         * wx[..., None, None, :])
    rows = jnp.take(flat, row_idx, axis=0)
    return _rows_weights_combine(rows, w, C)


def autodiff4d(vol, grid):
    return _sample_4d(_build_4d, vol, grid)


def slicefold(vol, grid):
    return _sample_4d(_build_4d_slicefold, vol, grid)


def current(vol, grid):
    from zest_tpu.ops.grid_sample import grid_sample_3d_paired
    return grid_sample_3d_paired(vol, grid)


def timed(name, fn, vol, grid0, g, mode="full"):
    """mode: full (d_vol + d_grid) | dvol (grid sg'd) | dgrid (vol sg'd) |
    fwd (no grad)."""
    @jax.jit
    def step(gr):
        def loss(v, n):
            if mode == "dvol":
                n = jax.lax.stop_gradient(n)
            if mode == "dgrid":
                v = jax.lax.stop_gradient(v)
            return jnp.vdot(fn(v, n), g)

        if mode == "fwd":
            l = loss(vol, gr)
            return gr + l * 1e-12, l
        l, grads = jax.value_and_grad(loss, argnums=(0, 1))(vol, gr)
        dn = grads[1] if mode != "dvol" else jnp.zeros_like(gr)
        return (gr + dn * 1e-9 + l * 1e-12,
                l + jnp.sum(grads[0].astype(jnp.float32)[::7, 0, 0, 0]))

    gr, l = step(grid0)
    float(l)
    t0 = time.perf_counter()
    gr = grid0
    for _ in range(STEPS):
        gr, l = step(gr)
    float(l)
    dt = (time.perf_counter() - t0) / STEPS * 1e3
    print(f"{name:16s} {mode:6s} {dt:8.2f} ms ({N} pts)", flush=True)


def main():
    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}", flush=True)
    vol = jnp.asarray(rng.normal(size=(D, H, W, C)).astype(np.float32)
                      ).astype(jnp.bfloat16)
    grid = jnp.asarray(rng.uniform(-1.02, 1.02, size=(N, 3)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(N, C)).astype(np.float32))

    # correctness cross-check on a slice (f32 volume for tight tolerance)
    vol32 = jnp.asarray(rng.normal(size=(D, H, W, C)).astype(np.float32))
    sl = grid[:8192]
    ga = jax.jit(jax.grad(
        lambda v, n: jnp.vdot(autodiff4d(v, n), g[:8192]),
        argnums=(0, 1)))(vol32, sl)
    for other, nm2 in ((slicefold, "slicefold"), (current, "current")):
        gc = jax.jit(jax.grad(
            lambda v, n: jnp.vdot(other(v, n), g[:8192]),
            argnums=(0, 1)))(vol32, sl)
        for i, nm in ((0, "d_vol"), (1, "d_grid")):
            err = float(jnp.max(jnp.abs(ga[i] - gc[i])))
            ref = float(jnp.max(jnp.abs(ga[i]))) or 1.0
            print(f"{nm2}/{nm}: max|Δ| = {err:.3e} (rel {err / ref:.2e})",
                  flush=True)

    modes = sys.argv[1:] or ["fwd", "dvol", "full"]
    for mode in modes:
        timed("autodiff4d", autodiff4d, vol, grid, g, mode)
        timed("slicefold", slicefold, vol, grid, g, mode)
        timed("current", current, vol, grid, g, mode)


if __name__ == "__main__":
    main()
