"""A/B probe: paired-build adjoint formulations at flagship scale (real chip).

The round-4 ablation charges ~45 ms/step to the warped-sites d_vol backward,
but the clean 427k-row scatter floor is ~10 ms (probe_block_gather.py). The
suspect is the adjoint of the octo-paired super-volume build: autodiff folds
the scattered cotangent back through the transpose of stack+moveaxis (a
~358 MB relayout). Candidates measured here, all sampling 427k warped sites
from a bf16 flagship-sized volume:

  autodiff    — raw ``_paired_build`` differentiated by XLA's transpose
  slicefold   — ``paired_volume`` custom VJP: direct 8-static-slice sum into
                base [D, H, W, C] layout (the shipped form)

(A third form — a fully hand-written sampler VJP with a separable pad-shift
octant fold over (2, 2, 2, C) minor axes — measured SLOWER than autodiff,
109.6 vs 95.0 ms full, and was deleted; lane-poor minor layout.)

Timing: iterations chained on-device (next grid derives from prev grads), one
value fetch per window (tunnel defers + memoizes; CLAUDE.md rules).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/probe_paired_vjp.py \
           [fwd|dvol|dgrid|full ...]
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

D, H, W, C = 128, 120, 176, 8
N = 1112 * 128 * 3
STEPS = 30


def _sample_with(build, vol, grid):
    from zest_tpu.ops.grid_sample import _paired_taps, _rows_weights_combine
    flat = build(vol)
    row_idx, w = _paired_taps(grid, D, H, W)
    rows = jnp.take(flat, row_idx, axis=0)
    return _rows_weights_combine(rows, w, C)


def autodiff_paired(vol, grid):
    from zest_tpu.ops.grid_sample import _paired_build
    return _sample_with(_paired_build, vol, grid)


def slicefold_paired(vol, grid):
    from zest_tpu.ops.grid_sample import paired_volume
    return _sample_with(paired_volume, vol, grid)


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
        args = (0, 1)
        l, grads = jax.value_and_grad(loss, argnums=args)(vol, gr)
        dn = grads[1] if mode != "dvol" else jnp.zeros_like(gr)
        dv = grads[0]
        # chain: perturb grid by a grad-derived epsilon (defeats memoization)
        return (gr + dn * 1e-9 + l * 1e-12,
                l + jnp.sum(dv.astype(jnp.float32)[::7, 0, 0, 0]))

    gr, l = step(grid0)
    float(l)                       # compile + force
    t0 = time.perf_counter()
    gr = grid0
    for _ in range(STEPS):
        gr, l = step(gr)
    float(l)                       # one fetch forces the chain
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

    def l_a(v, n):
        return jnp.vdot(autodiff_paired(v, n), g[:8192])

    def l_c(v, n):
        return jnp.vdot(slicefold_paired(v, n), g[:8192])

    ga = jax.jit(jax.grad(l_a, argnums=(0, 1)))(vol32, sl)
    gc = jax.jit(jax.grad(l_c, argnums=(0, 1)))(vol32, sl)
    for i, nm in ((0, "d_vol"), (1, "d_grid")):
        err = float(jnp.max(jnp.abs(ga[i] - gc[i])))
        ref = float(jnp.max(jnp.abs(ga[i]))) or 1.0
        print(f"{nm}: max|Δ| = {err:.3e} (rel {err / ref:.2e})", flush=True)

    import sys
    modes = sys.argv[1:] or ["fwd", "dvol", "full"]
    for mode in modes:
        if mode == "parts":
            decompose(vol, grid, g)
            continue
        timed("autodiff", autodiff_paired, vol, grid, g, mode)
        timed("slicefold", slicefold_paired, vol, grid, g, mode)


def decompose(vol, grid, g):
    """Time the d_vol backward's parts in isolation: octant-weight expand
    (d_rows), wide-row scatter-add, and the 8-slice fold."""
    from zest_tpu.ops.grid_sample import _paired_taps, _paired_volume_for
    n_rows = (D + 1) * (H + 1) * (W + 1)
    fold = jax.vjp(_paired_volume_for(D, H, W, C),
                   vol)[1]  # d_flat -> (d_vol,)

    def t(name, step, x0):
        x, l = jax.jit(step)(x0)
        float(l)
        t0 = time.perf_counter()
        for _ in range(STEPS):
            x, l = jax.jit(step)(x)
        float(l)
        print(f"{name:16s} {(time.perf_counter() - t0) / STEPS * 1e3:8.2f} ms",
              flush=True)

    row_idx, w = jax.jit(lambda gr: _paired_taps(gr, D, H, W))(grid)

    def drows_step(gg):
        d_octo = gg[..., None, None, None, :] * w[..., None]
        d_rows = d_octo.reshape(-1, 8 * C).astype(jnp.bfloat16)
        s = jnp.sum(d_rows.astype(jnp.float32))
        return gg + s * 1e-12, s

    t("d_rows expand", drows_step, g)

    d_rows0 = jnp.asarray(
        np.random.default_rng(1).normal(size=(N, 8 * C)).astype(np.float32)
    ).astype(jnp.bfloat16)

    def scatter_step(dr):
        d_flat = jnp.zeros((n_rows, 8 * C), jnp.bfloat16
                           ).at[row_idx.reshape(-1)].add(dr)
        s = jnp.sum(d_flat.astype(jnp.float32))
        return (dr + s * 1e-12).astype(dr.dtype), s

    t("scatter", scatter_step, d_rows0)

    d_flat0 = jnp.zeros((n_rows, 8 * C), jnp.bfloat16
                        ).at[row_idx.reshape(-1)].add(d_rows0)

    def fold_step(df):
        (d_vol,) = fold(df)
        s = jnp.sum(d_vol.astype(jnp.float32))
        return (df + s * 1e-12).astype(df.dtype), s

    t("fold (8-slice)", fold_step, d_flat0)

    def scatter_fold_step(dr):
        d_flat = jnp.zeros((n_rows, 8 * C), jnp.bfloat16
                           ).at[row_idx.reshape(-1)].add(dr)
        (d_vol,) = fold(d_flat)
        s = jnp.sum(d_vol.astype(jnp.float32))
        return (dr + s * 1e-12).astype(dr.dtype), s

    t("scatter+fold", scatter_fold_step, d_rows0)

    def scatter_barrier_fold_step(dr):
        d_flat = jnp.zeros((n_rows, 8 * C), jnp.bfloat16
                           ).at[row_idx.reshape(-1)].add(dr)
        d_flat = jax.lax.optimization_barrier(d_flat)
        (d_vol,) = fold(d_flat)
        s = jnp.sum(d_vol.astype(jnp.float32))
        return (dr + s * 1e-12).astype(dr.dtype), s

    t("scat|barrier|fold", scatter_barrier_fold_step, d_rows0)


if __name__ == "__main__":
    main()
