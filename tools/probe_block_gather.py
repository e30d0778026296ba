"""Probe: does gather/scatter ISSUE cost depend on row size (TPU/axon)?

The warped-sites sampler pays ~145 ns/row (bf16) for 427k row gathers and a
similar per-row cost for the backward scatter-add (BENCH_NOTES round 4). If
the per-access cost is dominated by ISSUE (not bandwidth), grouping a ray's
128 samples into a handful of (y, x)-column accesses of D*C contiguous
elements each — exploiting that NDC (x, y) is nearly constant per ray
(epipolar drift only) and only scene flow perturbs it — cuts access count
~8-32x.

Timing: iterations are CHAINED ON-DEVICE (next idx derives from the previous
output, probe_dma_gather.py methodology) and a single value fetch forces the
chain — the axon tunnel memoizes identical inputs and defers execution.

Measures, on the real chip:
  g_row   : gather  N=427k rows of 64   (the current octo-paired fallback)
  s_row   : scatter-add, same shape
  g_col   : gather  Nc rows of (D+1)*C=1032 (z-minor column layout, 16 or 4
            patch cells per 128-sample ray chunk)
  s_col   : scatter-add, same shapes
  topk    : lax.top_k(427k, k=8192) — outlier-compaction candidate

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/probe_block_gather.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N_ROW = 427_008            # flagship warped-site count (3R*S)
ROW_W = 64                 # 8C octo-paired row width
D, Hv, Wv, C = 128, 121, 177, 8
COL_W = (D + 1) * C        # z-minor column row: 129*8 = 1032
N_ROW_TAB = (D + 1) * (Hv + 1) * (Wv + 1)
N_COL_TAB = (Hv + 2) * (Wv + 2)          # column table rows
N_COL_ACC = N_ROW // 128 * 16            # 16 patch cells per ray chunk
N_COL_ACC4 = N_ROW // 128 * 4            # 4 cells (2x2, tiny-flow regime)

STEPS = 20


def timed(name, fn, tab, idx, n_tab, n_acc):
    @jax.jit
    def step(t, i):
        out = fn(t, i)
        # derive next indices from this output ON-DEVICE: defeats tunnel
        # memoization and chains iterations so ONE final fetch forces all
        bump = (jnp.abs(out[0, 0]).astype(jnp.int32) % 3) + 1
        return (i + bump) % n_tab, out

    i, out = step(tab, idx)
    float(jnp.sum(out[::65537].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(STEPS):
        i, out = step(tab, i)
    float(jnp.sum(out[::65537].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / STEPS
    print(f"{name:24s} {dt * 1e3:9.2f} ms   {dt / n_acc * 1e9:7.1f} ns/access",
          flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}", flush=True)

    tab_row = jnp.asarray(rng.normal(size=(N_ROW_TAB, ROW_W))
                          .astype(np.float32)).astype(jnp.bfloat16)
    idx_row = jnp.asarray(rng.integers(0, N_ROW_TAB, size=(N_ROW,))
                          .astype(np.int32))
    tab_col = jnp.asarray(rng.normal(size=(N_COL_TAB, COL_W))
                          .astype(np.float32)).astype(jnp.bfloat16)
    idx_col = jnp.asarray(rng.integers(0, N_COL_TAB, size=(N_COL_ACC,))
                          .astype(np.int32))
    idx_col4 = idx_col[:N_COL_ACC4]

    def gather(t, i):
        return jnp.take(t, i, axis=0)

    def scatter(t, i):
        upd = jnp.broadcast_to(t[0], (i.shape[0], t.shape[1]))
        return jnp.zeros_like(t).at[i].add(upd)

    timed(f"g_row  {N_ROW}x{ROW_W}", gather, tab_row, idx_row,
          N_ROW_TAB, N_ROW)
    timed(f"s_row  {N_ROW}x{ROW_W}", scatter, tab_row, idx_row,
          N_ROW_TAB, N_ROW)
    timed(f"g_col  {N_COL_ACC}x{COL_W}", gather, tab_col, idx_col,
          N_COL_TAB, N_COL_ACC)
    timed(f"g_col4 {N_COL_ACC4}x{COL_W}", gather, tab_col, idx_col4,
          N_COL_TAB, N_COL_ACC4)
    timed(f"s_col  {N_COL_ACC}x{COL_W}", scatter, tab_col, idx_col,
          N_COL_TAB, N_COL_ACC)
    timed(f"s_col4 {N_COL_ACC4}x{COL_W}", scatter, tab_col, idx_col4,
          N_COL_TAB, N_COL_ACC4)

    # top_k compaction candidate (no chaining needed at this cost scale, but
    # chain anyway via the same recipe on the scores)
    scores = jnp.asarray(rng.normal(size=(N_ROW,)).astype(np.float32))

    @jax.jit
    def topk_step(s):
        v, i = jax.lax.top_k(s, 8192)
        return s.at[i[0]].add(v[0] * 1e-6)

    s = topk_step(scores)
    float(s[0])
    t0 = time.perf_counter()
    for _ in range(STEPS):
        s = topk_step(s)
    float(s[0])
    print(f"{'topk 427k->8192':24s} {(time.perf_counter() - t0) / STEPS * 1e3:9.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
