"""Probe: per-row async-DMA gather in a Pallas kernel vs XLA's row gather.

The warped-sites octo-paired row gather (427k rows of 8C) costs ~50 ms fwd —
~120 ns/row. Rows are only 128-256 B, so this is issue/latency-bound, NOT
bandwidth-bound (120 ns x 800 GB/s would be ~100 KB/row of bandwidth). If the
scalar core can issue per-row DMA descriptors faster than XLA's gather unit
retires rows, a manual-DMA Pallas gather beats the XLA floor and unlocks the
biggest remaining step cost (BENCH_NOTES round-3 ablation).

Grid over blocks of BLK rows: read each row index from an SMEM block, issue
one row-DMA from the HBM table into the output VMEM block, wait all, let the
pipeline flush the block. Measures f32[*, 64] (256 B rows, flagship shape)
and a windowed-semaphore variant.

Run on the real chip (JAX_PLATFORMS=axon preset).
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

M = 2_705_000 // 8 * 8          # ~ (D+1)(H+1)(W+1) of the flagship volP
N = 1112 * 128 * 3              # warped points per step
CW = 64                         # row width (8C at C=8)
BLK = 128                       # rows per grid step
NSEM = 16                       # in-flight DMA window


def _gather_kernel(idx_ref, tab_ref, out_ref, sems):
    def start(i, _):
        r = idx_ref[0, i]
        pltpu.make_async_copy(tab_ref.at[pl.ds(r, 1), :],
                              out_ref.at[pl.ds(i, 1), :],
                              sems.at[i % NSEM]).start()
        return 0

    def wait(i, _):
        r = idx_ref[0, i]
        pltpu.make_async_copy(tab_ref.at[pl.ds(r, 1), :],
                              out_ref.at[pl.ds(i, 1), :],
                              sems.at[i % NSEM]).wait()
        return 0

    # windowed: start NSEM ahead, wait in order (bounded in-flight queue)
    jax.lax.fori_loop(0, NSEM, start, 0)

    def rolled(i, _):
        wait(i, 0)

        @pl.when(i + NSEM < BLK)
        def _():
            start(i + NSEM, 0)

        return 0

    jax.lax.fori_loop(0, BLK, rolled, 0)


def dma_gather(tab, idx):
    nb = idx.shape[0] // BLK
    idx2 = idx.reshape(nb, BLK)
    return pl.pallas_call(
        _gather_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, BLK), lambda b: (b, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((BLK, CW), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb * BLK, CW), tab.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA((NSEM,))],
        interpret=jax.default_backend() != "tpu",
    )(idx2, tab)


def timed(fn, *args, n_it=6):
    out = fn(*args)
    s = float(jnp.sum(out[::4097]))  # force
    t0 = time.perf_counter()
    prev = 1
    for i in range(n_it):
        out = fn(*args[:-1], (args[-1] + prev) % M)  # vary idx (no memoization)
        prev = int(float(jnp.sum(out[::65537])) ) % 3
    dt = (time.perf_counter() - t0) / n_it * 1000
    return dt, s


def main():
    rng = np.random.default_rng(0)
    for dtype in (jnp.float32, jnp.bfloat16):
        tab = jnp.asarray(rng.normal(size=(M, CW)).astype(np.float32)).astype(dtype)
        idx = jnp.asarray(rng.integers(0, M, size=(N,)).astype(np.int32))

        take = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
        dt_x, _ = timed(take, tab, idx)
        print(f"XLA take     {np.dtype(dtype).name:9s}: {dt_x:7.1f} ms "
              f"({dt_x / N * 1e6:.0f} ns/row)")

        try:
            g = jax.jit(dma_gather)
            ref = np.asarray(take(tab, idx[:4096]).astype(jnp.float32))
            got = np.asarray(g(tab, idx[:4096]).astype(jnp.float32))
            err = np.max(np.abs(ref - got))
            print(f"  dma correctness max|err| = {err}")
            dt_d, _ = timed(g, tab, idx)
            print(f"Pallas DMA   {np.dtype(dtype).name:9s}: {dt_d:7.1f} ms "
                  f"({dt_d / N * 1e6:.0f} ns/row)")
        except Exception as e:  # noqa: BLE001
            print("Pallas DMA FAILED:", str(e)[:500])


if __name__ == "__main__":
    main()
