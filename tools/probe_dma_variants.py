"""Isolate which Pallas DMA-gather construct crashes the Mosaic compiler.

probe_dma_gather.py's windowed per-row DMA kernel passes Pallas lowering but
dies in tpu_compile_helper (HTTP 500, no diagnostics). Each variant below adds
one construct; the first to fail names the culprit:

  v1: static-index row DMA into the pipelined VMEM out block, single sem
  v2: + dynamic row index read from SMEM (start+wait per row)
  v3: + semaphore-array in-flight window (the production kernel's shape)
  v4: dynamic-index HBM->HBM DMA (out in ANY, no pipelined VMEM interplay)

Run on the real chip (JAX_PLATFORMS=axon preset).
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

M = 8192
CW = 64
BLK = 128
NSEM = 16


def v1_kernel(idx_ref, tab_ref, out_ref, sem):
    def body(i, _):
        pltpu.make_async_copy(tab_ref.at[pl.ds(0, 1), :],
                              out_ref.at[pl.ds(i, 1), :], sem).start()
        pltpu.make_async_copy(tab_ref.at[pl.ds(0, 1), :],
                              out_ref.at[pl.ds(i, 1), :], sem).wait()
        return 0
    jax.lax.fori_loop(0, BLK, body, 0)


def v2_kernel(idx_ref, tab_ref, out_ref, sem):
    def body(i, _):
        r = idx_ref[0, 0, i]
        pltpu.make_async_copy(tab_ref.at[pl.ds(r, 1), :],
                              out_ref.at[pl.ds(i, 1), :], sem).start()
        pltpu.make_async_copy(tab_ref.at[pl.ds(r, 1), :],
                              out_ref.at[pl.ds(i, 1), :], sem).wait()
        return 0
    jax.lax.fori_loop(0, BLK, body, 0)


def v3_kernel(idx_ref, tab_ref, out_ref, sems):
    def start(i):
        r = idx_ref[0, 0, i]
        pltpu.make_async_copy(tab_ref.at[pl.ds(r, 1), :],
                              out_ref.at[pl.ds(i, 1), :],
                              sems.at[i % NSEM]).start()

    def wait(i):
        r = idx_ref[0, 0, i]
        pltpu.make_async_copy(tab_ref.at[pl.ds(r, 1), :],
                              out_ref.at[pl.ds(i, 1), :],
                              sems.at[i % NSEM]).wait()

    def prime(i, _):
        start(i)
        return 0
    jax.lax.fori_loop(0, NSEM, prime, 0)

    def rolled(i, _):
        wait(i)

        @pl.when(i + NSEM < BLK)
        def _():
            start(i + NSEM)
        return 0
    jax.lax.fori_loop(0, BLK, rolled, 0)


def v4_kernel(idx_ref, tab_ref, out_ref, sems):
    b = pl.program_id(0)

    def start(i):
        r = idx_ref[0, 0, i]
        pltpu.make_async_copy(tab_ref.at[pl.ds(r, 1), :],
                              out_ref.at[pl.ds(b * BLK + i, 1), :],
                              sems.at[i % NSEM]).start()

    def wait(i):
        r = idx_ref[0, 0, i]
        pltpu.make_async_copy(tab_ref.at[pl.ds(r, 1), :],
                              out_ref.at[pl.ds(b * BLK + i, 1), :],
                              sems.at[i % NSEM]).wait()

    def prime(i, _):
        start(i)
        return 0
    jax.lax.fori_loop(0, NSEM, prime, 0)

    def rolled(i, _):
        wait(i)

        @pl.when(i + NSEM < BLK)
        def _():
            start(i + NSEM)
        return 0
    jax.lax.fori_loop(0, BLK, rolled, 0)


def run(name, kernel, idx, tab, sem_shape, out_any=False):
    nb = idx.shape[0] // BLK
    idx3 = idx.reshape(nb, 1, BLK)
    out_spec = (pl.BlockSpec(memory_space=pltpu.ANY) if out_any else
                pl.BlockSpec((BLK, CW), lambda b: (b, 0),
                             memory_space=pltpu.VMEM))
    fn = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 1, BLK), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((nb * BLK, CW), tab.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA(sem_shape)],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )
    try:
        out = jax.jit(fn)(idx3, tab)
        got = np.asarray(out)
        if name == "v1":
            ok = np.allclose(got, np.asarray(tab)[0])
        else:
            ok = np.allclose(got, np.asarray(tab)[np.asarray(idx)])
        print(f"{name}: COMPILED, correct={ok}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAILED {str(e)[:300]}", flush=True)


def main():
    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.normal(size=(M, CW)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, M, size=(4 * BLK,)).astype(np.int32))
    run("v1", v1_kernel, idx, tab, ())
    run("v2", v2_kernel, idx, tab, ())
    run("v3", v3_kernel, idx, tab, (NSEM,))
    run("v4", v4_kernel, idx, tab, (NSEM,), out_any=True)


if __name__ == "__main__":
    main()
