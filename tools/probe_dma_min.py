"""Minimal bisect of the Mosaic compile-helper failure for DMA kernels.

a: VMEM-only kernel, no DMA, no scratch (control — should pass)
b: + unused DMA semaphore scratch
c: + ANY (HBM) input ref, still no DMA (reads nothing)
d: ANY input + whole-block static make_async_copy into out
e: d but row-sliced static copy
f: e with dynamic row index from SMEM
"""
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

M, CW, BLK = 1024, 64, 128


def run(name, kernel, in_any=False, sem=False, with_idx=False):
    in_specs = []
    args = []
    if with_idx:
        idx = jnp.arange(BLK, dtype=jnp.int32).reshape(1, 1, BLK)
        in_specs.append(pl.BlockSpec((1, 1, BLK), lambda: (0, 0, 0),
                                     memory_space=pltpu.SMEM))
        args.append(idx)
    tab = jnp.asarray(np.random.default_rng(0)
                      .normal(size=(M, CW)).astype(np.float32))
    in_specs.append(pl.BlockSpec(memory_space=pltpu.ANY) if in_any
                    else pl.BlockSpec((M, CW), lambda: (0, 0),
                                      memory_space=pltpu.VMEM))
    args.append(tab)
    scratch = [pltpu.SemaphoreType.DMA(())] if sem else []
    fn = pl.pallas_call(
        kernel,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((BLK, CW), lambda: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BLK, CW), jnp.float32),
        scratch_shapes=scratch,
    )
    try:
        out = np.asarray(jax.jit(fn)(*args))
        print(f"{name}: COMPILED, sum={out.sum():.3f}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAILED {str(e)[:200]}", flush=True)


def a_kernel(tab_ref, out_ref):
    out_ref[...] = tab_ref[:BLK] * 2.0


def b_kernel(tab_ref, out_ref, sem):
    out_ref[...] = tab_ref[:BLK] * 2.0


def c_kernel(tab_ref, out_ref, sem):
    out_ref[...] = jnp.zeros((BLK, CW), jnp.float32)


def d_kernel(tab_ref, out_ref, sem):
    cp = pltpu.make_async_copy(tab_ref.at[pl.ds(0, BLK), :], out_ref, sem)
    cp.start()
    cp.wait()


def e_kernel(tab_ref, out_ref, sem):
    def body(i, _):
        cp = pltpu.make_async_copy(tab_ref.at[pl.ds(i, 1), :],
                                   out_ref.at[pl.ds(i, 1), :], sem)
        cp.start()
        cp.wait()
        return 0
    jax.lax.fori_loop(0, BLK, body, 0)


def f_kernel(idx_ref, tab_ref, out_ref, sem):
    def body(i, _):
        r = idx_ref[0, 0, i]
        cp = pltpu.make_async_copy(tab_ref.at[pl.ds(r, 1), :],
                                   out_ref.at[pl.ds(i, 1), :], sem)
        cp.start()
        cp.wait()
        return 0
    jax.lax.fori_loop(0, BLK, body, 0)


def main():
    run("a", a_kernel)
    run("b", b_kernel, sem=True)
    run("c", c_kernel, in_any=True, sem=True)
    run("d", d_kernel, in_any=True, sem=True)
    run("e", e_kernel, in_any=True, sem=True)
    run("f", f_kernel, in_any=True, sem=True, with_idx=True)


if __name__ == "__main__":
    main()
