"""Probe: does jnp.take_along_axis lower inside a Pallas TPU kernel here?

Checks the two Mosaic dynamic_gather forms the warp-kernel redesign needs:
  (a) lane gather: table [S, 128], idx [S, 128] -> out[s, l] = table[s, idx[s, l]]
  (b) correctness vs XLA take_along_axis, plus a quick timing loop.

Run on the real chip (JAX_PLATFORMS=axon preset).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def kern(tab_ref, idx_ref, out_ref):
    out_ref[...] = jnp.take_along_axis(tab_ref[...], idx_ref[...], axis=1)


def main():
    S, L = 320, 128
    key = jax.random.PRNGKey(0)
    tab = jax.random.normal(key, (S, L), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (S, L), 0, L, jnp.int32)

    f = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, L), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )
    out = f(tab, idx)
    ref = jnp.take_along_axis(tab, idx, axis=1)
    print("lane-gather f32 max|err|:", float(jnp.max(jnp.abs(out - ref))))

    # bf16 table
    out16 = f.__wrapped__ if False else None
    f16 = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, L), jnp.bfloat16),
        interpret=jax.default_backend() != "tpu",
    )
    outb = f16(tab.astype(jnp.bfloat16), idx)
    refb = jnp.take_along_axis(tab.astype(jnp.bfloat16), idx, axis=1)
    print("lane-gather bf16 max|err|:", float(jnp.max(jnp.abs(
        outb.astype(jnp.float32) - refb.astype(jnp.float32)))))

    # 3D batched form [C, B, w] gather along w (the band-rows shape)
    def kern3(tab_ref, idx_ref, out_ref):
        out_ref[...] = jnp.take_along_axis(tab_ref[...], idx_ref[...], axis=2)

    C, B = 40, 8
    tab3 = jax.random.normal(key, (C, B, L), jnp.float32)
    idx3 = jnp.broadcast_to(idx[:1].reshape(1, 1, L), (C, B, L))
    f3 = pl.pallas_call(
        kern3,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, B, L), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )
    try:
        out3 = f3(tab3, idx3)
        ref3 = jnp.take_along_axis(tab3, idx3, axis=2)
        print("3D lane-gather max|err|:", float(jnp.max(jnp.abs(out3 - ref3))))
    except Exception as e:  # noqa: BLE001
        print("3D lane-gather FAILED:", str(e)[:300])


if __name__ == "__main__":
    main()
