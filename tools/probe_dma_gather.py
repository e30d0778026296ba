"""Probe: per-row async-DMA gather in a Pallas kernel vs XLA's row gather.

The warped-sites octo-paired row gather (427k rows of 8C) costs ~50 ms fwd —
~120 ns/row. Rows are only 128-256 B, so this is issue/latency-bound, NOT
bandwidth-bound (120 ns x 800 GB/s would be ~100 KB/row of bandwidth). If the
scalar core can issue per-row DMA descriptors faster than XLA's gather unit
retires rows, a manual-DMA Pallas gather beats the XLA floor and unlocks the
biggest remaining step cost (BENCH_NOTES round-3 ablation).

Uses the production kernel (zest_tpu/kernels/dma_gather.take_rows) so the
probe exercises exactly what the ZEST_DMA_ROW_GATHER flag would enable.

Timing (round-4 fix): each tunnel value fetch costs ~0.5 s of round-trip
latency, so iterations are CHAINED ON-DEVICE (next idx derives from the
previous output) and a single fetch at the end forces the whole chain —
the old per-iteration-fetch loop polluted every sample with fetch latency.

Run on the real chip (JAX_PLATFORMS=axon preset).
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from zest_tpu.kernels.dma_gather import take_rows  # noqa: E402

M = 2_705_000 // 8 * 8          # ~ (D+1)(H+1)(W+1) of the flagship volP
N = 1112 * 128 * 3              # warped points per step
CW = 64                         # row width (8C at C=8)


def timed(fn, tab, idx, n_it=20):
    # tab MUST be a jit ARGUMENT: a closed-over 660 MB device array gets
    # serialized into the tunnel's remote-compile request → HTTP 413
    @jax.jit
    def step(t, i):
        out = fn(t, i)
        # derive the next indices from this output ON-DEVICE: defeats the
        # tunnel's memoization AND chains the iterations so one final fetch
        # forces all of them
        bump = (jnp.abs(out[0, 0]).astype(jnp.int32) % 3) + 1
        return (i + bump) % M, out

    i, out = step(tab, idx)
    f = float(jnp.sum(out[::4097].astype(jnp.float32)))  # force warmup/compile
    t0 = time.perf_counter()
    for _ in range(n_it):
        i, out = step(tab, i)
    f = float(jnp.sum(out[::65537].astype(jnp.float32)))  # forces the chain
    dt = (time.perf_counter() - t0) / n_it * 1000
    return dt, f


def main():
    rng = np.random.default_rng(0)
    for dtype in (jnp.float32, jnp.bfloat16):
        tab = jnp.asarray(rng.normal(size=(M, CW)).astype(np.float32)).astype(dtype)
        idx = jnp.asarray(rng.integers(0, M, size=(N,)).astype(np.int32))

        def take(t, i):
            return jnp.take(t, i, axis=0)

        dt_x, _ = timed(take, tab, idx)
        print(f"XLA take     {np.dtype(dtype).name:9s}: {dt_x:7.1f} ms "
              f"({dt_x / N * 1e6:.0f} ns/row)", flush=True)

        try:
            ref = np.asarray(jax.jit(take)(tab, idx[:4096]).astype(jnp.float32))
            got = np.asarray(jax.jit(take_rows)(tab, idx[:4096])
                             .astype(jnp.float32))
            err = np.max(np.abs(ref - got))
            print(f"  dma correctness max|err| = {err}", flush=True)
            assert err == 0.0, "DMA gather must be index-exact"
            dt_d, _ = timed(take_rows, tab, idx)
            print(f"Pallas DMA   {np.dtype(dtype).name:9s}: {dt_d:7.1f} ms "
                  f"({dt_d / N * 1e6:.0f} ns/row)", flush=True)
        except Exception as e:  # noqa: BLE001
            print("Pallas DMA FAILED:", str(e)[:500], flush=True)


if __name__ == "__main__":
    main()
