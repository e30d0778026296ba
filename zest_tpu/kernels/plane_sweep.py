"""Pallas TPU kernel: plane-sweep homography warp as banded one-hot MATMULs.

The XLA gather/scatter formulation of ``ops.homography.homo_warp`` dominates the
training step (~37 ms gather fwd + ~75 ms scatter bwd per source view on a v5e).
TPU hardware has no fast general gather/scatter — but the warp has *band
structure*: for one output row-chunk, all bilinear taps fall inside a narrow band
of source rows (the homography maps an output row to a line in the source image).
That turns both directions into small dense matmuls on the MXU:

    out_chunk[C, 128px] = src_rows[C, B·w] @ W[B·w, 128px]          (forward)
    d_src_rows[C, B·w] += g_chunk[C, 128px] @ W.T                   (backward)

where ``src_rows = src[:, rb : rb+B, :]`` is the band (channel-major layout — the
slice reshapes to a matrix with no transpose) and ``W`` is the banded bilinear
interpolation matrix, built *inside the kernel* from per-pixel tap data with iota
compares (never materialized in HBM). Zeros-padding out-of-bounds semantics are
folded into the weights; the backward is the exact adjoint (the warp is linear in
the source features).

Band size ``B`` is a static kernel parameter. Correctness requires every chunk's
source rows to fit in [rb, rb+B) with rb = clamp(min r0, 0, h−B); the maximum
per-chunk span is a property of the camera poses + depth range and is computed
host-side (``required_band``) — pick B ≥ that bound (cfg.warp_band). Spans for
forward-facing video rigs are 2-4 rows.

Constraint: feature width w == 128 (lane width) — true for the flagship 288x512
NSFF config (W/4 = 128). Other widths fall back to the XLA path.

Semantics identical to /root/reference/utils.py:49-99.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.homography import homography_grid, homo_warp as homo_warp_xla

LANES = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# ---------------------------------------------------------------------------
# tap precomputation (XLA, fused elementwise)
# ---------------------------------------------------------------------------

def _precompute_taps(grid, h: int, w: int, band: int, gp: int = LANES):
    """Per-chunk tap data from a normalized sampling grid.

    ``gp`` is the chunk width in pixels (a multiple of 128: ``group``
    consecutive 128-lane chunks share one band slice and one wide matmul —
    same MACs, ÷group fewer matmul issues and backward band read-modify-
    writes).

    Returns:
        ints [D, NC, 5, gp] int32  (c0, c1, r0, r1, rb) clamped
        flts [D, NC, 4, gp] f32    (wx0, wx1, wy0, wy1) OOB-zeroed
        nc   int                   number of gp-wide chunks
    """
    D, Hp, Wp, _ = grid.shape
    x = (grid[..., 0] + 1.0) * 0.5 * (w - 1)
    y = (grid[..., 1] + 1.0) * 0.5 * (h - 1)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0

    wx0 = jnp.where((x0 >= 0) & (x0 <= w - 1), 1.0 - fx, 0.0)
    wx1 = jnp.where((x0 + 1 >= 0) & (x0 + 1 <= w - 1), fx, 0.0)
    wy0 = jnp.where((y0 >= 0) & (y0 <= h - 1), 1.0 - fy, 0.0)
    wy1 = jnp.where((y0 + 1 >= 0) & (y0 + 1 <= h - 1), fy, 0.0)

    c0 = jnp.clip(x0, 0, w - 1).astype(jnp.int32)
    c1 = jnp.clip(x0 + 1, 0, w - 1).astype(jnp.int32)
    r0 = jnp.clip(y0, 0, h - 1).astype(jnp.int32)
    r1 = jnp.clip(y0 + 1, 0, h - 1).astype(jnp.int32)

    nc = -(-(Hp * Wp) // gp)
    pad = nc * gp - Hp * Wp

    def chunk(a, fill=0.0):
        a = a.reshape(D, Hp * Wp)
        a = jnp.pad(a, ((0, 0), (0, pad)), constant_values=fill)
        return a.reshape(D, nc, gp)

    c0c, c1c, r0c, r1c = chunk(c0, 0), chunk(c1, 0), chunk(r0, 0), chunk(r1, 0)
    wy0c, wy1c = chunk(wy0), chunk(wy1)
    # band start from taps with nonzero vertical weight only — zero-weight
    # (out-of-bounds) taps have clamped row indices that would drag the band
    # away from the chunk's real taps
    low = jnp.minimum(jnp.where(wy0c > 0, r0c, h), jnp.where(wy1c > 0, r1c, h))
    rb = jnp.clip(jnp.min(low, axis=-1), 0, max(h - band, 0)).astype(jnp.int32)
    rb_b = jnp.broadcast_to(rb[..., None], r0c.shape)
    ints = jnp.stack([c0c, c1c, r0c, r1c, rb_b], axis=2).astype(jnp.int32)
    flts = jnp.stack([chunk(wx0), chunk(wx1), wy0c, wy1c], axis=2)
    return ints, flts, nc


def required_band(grid, h: int, w: int, gp: int = LANES):
    """Minimal safe ``band``: max per-chunk span of rows with nonzero vertical
    weight (chunk = ``gp`` consecutive flattened pixels). Traced — use from
    host-side preflight checks on concrete pose/depth data (e.g. NSFFDataset
    computes this over all pose pairs at init)."""
    D, Hp, Wp, _ = grid.shape
    y = (grid[..., 1] + 1.0) * 0.5 * (h - 1)
    y0 = jnp.floor(y)
    v0 = (y0 >= 0) & (y0 <= h - 1)
    v1 = (y0 + 1 >= 0) & (y0 + 1 <= h - 1)
    r0 = jnp.clip(y0, 0, h - 1).astype(jnp.int32)
    r1 = jnp.clip(y0 + 1, 0, h - 1).astype(jnp.int32)
    lo = jnp.minimum(jnp.where(v0, r0, h), jnp.where(v1, r1, h))
    hi = jnp.maximum(jnp.where(v0, r0, -1), jnp.where(v1, r1, -1))

    nc = -(-(Hp * Wp) // gp)
    pad = nc * gp - Hp * Wp

    def chunk(a, fill):
        a = a.reshape(D, Hp * Wp)
        a = jnp.pad(a, ((0, 0), (0, pad)), constant_values=fill)
        return a.reshape(D, nc, gp)

    span = jnp.max(jnp.max(chunk(hi, -1), -1) - jnp.min(chunk(lo, h), -1))
    return jnp.maximum(span + 1, 1)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _make_X2_vy(ints, flts, rb, band: int, w: int, gp: int):
    """Separable interpolation factors for one chunk (gp pixels wide).

    The banded warp matrix factorizes as W[(b,c),px] = vy[b,px]·X2[c,px]:
    building the w×gp horizontal two-hot X2 and the band×gp vertical two-hot
    vy costs ~(w+band)·gp VPU ops per chunk instead of the band·w·gp of the
    fused W — ~8x less VPU work at band=16.
    """
    c0 = ints[0][None]            # [1, gp]
    c1 = ints[1][None]
    r0 = ints[2][None]
    r1 = ints[3][None]
    wx0 = flts[0][None]
    wx1 = flts[1][None]
    wy0 = flts[2][None]
    wy1 = flts[3][None]

    c_idx = jax.lax.broadcasted_iota(jnp.int32, (w, gp), 0)
    X2 = (jnp.where(c_idx == c0, wx0, 0.0)
          + jnp.where(c_idx == c1, wx1, 0.0))
    b_idx = jax.lax.broadcasted_iota(jnp.int32, (band, gp), 0) + rb
    vy = (jnp.where(b_idx == r0, wy0, 0.0)
          + jnp.where(b_idx == r1, wy1, 0.0))
    return X2, vy


def _mm_dtype_prec(approx: bool):
    """MXU operand dtype/precision: 1-pass bf16 when upstream features are
    already bf16 (no information to preserve), 6-pass exact f32 otherwise."""
    if approx:
        return jnp.bfloat16, jax.lax.Precision.DEFAULT
    return jnp.float32, jax.lax.Precision.HIGHEST


def _fwd_kernel(src_ref, ints_ref, flts_ref, out_ref, *, band, h, w, approx):
    """One depth plane: out[1, NC, C, gp] = separable band-matmul warp.

    src: [C, h, w] channel-major (band slice reshapes without transpose).
    Per chunk: M[(c,b),px] = (src_band[C·B, w] @ X2[w, px]) — one MXU matmul —
    then out[c,px] = Σ_b M[(c,b),px]·vy[b,px] on the VPU. A chunk is ``gp``
    consecutive flattened pixels (group·128): grouping widens the matmul RHS
    (same MACs, fewer issues) and amortizes the band slice per group.

    A lane-gather formulation (two Mosaic take_along_axis per chunk replacing
    the 2/128-sparse X2 matmul) measured 3,694 vs 3,832 rays/s in the full
    step — the MXU matmul wins; rejected (BENCH_NOTES round 3).
    """
    C = src_ref.shape[0]
    NC, _, gp = ints_ref.shape[1:]
    dt, prec = _mm_dtype_prec(approx)

    def body(k, _):
        rb = ints_ref[0, k, 4, 0]
        band_rows = src_ref[:, pl.ds(rb, band), :]          # [C, B, w]
        X2, vy = _make_X2_vy(ints_ref[0, k], flts_ref[0, k], rb, band, w, gp)
        mid = jnp.dot(band_rows.reshape(C * band, w).astype(dt), X2.astype(dt),
                      preferred_element_type=jnp.float32,
                      precision=prec)                       # [C·B, gp]
        out_ref[0, k] = jnp.sum(mid.reshape(C, band, gp) * vy[None], axis=1)
        return 0

    jax.lax.fori_loop(0, NC, body, 0)


def _bwd_kernel(g_ref, ints_ref, flts_ref, dsrc_ref, *, band, h, w, approx):
    """Adjoint: accumulate d_src[C, h, w] over all planes/chunks.

    Grid iterates planes; the single output block accumulates (same block index
    for every step; zero-initialized at step 0).
    """
    C = g_ref.shape[2]
    NC, _, gp = ints_ref.shape[1:]
    d = pl.program_id(0)
    dt, prec = _mm_dtype_prec(approx)

    @pl.when(d == 0)
    def _():
        dsrc_ref[...] = jnp.zeros_like(dsrc_ref)

    def body(k, _):
        rb = ints_ref[0, k, 4, 0]
        X2, vy = _make_X2_vy(ints_ref[0, k], flts_ref[0, k], rb, band, w, gp)
        g = g_ref[0, k]                                      # [C, gp]
        d_mid = (g[:, None, :] * vy[None]).reshape(C * band, gp)
        contrib = jax.lax.dot_general(
            d_mid.astype(dt), X2.astype(dt), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)   # [C·B, w]
        cur = dsrc_ref[:, pl.ds(rb, band), :]
        dsrc_ref[:, pl.ds(rb, band), :] = cur + contrib.reshape(C, band, w)
        return 0

    jax.lax.fori_loop(0, NC, body, 0)


# ---------------------------------------------------------------------------
# host-side wrappers
# ---------------------------------------------------------------------------

def _pallas_warp_fwd(src_cm, ints, flts, band: int, approx: bool):
    """src_cm [C, h, w]; returns out [D, NC, C, gp]."""
    C, h, w = src_cm.shape
    D, NC, _, gp = ints.shape
    kern = functools.partial(_fwd_kernel, band=band, h=h, w=w, approx=approx)
    return pl.pallas_call(
        kern,
        grid=(D,),
        in_specs=[
            pl.BlockSpec((C, h, w), lambda d: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NC, 5, gp), lambda d: (d, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NC, 4, gp), lambda d: (d, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, NC, C, gp), lambda d: (d, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((D, NC, C, gp), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(src_cm, ints, flts)


def _pallas_warp_bwd(g, ints, flts, band: int, h: int, w: int, approx: bool):
    """g [D, NC, C, gp]; returns d_src [C, h, w]."""
    D, NC, C, gp = g.shape
    kern = functools.partial(_bwd_kernel, band=band, h=h, w=w, approx=approx)
    return pl.pallas_call(
        kern,
        grid=(D,),
        in_specs=[
            pl.BlockSpec((1, NC, C, gp), lambda d: (d, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NC, 5, gp), lambda d: (d, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NC, 4, gp), lambda d: (d, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((C, h, w), lambda d: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, h, w), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(g, ints, flts)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _warp_core(src_cm, taps, shape, band, approx):
    ints, flts = taps
    return _pallas_warp_fwd(src_cm, ints, flts, band, approx)


def _warp_core_fwd(src_cm, taps, shape, band, approx):
    return _warp_core(src_cm, taps, shape, band, approx), taps


def _warp_core_bwd(shape, band, approx, taps, g):
    ints, flts = taps
    h, w = shape
    d_src = _pallas_warp_bwd(g, ints, flts, band, h, w, approx)
    return d_src, None


_warp_core.defvjp(_warp_core_fwd, _warp_core_bwd)


def supports_pallas_warp(src_feat) -> bool:
    return src_feat.shape[1] == LANES


def _warp_core_call(src_feat, proj_mat, depth_values, pad: int, band: int,
                    group: int):
    """Shared front half: taps + kernel call. Returns (out [D,NC,Cp,gp], grid,
    nc, Cp)."""
    h, w, C = src_feat.shape
    # sublane-align the band: a size-3 dynamic slice measured 2.3x SLOWER than
    # size-16 (Mosaic sub-tile masking); multiples of 8 keep slices tile-shaped
    band = min(_round_up(max(band, 1), 8), h)
    grid = homography_grid(proj_mat, depth_values, (h, w), pad=pad)

    gp = group * LANES
    ints, flts, nc = _precompute_taps(grid, h, w, band, gp)
    # bf16 upstream features carry no extra precision to preserve → run the MXU
    # matmuls in 1-pass bf16 (6x fewer passes than exact-f32); exact otherwise
    approx = src_feat.dtype == jnp.bfloat16
    src_cm = jnp.moveaxis(src_feat.astype(jnp.float32), -1, 0)   # [C, h, w]
    Cp = _round_up(C, 8)
    src_cm = jnp.pad(src_cm, ((0, Cp - C), (0, 0), (0, 0)))

    out = _warp_core(src_cm, (ints, flts), (h, w), band, approx)  # [D,NC,Cp,128]
    return out, grid, nc, Cp


def homo_warp_fast(src_feat, proj_mat, depth_values, pad: int = 0,
                   band: int = 16, group: int = 1):
    """Accelerated ``homo_warp`` with identical semantics (MXU banded matmuls).

    Args:
        src_feat: [h, w, C] with w == 128 (falls back to XLA otherwise).
        band: static band size; must be ≥ ``required_band`` for these poses
              AND this ``group`` (validate host-side; see module docstring).
        group: chunks-per-matmul (chunk width group·128 px). Same MACs, ÷group
              matmul issues / backward RMWs; needs a slightly larger band
              (``warp_band_bound_host(..., group=group)``).
    Returns (warped [D, Hp, Wp, C], grid) like ``ops.homography.homo_warp``.
    """
    h, w, C = src_feat.shape
    if w != LANES:
        import warnings
        warnings.warn(
            f"homo_warp_fast: feature width {w} != {LANES}; falling back to "
            f"the XLA warp (slower). The Pallas kernel needs W/4 == 128 "
            f"(e.g. 288x512 inputs).", stacklevel=2)
        return homo_warp_xla(src_feat, proj_mat, depth_values, pad=pad)
    out, grid, nc, Cp = _warp_core_call(src_feat, proj_mat, depth_values, pad,
                                        band, group)
    D, Hp, Wp, _ = grid.shape
    gp = group * LANES
    out = jnp.moveaxis(out, 2, 3).reshape(D, nc * gp, Cp)[:, :Hp * Wp, :C]
    return out.reshape(D, Hp, Wp, C).astype(src_feat.dtype), grid


def supports_pallas_warp_cm(src_feat) -> bool:
    return src_feat.shape[1] == LANES


def homo_warp_fast_cm(src_feat, proj_mat, depth_values, pad: int = 0,
                      band: int = 16, group: int = 1):
    """``homo_warp_fast`` emitting CHANNEL-MAJOR output [D, C, Hp·Wp].

    Skips the per-view minor-dim transpose of the channels-last form: the
    kernel's native [D, NC, Cp, 128] block layout reshapes to channel-major
    with only an NC↔Cp *block* swap (whole 128-lane rows move; no element
    shuffles). Consumers (cost-volume variance accumulation) are elementwise
    and layout-agnostic, and a channel-major volume has a dense 128-multiple
    minor dim instead of a 41-lane-padded channel minor. Caller must ensure
    width == 128 (check ``supports_pallas_warp_cm``).

    Returns (warped_cm [D, C, Hp·Wp] f32, grid [D, Hp, Wp, 2]).
    """
    h, w, C = src_feat.shape
    if w != LANES:
        import warnings
        warnings.warn(
            f"homo_warp_fast_cm: feature width {w} != {LANES}; falling back "
            f"to the XLA warp (slower).", stacklevel=2)
        warped, grid = homo_warp_xla(src_feat, proj_mat, depth_values, pad=pad)
        D, Hp, Wp, _ = grid.shape
        return (jnp.moveaxis(warped, -1, 1).reshape(D, C, Hp * Wp)
                .astype(jnp.float32), grid)
    out, grid, nc, Cp = _warp_core_call(src_feat, proj_mat, depth_values, pad,
                                        band, group)
    D, Hp, Wp, _ = grid.shape
    out = jnp.transpose(out, (0, 2, 1, 3)).reshape(D, Cp, nc * group * LANES)
    return out[:, :src_feat.shape[2], :Hp * Wp], grid


def warp_band_bound_host(proj_mat, near, far, h: int, w: int, pad: int = 0,
                         n_planes: int = 128, group: int = 1) -> int:
    """EXACT host-side upper bound on ``required_band`` for one source view.

    For the plane-induced homography M_d = R + T e3ᵀ/d the vertical-coordinate
    slopes are rational with numerators linear in (y, 1/d) and denominator D
    linear in (x, y, 1/d), so their extrema over the padded pixel region x
    depth range lie at corners — evaluated exactly, no grid sweep. Use at
    dataset-init time to pick cfg.warp_band (one static value per dataset).

    Args: proj_mat [3, 4] numpy (feature-space src @ ref⁻¹); near/far floats.
    Returns: an int band size safe for every (depth plane, output chunk).
    """
    import numpy as np
    P = np.asarray(proj_mat, np.float64)
    R = P[:, :3]
    T = P[:, 3]
    Hp, Wp = h + 2 * pad, w + 2 * pad
    xs = np.array([-pad, Wp - 1 - pad], np.float64)
    ys = np.array([-pad, Hp - 1 - pad], np.float64)
    ds = np.array([near, far], np.float64)

    worst = 0.0
    for d in ds:
        m10, m11 = R[1, 0], R[1, 1]
        m12 = R[1, 2] + T[1] / d
        m20, m21 = R[2, 0], R[2, 1]
        m22 = R[2, 2] + T[2] / d
        # D at region corners (linear in x, y)
        Dc = np.array([[m20 * x + m21 * y + m22 for x in xs] for y in ys])
        if Dc.min() <= 0 < Dc.max() or abs(Dc).min() < 1e-9:
            return h  # denominator crosses zero somewhere: no useful bound
        D2min = (abs(Dc) ** 2).min()
        # ∂sy/∂x = (A + B·y)/D², A/B exact (x cancels)
        A = m10 * m22 - m20 * m12
        B = m10 * m21 - m20 * m11
        sx = max(abs(A + B * y) for y in ys) / D2min
        # ∂sy/∂y = (C + E·x)/D²
        C = m11 * m22 - m21 * m12
        E = m11 * m20 - m21 * m10
        sy = max(abs(C + E * x) for x in xs) / D2min
        # In-chunk output spread: a chunk is gp = group·128 consecutive
        # flattened pixels of the PADDED (Hp x Wp) image. If it stays in one
        # row, x spans min(gp, Wp)−1; if it wraps row boundaries (always when
        # Wp < gp, possible whenever Wp != gp), x spans the full row width
        # Wp−1 and y spans ⌈(gp−1)/Wp⌉ rows. Round-1 bug: used gp−1 for the
        # x-span, under-counting by 2·pad·sx when Wp = w + 2·pad > gp.
        gp = group * LANES
        wrap_rows = 1 + (gp - 2) // Wp
        span = max((min(gp, Wp) - 1) * sx, (Wp - 1) * sx + wrap_rows * sy)
        worst = max(worst, span)
    # +2 = the second bilinear tap row (r1 = r0+1) + the floor() boundary row
    return min(int(np.ceil(worst)) + 2, h)
