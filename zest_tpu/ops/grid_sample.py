"""Differentiable grid sampling on TPU — gather-based bilinear/trilinear interpolation.

TPU-native replacement for the CUDA ``F.grid_sample`` kernels the reference leans on
(``/root/reference/utils.py:94,455,490``). Semantics match torch with
``align_corners=True`` and ``padding_mode`` in {"zeros", "border"}:

- align_corners=True: grid value g in [-1, 1] maps to pixel x = (g + 1) / 2 * (size - 1).
- "zeros": out-of-bounds taps contribute 0 (each of the 2^k corner taps is masked
  individually, matching torch).
- "border": coordinates are clamped to the valid range before interpolation.

Layout: channels-last (TPU-friendly). The hot 3D path (per-ray-point encoding-volume
lookup) also has a Pallas implementation in ``zest_tpu.kernels``; this XLA version is the
portable reference/oracle.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _unnormalize(coord, size):
    """align_corners=True mapping from [-1,1] to [0, size-1]."""
    return (coord + 1.0) * 0.5 * (size - 1)


def _gather_2d(img, iy, ix):
    """img: [H, W, C]; iy/ix: [...] int32 (assumed in-bounds). Returns [..., C]."""
    H, W, C = img.shape
    flat = img.reshape(H * W, C)
    idx = iy * W + ix
    return jnp.take(flat, idx, axis=0)


def grid_sample_2d(img, grid, padding_mode: str = "zeros"):
    """Bilinear sample of a 2D image at normalized grid coords.

    Args:
        img: [H, W, C].
        grid: [..., 2] with (x, y) in [-1, 1]; x indexes W, y indexes H
              (torch grid_sample convention).
        padding_mode: "zeros" | "border".
    Returns: [..., C]
    """
    H, W, _ = img.shape
    x = _unnormalize(grid[..., 0], W)
    y = _unnormalize(grid[..., 1], H)

    if padding_mode == "border":
        x = jnp.clip(x, 0.0, W - 1)
        y = jnp.clip(y, 0.0, H - 1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + 1
    y1 = y0 + 1
    wx1 = x - x0
    wy1 = y - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def tap(yi, xi, wgt):
        if padding_mode == "zeros":
            valid = (yi >= 0) & (yi <= H - 1) & (xi >= 0) & (xi <= W - 1)
            wgt = jnp.where(valid, wgt, 0.0)
        yi = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        xi = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        return _gather_2d(img, yi, xi) * wgt[..., None]

    return (tap(y0, x0, wy0 * wx0) + tap(y0, x1, wy0 * wx1)
            + tap(y1, x0, wy1 * wx0) + tap(y1, x1, wy1 * wx1))


def grid_sample_3d(vol, grid, padding_mode: str = "zeros"):
    """Trilinear sample of a 3D volume at normalized grid coords.

    Args:
        vol: [D, H, W, C].
        grid: [..., 3] with (x, y, z) in [-1, 1]; x indexes W, y indexes H, z indexes D
              (torch 3D grid_sample convention — matches the NDC layout produced by
              ``geometry.world_to_ndc`` scaled to [-1,1], utils.py:451).
        padding_mode: "zeros" | "border".
    Returns: [..., C]
    """
    D, H, W, C = vol.shape
    x = _unnormalize(grid[..., 0], W)
    y = _unnormalize(grid[..., 1], H)
    z = _unnormalize(grid[..., 2], D)

    if padding_mode == "border":
        x = jnp.clip(x, 0.0, W - 1)
        y = jnp.clip(y, 0.0, H - 1)
        z = jnp.clip(z, 0.0, D - 1)

    x0, y0, z0 = jnp.floor(x), jnp.floor(y), jnp.floor(z)
    wx1, wy1, wz1 = x - x0, y - y0, z - z0
    wx0, wy0, wz0 = 1.0 - wx1, 1.0 - wy1, 1.0 - wz1

    flat = vol.reshape(D * H * W, C)

    def tap(zi, yi, xi, wgt):
        if padding_mode == "zeros":
            valid = ((zi >= 0) & (zi <= D - 1) & (yi >= 0) & (yi <= H - 1)
                     & (xi >= 0) & (xi <= W - 1))
            wgt = jnp.where(valid, wgt, 0.0)
        zi = jnp.clip(zi, 0, D - 1).astype(jnp.int32)
        yi = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        xi = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        idx = (zi * H + yi) * W + xi
        return jnp.take(flat, idx, axis=0) * wgt[..., None]

    out = (tap(z0, y0, x0, wz0 * wy0 * wx0)
           + tap(z0, y0, x0 + 1, wz0 * wy0 * wx1)
           + tap(z0, y0 + 1, x0, wz0 * wy1 * wx0)
           + tap(z0, y0 + 1, x0 + 1, wz0 * wy1 * wx1)
           + tap(z0 + 1, y0, x0, wz1 * wy0 * wx0)
           + tap(z0 + 1, y0, x0 + 1, wz1 * wy0 * wx1)
           + tap(z0 + 1, y0 + 1, x0, wz1 * wy1 * wx0)
           + tap(z0 + 1, y0 + 1, x0 + 1, wz1 * wy1 * wx1))
    return out


def paired_volume(vol):
    """Octo-paired super-volume build for ``grid_sample_3d_paired``.

    Returns flat [(D+2)·(H+2)·(W+2), 8·C]: row r = (z·(H+2) + y)·(W+2) + x
    (z∈[0,D], y∈[0,H], x∈[0,W]) holds the 8 corner taps
    vol[z-1..z, y-1..y, x-1..x] in lane order oct·C + c, oct = dz·4+dy·2+dx
    (zero slabs at both borders; floor = -1 taps — frequent for flow-warped
    coords — read a (0, vol[0]) pair instead of silently clamping to vol[1]).
    Rows whose x = W+1 / y = H+1 / z = D+1 are wrap garbage and are never
    addressed: ``_paired_taps`` clips every axis index to [0, dim].

    LAYOUT IS THE WHOLE GAME here (v5e, flagship 128x120x176x8 bf16 volume,
    427k sites, tools/probe_paired_build.py): the previous 8-octant
    stack+moveaxis build materialized arrays with (8, C=8) minor dims — 8 of
    128 lanes occupied, 16x bandwidth waste — costing ~20 ms fwd and a ~30 ms
    autodiff fold bwd for what is logically a 44 MB read + 361 MB write. This
    form pads the volume ONCE, flattens to 2D rows, and lane-CONCATS a
    row-shifted copy per axis (x: shift 1, y: shift W+2, z: shift
    (H+2)(W+2)) — every intermediate is 2D [rows, k·C], there is no 4D
    reshape, no transpose, and no compaction pass (the gather indexes the
    padded row space directly). Measured: sampler fwd 31.0 -> 14.9 ms, full
    fwd+bwd chain 95.1 -> 48.9 -> 41.2 ms, bit-exact fwd.

    The adjoint is a custom VJP (``_paired_fold_for``): plain autodiff
    transposes the concats to 2D slice-adds, but the dy/dx passes produce
    [rows, 2C] / [rows, C] arrays, and XLA relayouts such narrow (<32-lane)
    intermediates between row-/column-major tilings with a serial wide.body
    while-loop (seen in the compiled HLO; ~8 ms each). The custom fold keeps
    the dz pass wide and folds dy+dx with two 2-hot SELECTION MATMULS on the
    lane-merged view [(D+2)(H+2), (W+2)·4C] — rows are whole y-lines, so a
    dy shift is one row shift, a dx shift is lane index arithmetic encoded in
    the selection matrix, and every materialized array is ≥1.4k lanes. The
    ~0.5 TFLOP of 2-hot matmul is MXU change (48.9 -> 41.2 ms full chain,
    grad-exact: selection entries are 0/1, exact in bf16; f32 volumes run
    the matmuls at Precision.HIGHEST).

    Factored out so callers that sample the SAME volume several times per
    step can build once and share (pass as ``paired=``).
    """
    D, H, W, C = vol.shape
    return _paired_fold_for(D, H, W, C, vol.dtype == jnp.bfloat16)(vol)


def _paired_concat_build(vol):
    """Raw flat2d build (three lane-concat passes) — see ``paired_volume``."""
    D, H, W, C = vol.shape
    vol_pad = jnp.pad(vol, ((1, 1), (1, 1), (1, 1), (0, 0)))
    f = vol_pad.reshape(-1, C)               # [(D+2)(H+2)(W+2), C]
    w2 = W + 2
    t2 = (H + 2) * (W + 2)
    x = jnp.concatenate([f[:-1], f[1:]], -1)          # dx pairs   [.., 2C]
    y = jnp.concatenate([x[:-w2], x[w2:]], -1)        # dy pairs   [.., 4C]
    return jnp.concatenate([y[:-t2], y[t2:]], -1)     # dz pairs   [.., 8C]


@functools.lru_cache(maxsize=None)
def _fold_sel_np(W, C):
    """Selection matrices M_dy [(W+2)·4C, (W+2)·C] for the dy+dx fold:
    M_dy[x_in·4C + dy·2C + dx·C + c, x_out·C + c] = 1 where x_in = x_out - dx.
    x_out spans the FULL padded W+2 line (garbage x_out columns are sliced
    away afterwards); the x_out=0, dx=1 cross-line leak reads a garbage-x row
    of the previous y-line, which is never scattered, hence provably zero."""
    w2 = W + 2
    i = np.arange(w2 * 4 * C)
    x_in, rem = np.divmod(i, 4 * C)
    dy_in, rem = np.divmod(rem, 2 * C)
    dx_in, c_in = np.divmod(rem, C)
    o = np.arange(w2 * C)
    x_out, c_out = np.divmod(o, C)
    return tuple(
        ((dy_in[:, None] == dy) & (c_in[:, None] == c_out[None, :])
         & (x_in[:, None] == x_out[None, :] - dx_in[:, None])
         ).astype(np.float32)
        for dy in (0, 1))


@functools.lru_cache(maxsize=None)
def _paired_fold_for(D, H, W, C, approx):
    """Shape-specialised flat2d build with the MXU-selection fold adjoint
    (see ``paired_volume`` for the measured story)."""
    m0_np, m1_np = _fold_sel_np(W, C)
    mdt = jnp.bfloat16 if approx else jnp.float32
    prec = jax.lax.Precision.DEFAULT if approx else jax.lax.Precision.HIGHEST
    w2 = W + 2
    t2 = (H + 2) * (W + 2)

    @jax.custom_vjp
    def build(vol):
        return _paired_concat_build(vol)

    def fwd(vol):
        return _paired_concat_build(vol), None

    def bwd(_, dZ):
        m0 = jnp.asarray(m0_np, mdt)
        m1 = jnp.asarray(m1_np, mdt)
        # dz fold: wide [N3, 8C] -> [(D+2)(H+2)(W+2), 4C] slice-adds, padded
        # straight into the lane-merged y-line view
        dY = (jnp.pad(dZ[:, :4 * C], ((0, t2 + 1 + w2), (0, 0)))
              + jnp.pad(dZ[:, 4 * C:], ((t2, 1 + w2), (0, 0))))
        dYm = dY.reshape(-1, w2 * 4 * C)                 # [(D+2)(H+2), .]
        # dy fold via row shift + dx fold via selection matmul (MXU)
        tm0 = jnp.dot(dYm, m0, preferred_element_type=jnp.float32,
                      precision=prec)
        tm1 = jnp.dot(jnp.pad(dYm[:-1], ((1, 0), (0, 0))), m1,
                      preferred_element_type=jnp.float32, precision=prec)
        DV = (tm0 + tm1).reshape(D + 2, H + 2, w2 * C)
        d_vol = DV[1:-1, 1:-1, C:C + W * C].reshape(D, H, W, C)
        return (d_vol.astype(mdt if approx else jnp.float32),)

    build.defvjp(fwd, bwd)
    return build


def _paired_taps(grid, D, H, W):
    """Padded-row indices + octant weights for the paired gather.

    Returns (row_idx int32 [...], w float32 [..., 2, 2, 2]) with w holding the
    trilinear octant weights (zeros for out-of-bounds taps — torch
    grid_sample "zeros" semantics).
    """
    x = _unnormalize(grid[..., 0], W)
    y = _unnormalize(grid[..., 1], H)
    z = _unnormalize(grid[..., 2], D)

    def taps(v, n):
        v0 = jnp.floor(v)
        f = v - v0
        m0 = (v0 >= 0) & (v0 <= n - 1)
        m1 = (v0 + 1 >= 0) & (v0 + 1 <= n - 1)
        w0 = jnp.where(m0, 1.0 - f, 0.0)
        w1 = jnp.where(m1, f, 0.0)
        # padded-row index: base floor shifted by the zero slab; clip keeps it
        # gatherable, and any clipped case has both weights masked to zero
        i0 = jnp.clip(v0 + 1, 0, n).astype(jnp.int32)
        return i0, jnp.stack([w0, w1], -1)

    ix0, wx = taps(x, W)
    iy0, wy = taps(y, H)
    iz0, wz = taps(z, D)
    row_idx = (iz0 * (H + 2) + iy0) * (W + 2) + ix0
    w = (wz[..., :, None, None] * wy[..., None, :, None]
         * wx[..., None, None, :])                             # [..., 2,2,2]
    return row_idx, w


def _take_paired_rows(flat, row_idx):
    from .. import flags as _flags
    if _flags.DMA_ROW_GATHER and jax.default_backend() == "tpu":
        # DMA-pipelined row gather (kernels/dma_gather.py): the scalar core
        # issues one async copy per row with a bounded in-flight window,
        # overlapping HBM latency instead of serializing on it like the XLA
        # row gather. Identical values; VJP is the same row scatter-add.
        from ..kernels.dma_gather import take_rows
        return take_rows(flat, row_idx)                        # [..., 8C]
    return jnp.take(flat, row_idx, axis=0)                     # [..., 8C]


@functools.lru_cache(maxsize=None)
def _combine_sel_np(C):
    """One-hot lifts for the octant-weighted combine: K [8, 8C] spreads the
    octant weight across its C lanes; K2 [8C, C] sums octant groups."""
    K = np.zeros((8, 8 * C), np.float32)
    K2 = np.zeros((8 * C, C), np.float32)
    for o in range(8):
        K[o, o * C:(o + 1) * C] = 1.0
        K2[o * C + np.arange(C), np.arange(C)] = 1.0
    return K, K2


def _rows_weights_combine(rows, w, C):
    """out[i, c] = Σ_oct rows[i, oct·C + c] · w[i, oct].

    Written as ``((rows · (w @ K)) @ K2)`` with one-hot K/K2 so both the
    forward and the autodiff transpose only materialize WIDE [N, 8C] arrays
    (d_rows = (g @ K2ᵀ)·(w @ K) — one wide elementwise product feeding the
    row scatter). The direct einsum's backward expands a 5D
    [N, 2, 2, 2, C]-minor cotangent — the same narrow-minor tiling XLA
    relayouts with a serial wide.body loop (see ``paired_volume``). Isolated
    A/B is neutral (40.3 vs 40.6 ms, tools/probe_paired_build.py
    --mxucombine) but the in-step bench reads 4,546 -> 4,596 rays/s — the
    wide-only adjoint composes better with the downstream row scatter.
    One-hot entries are exact; matmuls run at HIGHEST precision (f32 MACs)."""
    K_np, K2_np = _combine_sel_np(C)
    K = jnp.asarray(K_np)
    K2 = jnp.asarray(K2_np)
    hi = jax.lax.Precision.HIGHEST
    wk = jnp.dot(w.reshape(-1, 8).astype(jnp.float32), K, precision=hi)
    prod = rows.reshape(-1, 8 * C).astype(jnp.float32) * wk
    return jnp.dot(prod, K2, precision=hi).reshape(w.shape[:-3] + (C,))


@functools.lru_cache(maxsize=None)
def _wide_combine_for(C, n_rows):
    """take + octant combine with a custom VJP whose residuals are all WIDE.

    Same math as ``_take_paired_rows`` + ``_rows_weights_combine`` under
    autodiff (grad-identical: same HIGHEST-precision one-hot matmuls, same
    bf16 cast into the row scatter), but the saved residuals are the wide
    ``rows`` [N, 8C] and the PRE-LIFTED ``wk = w @ K`` [N, 8C] instead of the
    narrow ``w`` [N, 8] — so the backward touches no narrow (<32-lane) arrays
    on the d_flat side at all. Round-4 HLO analysis attributed the in-step
    expand+scatter composition tax (30.2 ms vs ~11 isolated) to serial
    `wide.body` relayout loops on narrow intermediates crossing the
    forward/backward boundary; Pallas layout-pinning was measured and
    rejected (tools/probe_paired_build.py --pin), this targets the residuals
    themselves. Flag-gated: flags.WIDE_COMBINE_VJP.

    ``idx`` is a real operand (int32 cotangent = float0), NOT a closure:
    custom_vjp rejects closed-over tracers when the caller is itself traced.
    Factory is shape-keyed so the jitted step caches one instance per
    (C, n_rows) pairing.
    """
    K_np, K2_np = _combine_sel_np(C)
    hi = jax.lax.Precision.HIGHEST

    @jax.custom_vjp
    def tc(flat, idx, w8):
        rows = jnp.take(flat, idx, axis=0)
        wk = jnp.dot(w8.astype(jnp.float32), jnp.asarray(K_np), precision=hi)
        prod = rows.reshape(-1, 8 * C).astype(jnp.float32) * wk
        return jnp.dot(prod, jnp.asarray(K2_np), precision=hi)

    def fwd(flat, idx, w8):
        rows = jnp.take(flat, idx, axis=0).reshape(-1, 8 * C)
        wk = jnp.dot(w8.astype(jnp.float32), jnp.asarray(K_np), precision=hi)
        out = jnp.dot(rows.astype(jnp.float32) * wk, jnp.asarray(K2_np),
                      precision=hi)
        return out, (rows, wk, idx)

    def bwd(res, g):
        rows, wk, idx = res
        gk = jnp.dot(g.astype(jnp.float32), jnp.asarray(K2_np).T,
                     precision=hi)
        d_rows = (gk * wk).astype(rows.dtype)
        d_flat = jnp.zeros((n_rows, 8 * C), rows.dtype).at[idx].add(d_rows)
        d_w8 = jnp.dot(rows.astype(jnp.float32) * gk, jnp.asarray(K_np).T,
                       precision=hi)
        d_idx = np.zeros(idx.shape, dtype=jax.dtypes.float0)
        return d_flat, d_idx, d_w8

    tc.defvjp(fwd, bwd)
    return tc


def _take_combine_wide(flat, row_idx, w, C):
    """Wide-residual take+combine — see ``_wide_combine_for``."""
    tc = _wide_combine_for(C, flat.shape[0])
    out = tc(flat, row_idx.reshape(-1), w.reshape(-1, 8))
    return out.reshape(w.shape[:-3] + (C,))


def grid_sample_3d_paired(vol, grid, paired=None):
    """Trilinear 3D sampling via ONE wide gather per point ("zeros" mode).

    Identical taps/weights to ``grid_sample_3d`` (bit-exact, verified on a
    v5e), but the 8 corner taps are pre-paired into a super-volume
    ``volP[z, y, x] = vol[z..z+1, y..y+1, x..x+1, :]`` of 8·C contiguous
    channels, so each point needs one row gather of 8C elements instead of 8
    gathers of C. TPU gathers are per-row latency-bound: measured 306 → 133 ms
    fwd+bwd for the flagship's 427k warped sample sites (tools/
    bench_warped_gather.py), then 95.1 → 48.9 ms once the build/fold moved to
    the 2D-flat lane-concat form (tools/probe_paired_build.py — see
    ``paired_volume`` for the layout story). Differentiation is plain
    autodiff end-to-end: the gather transposes to a clean wide-row
    scatter-add and each build concat to a pair of 2D slice-adds. Hand-
    written VJPs (separable pad-shift fold; 8-slice fold on the old 4D build)
    measured no better and were dropped (BENCH_NOTES round 4).

    HBM cost: volP is ~8x the volume (~361 MB bf16 at flagship scale) — the
    trade is decisively won by the gather/scatter savings. Pass ``paired`` =
    ``paired_volume(vol)`` to share one build across several sample calls.

    Args: vol [D, H, W, C]; grid [..., 3] (x, y, z) in [-1, 1].
    Returns: [..., C]
    """
    D, H, W, C = vol.shape
    flat = paired_volume(vol) if paired is None else paired
    row_idx, w = _paired_taps(grid, D, H, W)
    from .. import flags as _flags
    if _flags.WIDE_COMBINE_VJP and not _flags.DMA_ROW_GATHER:
        return _take_combine_wide(flat, row_idx, w, C)
    rows = _take_paired_rows(flat, row_idx)
    return _rows_weights_combine(rows, w, C)


def resize_bilinear_align_corners(img, out_hw):
    """Bilinear resize with align_corners=True (torch F.interpolate semantics used by
    FeatureNet's FPN upsample, networks.py:985-987).

    Args: img [H, W, C]; out_hw (H2, W2).
    Returns: [H2, W2, C]
    """
    H, W, _ = img.shape
    H2, W2 = out_hw
    ys = jnp.linspace(0.0, H - 1, H2)
    xs = jnp.linspace(0.0, W - 1, W2)

    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = (ys - y0)[:, None, None]
    wx = (xs - x0)[None, :, None]
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)

    top = img[y0][:, x0] * (1 - wx) + img[y0][:, x1] * wx
    bot = img[y1][:, x0] * (1 - wx) + img[y1][:, x1] * wx
    return top * (1 - wy) + bot * wy
