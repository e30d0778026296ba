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

    Returns flat [(D+1)·(H+1)·(W+1), 8·C] with row (z, y, x) holding the 8
    corner taps vol[z-1..z, y-1..y, x-1..x] (zero slabs at the -1 borders).
    Factored out so callers that sample the SAME volume several times per step
    (the t±1 scene-flow-warped lookups + chain re-render) build it ONCE and
    share it — each build is ~350 MB of HBM traffic and the builds sit inside
    separate lax.cond bodies where XLA cannot CSE them.

    Carries a custom VJP: plain autodiff transposes the stack+moveaxis build
    into a ~358 MB relayout of the cotangent super-volume; the hand adjoint is
    a direct 8-static-slice sum straight into base [D, H, W, C] layout (one
    fused elementwise pass) — see ``_paired_volume_for``.
    """
    D, H, W, C = vol.shape
    return _paired_volume_for(D, H, W, C)(vol)


def _paired_build(vol):
    """Raw octo-paired build (no custom VJP) — see ``paired_volume``."""
    D, H, W, C = vol.shape
    # leading zero slab per axis: a point just OUTSIDE the volume whose +1 tap
    # is the first slice (floor = -1, frequent for flow-warped coords) must
    # gather a row whose pair halves are (0, vol[0]) — clamping the row to 0
    # would silently substitute vol[1] for the +1 tap. One trailing pad too, so
    # every octant below is a static slice of the same padded array.
    # NOTE: built as ONE 8-way leading-axis stack of static slices + ONE
    # transpose — a minor-dim concat (and a pair-of-pairs chain) made XLA
    # lower the 346 MB build into serial while/dynamic-update-slice streams
    # (~36 ms/step, round-3 profile); an 8x one-hot-MXU accumulate measured
    # slower end-to-end (BENCH_NOTES round 3).
    volZ2 = jnp.pad(vol, ((1, 1), (1, 1), (1, 1), (0, 0)))
    octants = [volZ2[dz:dz + D + 1, dy:dy + H + 1, dx:dx + W + 1]
               for dz in (0, 1) for dy in (0, 1) for dx in (0, 1)]
    volP = jnp.moveaxis(jnp.stack(octants, 0), 0, 3)  # [D+1, H+1, W+1, 8, C]
    return volP.reshape((D + 1) * (H + 1) * (W + 1), 8 * C)


@functools.lru_cache(maxsize=None)
def _paired_volume_for(D, H, W, C):
    """Shape-specialised paired build with a hand-written adjoint.

    Autodiff transposes the stack+moveaxis build into a full relayout of the
    cotangent super-volume (~358 MB at flagship scale) — measured as the
    dominant share of the warped-sites d_vol backward (tools/
    probe_paired_vjp.py; the clean 427k-row scatter itself is ~10 ms,
    tools/probe_block_gather.py). The hand adjoint is the algebraic fold
    d_vol[a, b, e, c] = Σ_{dz,dy,dx} dP[a+1-dz, b+1-dy, e+1-dx, oct, c]
    written as a sum of 8 STATIC slices of the cotangent — indices are always
    in range for the kept region, so it is one fused elementwise pass with no
    pads, no transposes, and the output lands directly in base [D, H, W, C]
    layout. (A separable pad-shift fold over (2, 2, 2, C) minor axes measured
    SLOWER than autodiff — lane-poor minor layout; see BENCH_NOTES round 4.)
    """

    @jax.custom_vjp
    def build(vol):
        return _paired_build(vol)

    def fwd(vol):
        return _paired_build(vol), None

    def bwd(_, d_flat):
        # separable: fold one axis per pass, consuming the octant axis MSB
        # first so each pass adds two CONTIGUOUS column halves (32C, 16C, 8C
        # bytes of contiguity) at a unit row shift — all static slices, no
        # pads. Measured on the v5e at flagship scale (tools/
        # probe_paired_vjp.py): this fold is 19.1 ms standalone (flat 8-slice
        # form within noise, 19.3), and the isolated d_vol chain (fwd + expand
        # + scatter + fold) drops 94.1 -> 77.1 ms vs plain autodiff. In the
        # FULL train step the A/B is neutral (4,216 vs 4,245 rays/s;
        # step_nodvolgrad delta 45.1 vs 44.8 ms) — in context XLA's transpose
        # of the build already reduces to an equivalent fold — so this VJP's
        # value is pinning that reduction deterministically, not a step win.
        dP = d_flat.reshape(D + 1, H + 1, W + 1, 8, C)
        A = dP[1:, :, :, 0:4] + dP[:-1, :, :, 4:8]     # dz → [D,H+1,W+1,4,C]
        B = A[:, 1:, :, 0:2] + A[:, :-1, :, 2:4]       # dy → [D,H,W+1,2,C]
        d_vol = B[:, :, 1:, 0] + B[:, :, :-1, 1]       # dx → [D,H,W,C]
        return (d_vol,)

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
    row_idx = (iz0 * (H + 1) + iy0) * (W + 1) + ix0
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


def _rows_weights_combine(rows, w, C):
    octo = rows.reshape(rows.shape[:-1] + (2, 2, 2, C))
    return jnp.einsum("...zyxc,...zyx->...c", octo.astype(jnp.float32),
                      w.astype(jnp.float32))


def grid_sample_3d_paired(vol, grid, paired=None):
    """Trilinear 3D sampling via ONE wide gather per point ("zeros" mode).

    Identical taps/weights to ``grid_sample_3d`` (bit-exact, verified on a
    v5e), but the 8 corner taps are pre-paired into a super-volume
    ``volP[z, y, x] = vol[z..z+1, y..y+1, x..x+1, :]`` of 8·C contiguous
    channels, so each point needs one row gather of 8C elements instead of 8
    gathers of C. TPU gathers are per-row latency-bound: measured 306 → 133 ms
    fwd+bwd for the flagship's 427k warped sample sites (tools/
    bench_warped_gather.py). Differentiation is plain autodiff — the gather
    transposes to a clean wide-row scatter-add, and the pairing adjoint is
    handled by ``paired_volume``'s custom VJP (direct 8-slice fold). A fully
    hand-written sampler VJP (separable pad-shift fold) measured SLOWER than
    autodiff on the chip and was dropped (BENCH_NOTES round 4).

    HBM cost: volP is 8x the volume (~350 MB bf16 at flagship scale) — the
    trade is decisively won by the gather/scatter savings. Pass ``paired`` =
    ``paired_volume(vol)`` to share one build across several sample calls.

    Args: vol [D, H, W, C]; grid [..., 3] (x, y, z) in [-1, 1].
    Returns: [..., C]
    """
    D, H, W, C = vol.shape
    flat = paired_volume(vol) if paired is None else paired
    row_idx, w = _paired_taps(grid, D, H, W)
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
