"""Pallas TPU kernel: plane-sweep homography warp (the MVS cost-volume hot op).

The XLA gather formulation of ``ops.homography.homo_warp`` runs at ~35 ms per source
view on a v5e chip (~30 GB/s effective — XLA lowers the 2.7M-point bilinear gather to
a slow generic gather). This kernel reaches the hardware's ``tpu.dynamic_gather``
through Pallas ``take_along_axis`` lowering:

- The source feature map is laid out channel-major ``[C, h·w]`` and kept in VMEM
  (~1.2 MB at 72x128x32 f32) across all grid steps.
- Tap indices/weights for the 4 bilinear taps are precomputed in XLA (cheap fused
  elementwise) as ``[G, 4, L]`` blocks where ``L == h·w`` — the Mosaic lowering
  constraint is indices.shape == data.shape, so each program gathers a full-width
  ``[C, L]`` block per tap and the output pixels are tiled over ``G`` programs.
- Out-of-bounds taps carry weight 0 (zeros padding semantics); indices are clamped.

Gradients: only the source features are differentiated (projection matrices and
depth planes are data). The backward pass is the XLA scatter-add adjoint via
``jax.vjp`` of the reference XLA implementation (Mosaic has no scatter lowering).

Equivalent semantics to /root/reference/utils.py:49-99 (see ops/homography.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.homography import homography_grid, homo_warp as homo_warp_xla


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _gather_kernel(src_ref, idx_ref, wgt_ref, out_ref):
    """src [C, L]; idx/wgt [1, 4, L] (leading grid-block dim); out [1, C, L]."""
    C, L = src_ref.shape
    src = src_ref[:]
    acc = jnp.zeros((C, L), src.dtype)
    for t in range(4):
        ib = jnp.broadcast_to(idx_ref[0, t][None], (C, L))
        g = jnp.take_along_axis(src, ib, axis=1, mode="promise_in_bounds")
        acc = acc + g * wgt_ref[0, t][None]
    out_ref[0] = acc


def _tap_indices(grid, h: int, w: int, L: int):
    """Bilinear tap flat indices + weights from a normalized sampling grid.

    Args:
        grid: [D, Hp, Wp, 2] normalized (x, y) in [-1, 1] (align_corners=True).
    Returns:
        idx: [D*n_chunks, 4, L] int32 (clamped); wgt: same shape f32.
    """
    D, Hp, Wp, _ = grid.shape
    x = (grid[..., 0] + 1.0) * 0.5 * (w - 1)
    y = (grid[..., 1] + 1.0) * 0.5 * (h - 1)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0

    taps = []
    for dy, dx, wgt in ((0, 0, (1 - fy) * (1 - fx)), (0, 1, (1 - fy) * fx),
                        (1, 0, fy * (1 - fx)), (1, 1, fy * fx)):
        yi = y0 + dy
        xi = x0 + dx
        valid = (yi >= 0) & (yi <= h - 1) & (xi >= 0) & (xi <= w - 1)
        wv = jnp.where(valid, wgt, 0.0)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        taps.append((yc * w + xc, wv))

    P = Hp * Wp
    n_chunks = -(-P // L)
    pad_to = n_chunks * L

    def chunked(a, fill):
        a = a.reshape(D, P)
        a = jnp.pad(a, ((0, 0), (0, pad_to - P)), constant_values=fill)
        return a.reshape(D * n_chunks, L)

    idx = jnp.stack([chunked(i, 0) for i, _ in taps], axis=1)
    wgt = jnp.stack([chunked(v, 0.0) for _, v in taps], axis=1)
    return idx, wgt, n_chunks


def _pallas_warp(src_feat, grid):
    """Forward warp via the Pallas gather kernel.

    Args: src_feat [h, w, C]; grid [D, Hp, Wp, 2].
    Returns: warped [D, Hp, Wp, C].
    """
    h, w, C = src_feat.shape
    D, Hp, Wp, _ = grid.shape
    HW = h * w
    L = _round_up(HW, 128)
    Cp = _round_up(C, 8)

    src_cm = jnp.moveaxis(src_feat, -1, 0).reshape(C, HW)
    src_cm = jnp.pad(src_cm, ((0, Cp - C), (0, L - HW)))

    idx, wgt, n_chunks = _tap_indices(grid, h, w, L)
    G = D * n_chunks

    out = pl.pallas_call(
        _gather_kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((Cp, L), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, L), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, L), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Cp, L), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, Cp, L), src_feat.dtype),
        interpret=jax.default_backend() != "tpu",
    )(src_cm, idx, wgt)

    P = Hp * Wp
    out = out.reshape(D, n_chunks, Cp, L)[:, :, :C]          # [D, n, C, L]
    out = jnp.moveaxis(out, 2, 3).reshape(D, n_chunks * L, C)[:, :P]
    return out.reshape(D, Hp, Wp, C)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _warp_diff(src_feat, proj_mat, depth_values, pad):
    grid = homography_grid(proj_mat, depth_values,
                           (src_feat.shape[0], src_feat.shape[1]), pad=pad)
    return _pallas_warp(src_feat, grid)


def _warp_fwd(src_feat, proj_mat, depth_values, pad):
    out = _warp_diff(src_feat, proj_mat, depth_values, pad)
    return out, (src_feat, proj_mat, depth_values)


def _warp_bwd(pad, res, g):
    src_feat, proj_mat, depth_values = res
    # adjoint of the bilinear gather = scatter-add; Mosaic has no scatter, so the
    # backward uses the XLA implementation's VJP (grads flow only to src_feat)
    _, vjp = jax.vjp(lambda f: homo_warp_xla(f, proj_mat, depth_values,
                                             pad=pad)[0], src_feat)
    (d_src,) = vjp(g)
    return d_src, None, None


_warp_diff.defvjp(_warp_fwd, _warp_bwd)


def homo_warp_fast(src_feat, proj_mat, depth_values, pad: int = 0):
    """Drop-in accelerated ``homo_warp`` (same semantics, Pallas forward).

    Returns (warped [D, Hp, Wp, C], grid [D, Hp, Wp, 2]) like the XLA version.
    """
    grid = homography_grid(proj_mat, depth_values,
                           (src_feat.shape[0], src_feat.shape[1]), pad=pad)
    warped = _warp_diff(src_feat, proj_mat, depth_values, pad)
    return warped, grid
