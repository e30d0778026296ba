"""Differentiable plane-sweep homography warping (the MVS cost-volume hot op).

TPU-native equivalent of the reference's ``homo_warp`` (``/root/reference/utils.py:49-99``):
for every depth plane d and (padded) reference pixel (x, y), compute the source-view
pixel p = R [x, y, 1]^T + T / d, then bilinear-sample the source feature map at p with
zeros padding (align_corners=True).

Reference-behavior notes (verified against utils.py):
- the reference pixel grid covers the *padded* extent: coords run from -pad to H+pad-1
  (utils.py:72-74), while normalization to [-1, 1] uses the *unpadded* (W-1)/2, (H-1)/2
  (utils.py:88-89), so padded border pixels sample out-of-bounds and get zeros + a 0
  in-bounds mask.
- proj_mat is ``src_proj @ ref_proj_inv`` in 1/4-resolution feature space, [3, 4].

This XLA version is the oracle; a Pallas kernel (zest_tpu.kernels.plane_sweep) covers the
performance path.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .grid_sample import grid_sample_2d

_HI = jax.lax.Precision.HIGHEST  # homography math must not round through bf16


def homography_grid(proj_mat, depth_values, feat_hw, pad: int = 0):
    """Source-view sampling grid for every (depth, padded ref pixel).

    Args:
        proj_mat: [3, 4] = src_proj @ ref_proj_inv (feature-space).
        depth_values: [D] depth plane values.
        feat_hw: (H, W) unpadded feature-map size.
        pad: volume padding.
    Returns:
        grid: [D, H+2p, W+2p, 2] normalized (x, y) in grid_sample convention.
    """
    H, W = feat_hw
    Hp, Wp = H + 2 * pad, W + 2 * pad
    R = proj_mat[:, :3]  # [3, 3]
    T = proj_mat[:, 3]   # [3]

    ys = jnp.arange(Hp, dtype=jnp.float32) - pad
    xs = jnp.arange(Wp, dtype=jnp.float32) - pad
    grid_y, grid_x = jnp.meshgrid(ys, xs, indexing="ij")            # [Hp, Wp]
    ref = jnp.stack([grid_x, grid_y, jnp.ones_like(grid_x)], -1)    # [Hp, Wp, 3]

    # src = R @ ref + T / d   per depth plane
    src = jnp.matmul(ref, R.T, precision=_HI)                        # [Hp, Wp, 3]
    src = src[None] + T[None, None, None, :] / depth_values[:, None, None, None]
    xy = src[..., :2] / src[..., 2:3]                                # [D, Hp, Wp, 2]

    gx = xy[..., 0] / ((W - 1) / 2.0) - 1.0
    gy = xy[..., 1] / ((H - 1) / 2.0) - 1.0
    return jnp.stack([gx, gy], axis=-1)


def homo_warp(src_feat, proj_mat, depth_values, src_grid=None, pad: int = 0):
    """Warp a source feature map to every depth plane of the reference frustum.

    Args:
        src_feat: [H, W, C] source features (channels-last).
        proj_mat: [3, 4] src_proj @ ref_proj_inv.
        depth_values: [D].
        src_grid: optional precomputed grid (reused for the RGB warp at
                  networks.py:1115 to skip recomputation).
        pad: padding of the reference extent.
    Returns:
        warped: [D, H+2p, W+2p, C]
        grid:   [D, H+2p, W+2p, 2]
    """
    H, W, _ = src_feat.shape
    if src_grid is None:
        src_grid = homography_grid(proj_mat, depth_values, (H, W), pad=pad)
    warped = grid_sample_2d(src_feat, src_grid, padding_mode="zeros")
    return warped, src_grid


def identity_warp(src_feat, n_planes: int, pad: int = 0):
    """Fast path for identity projection matrices: the warp grid equals the ref
    pixel grid, so 'warping' is exactly pad + broadcast over depth — no gather.

    This is the case for the reference's dynamic encoding volume: the temporal
    neighbour proj_mats are constructed as P @ P⁻¹ == I (data/nsff.py:294-297),
    so ALL its source warps are identity. Semantically exact: bilinear sampling at
    integer pixel coords returns the pixel value; the strict in-bounds mask
    excludes the 1-pixel image border exactly as the gather path does.

    Returns (warped [D, H+2p, W+2p, C], mask [D, H+2p, W+2p]).
    """
    H, W, C = src_feat.shape
    padded = jnp.pad(src_feat, ((pad, pad), (pad, pad), (0, 0)))
    Hp, Wp = H + 2 * pad, W + 2 * pad
    warped = jnp.broadcast_to(padded[None], (n_planes, Hp, Wp, C))
    ys = jnp.arange(Hp) - pad
    xs = jnp.arange(Wp) - pad
    # strict interior: integer coord x maps to grid −1 at 0 and +1 at W−1
    my = ((ys > 0) & (ys < H - 1)).astype(src_feat.dtype)
    mx = ((xs > 0) & (xs < W - 1)).astype(src_feat.dtype)
    mask = jnp.broadcast_to((my[:, None] * mx[None, :])[None], (n_planes, Hp, Wp))
    return warped, mask


def identity_warp_cm(src_feat, n_planes: int, pad: int = 0):
    """``identity_warp`` in CHANNEL-MAJOR form: (warped [D, C, Hp·Wp],
    mask [D, 1, Hp·Wp]).

    Same exact semantics; the channel-major layout keeps the cost-volume
    variance chain's minor dim a dense multiple of 128 lanes instead of a
    C-lane-padded channel minor (see models.mvsnet.build_cost_volume).
    """
    H, W, C = src_feat.shape
    padded = jnp.pad(src_feat, ((pad, pad), (pad, pad), (0, 0)))
    Hp, Wp = H + 2 * pad, W + 2 * pad
    cmf = jnp.moveaxis(padded, -1, 0).reshape(C, Hp * Wp)
    warped = jnp.broadcast_to(cmf[None], (n_planes, C, Hp * Wp))
    ys = jnp.arange(Hp) - pad
    xs = jnp.arange(Wp) - pad
    my = ((ys > 0) & (ys < H - 1)).astype(src_feat.dtype)
    mx = ((xs > 0) & (xs < W - 1)).astype(src_feat.dtype)
    mask = (my[:, None] * mx[None, :]).reshape(1, 1, Hp * Wp)
    return warped, jnp.broadcast_to(mask, (n_planes, 1, Hp * Wp))


def in_bounds_mask(grid):
    """Strict in-bounds mask of a normalized grid: both coords in (-1, 1).

    Mirrors networks.py:1121-1123 (cost-volume view-count mask).
    """
    inside = (grid > -1.0) & (grid < 1.0)
    return (inside[..., 0] & inside[..., 1]).astype(jnp.float32)
