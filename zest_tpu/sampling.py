"""Ray construction: pixel sampling strategies + depth sampling + NDC projection.

Functional re-design of the reference ray builders (``/root/reference/utils.py:102-431``)
for jit: every mode produces a *static* number of rays; the variable-length motion-mask
coordinate list is padded host-side and sampled with a traced count (the reference
samples it with replacement anyway, utils.py:207).

Target view is always the LAST view; NDC is taken w.r.t. the reference view 0
(utils.py:326,383-387).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from . import geometry


class RayBatch(NamedTuple):
    """Everything the renderer + losses need for one batch of rays."""
    pts: jnp.ndarray          # [R, S, 3] world-space sample points
    ndc: jnp.ndarray          # [R, S, 3] NDC (ref view 0) sample points
    z_vals: jnp.ndarray       # [R, S] depth candidates
    rays_d: jnp.ndarray       # [R, 3] unnormalized ray directions
    color_gt: jnp.ndarray     # [R, 3] target pixel colors
    depth_gt: jnp.ndarray     # [R] target (monocular) disparity/depth
    t_vals: jnp.ndarray       # [S] normalized sample positions
    flow_fwd_gt: Optional[jnp.ndarray] = None  # [R, 2]
    flow_bwd_gt: Optional[jnp.ndarray] = None  # [R, 2]
    mask_fwd_gt: Optional[jnp.ndarray] = None  # [R]
    mask_bwd_gt: Optional[jnp.ndarray] = None  # [R]


# ---------------------------------------------------------------------------
# pixel samplers (all return float32 (xs, ys) of static length)
# ---------------------------------------------------------------------------

def sample_pixels_random(rng, H: int, W: int, n_rays: int):
    """Uniform random integer pixels (utils.py:193)."""
    kx, ky = jax.random.split(rng)
    xs = jax.random.randint(kx, (n_rays,), 0, W).astype(jnp.float32)
    ys = jax.random.randint(ky, (n_rays,), 0, H).astype(jnp.float32)
    return xs, ys


def sample_pixels_grid(H: int, W: int, chunk: int = -1, idx: int = 0):
    """Full-image row-major grid, optionally one fixed-size chunk (utils.py:196-200).

    When chunked, the final chunk is padded by out-of-range repeats of the last pixel
    (clamped) so shapes stay static; callers slice the assembled image to H*W.
    """
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    ys, xs = ys.reshape(-1), xs.reshape(-1)
    if chunk > 0:
        start = idx * chunk
        take = jnp.clip(start + jnp.arange(chunk), 0, H * W - 1)
        ys, xs = ys[take], xs[take]
    return xs, ys


def sample_pixels_patches(rng, H: int, W: int, n_patches: int, patch_size: int):
    """n_patches random patch_size² blocks at integer offsets (utils.py:172-189)."""
    kx, ky = jax.random.split(rng)
    xb = jax.random.randint(kx, (n_patches,), 0, W - patch_size)
    yb = jax.random.randint(ky, (n_patches,), 0, H - patch_size)
    dy, dx = jnp.meshgrid(jnp.arange(patch_size), jnp.arange(patch_size), indexing="ij")
    ys = (yb[:, None, None] + dy[None]).astype(jnp.float32).reshape(-1)
    xs = (xb[:, None, None] + dx[None]).astype(jnp.float32).reshape(-1)
    return xs, ys


def sample_pixels_graf(rng, H: int, W: int, patch_size: int, step,
                       scale_anneal: float = -1.0, min_scale: float = 0.25,
                       max_scale: float = 1.0):
    """GRAF-style variable-scale patch (utils.py:102-131 + 157-170).

    A patch_size² lattice spanning [-1,1]² is randomly scaled and shifted, then mapped
    to pixel coordinates. With scale annealing, min_scale grows towards max over
    training: min_scale = clip(max_scale * exp(-(step//1000*3) * anneal), ·, 0.9).

    Note the reference's net coordinate mapping (after its meshgrid/grid_sample
    transposition dance): channel-0 of the patch lattice → x pixels scaled by (W-1),
    channel-1 → y pixels scaled by (H-1); final coords are truncated to int.
    """
    k_scale, k_sh, k_sw, k_fh, k_fw = jax.random.split(rng, 5)
    lin = jnp.linspace(-1.0, 1.0, patch_size)
    p0, p1 = jnp.meshgrid(lin, lin, indexing="ij")  # ref: w, h = meshgrid(...)

    if scale_anneal > 0:
        k_iter = step // 1000 * 3
        min_s = jnp.maximum(min_scale, max_scale * jnp.exp(-k_iter * scale_anneal))
        min_s = jnp.minimum(0.9, min_s)
    else:
        min_s = jnp.asarray(min_scale)

    scale = jax.random.uniform(k_scale, (), minval=min_s, maxval=max_scale)
    h = p1 * scale
    w = p0 * scale

    max_offset = 1.0 - scale
    h_off = jax.random.uniform(k_sh, (), maxval=1.0) * max_offset * \
        (jax.random.randint(k_fh, (), 0, 2).astype(jnp.float32) - 0.5) * 2
    w_off = jax.random.uniform(k_sw, (), maxval=1.0) * max_offset * \
        (jax.random.randint(k_fw, (), 0, 2).astype(jnp.float32) - 0.5) * 2
    h = h + h_off
    w = w + w_off

    xs = jnp.trunc((h + 1.0) * 0.5 * (W - 1)).reshape(-1)
    ys = jnp.trunc((w + 1.0) * 0.5 * (H - 1)).reshape(-1)
    return xs, ys


def sample_motion_pixels(rng, motion_coords, motion_count, n_extra: int):
    """Extra 'hard' samples at motion-mask coordinates (utils.py:205-212).

    Args:
        motion_coords: [M_max, 2] (row, col), zero-padded.
        motion_count: scalar number of valid rows.
    """
    idx = jax.random.randint(rng, (n_extra,), 0, jnp.maximum(motion_count, 1))
    hard = motion_coords[idx]
    return hard[:, 1].astype(jnp.float32), hard[:, 0].astype(jnp.float32)


# ---------------------------------------------------------------------------
# depth sampling
# ---------------------------------------------------------------------------

def depth_candidates(rng, near, far, n_rays: int, n_samples: int,
                     stratified: bool = True):
    """Linear near–far candidates + optional stratified jitter (utils.py:362-375).

    Returns (z_vals [R, S], t_vals [S]).
    """
    t_vals = jnp.linspace(0.0, 1.0, n_samples)
    z = near * (1.0 - t_vals) + far * t_vals
    z = jnp.broadcast_to(z, (n_rays, n_samples))
    if stratified:
        mids = 0.5 * (z[..., 1:] + z[..., :-1])
        upper = jnp.concatenate([mids, z[..., -1:]], -1)
        lower = jnp.concatenate([z[..., :1], mids], -1)
        t_rand = jax.random.uniform(rng, z.shape)
        z = lower + (upper - lower) * t_rand
    return z, t_vals


# ---------------------------------------------------------------------------
# ray builder
# ---------------------------------------------------------------------------

def _gather_pixels(img_hw_c, xs, ys):
    """img [H, W, C] or [H, W]; integer gather at (ys, xs) (utils.py:347-350)."""
    yi = ys.astype(jnp.int32)
    xi = xs.astype(jnp.int32)
    return img_hw_c[yi, xi]


def build_rays(rng, xs, ys, *, images, depths, w2cs, c2ws, intrinsics, near_fars,
               n_samples: int, pad: int = 0, stratified: bool = True,
               flow_fwd=None, flow_bwd=None, mask_fwd=None, mask_bwd=None) -> RayBatch:
    """Assemble a RayBatch for pixel coords (xs, ys) of the target (last) view.

    Mirrors utils.py:290-394 (build_rays_base): target = view -1, NDC ref = view 0.

    Args:
        images: [V, H, W, 3] *unnormalized* images (for gt colors).
        depths: [H, W] target-frame depth/disparity.
        w2cs/c2ws: [V, 4, 4]; intrinsics: [V, 3, 3]; near_fars: [V, 2].
        flow/mask: optional [H, W, 2] / [H, W] target-frame optical-flow gt.
    """
    V, H, W, _ = images.shape
    inv_scale = jnp.array([W - 1, H - 1], jnp.float32)

    rays_o, rays_d = geometry.get_rays(xs, ys, intrinsics[-1], c2ws[-1])
    color = _gather_pixels(images[-1], xs, ys)
    depth_gt = _gather_pixels(depths, xs, ys)

    flow_fwd_gt = flow_bwd_gt = mask_fwd_gt = mask_bwd_gt = None
    if flow_fwd is not None:
        flow_fwd_gt = _gather_pixels(flow_fwd, xs, ys)
        flow_bwd_gt = _gather_pixels(flow_bwd, xs, ys)
        mask_fwd_gt = _gather_pixels(mask_fwd, xs, ys)
        mask_bwd_gt = _gather_pixels(mask_bwd, xs, ys)

    near_t, far_t = near_fars[-1, 0], near_fars[-1, 1]
    z_vals, t_vals = depth_candidates(rng, near_t, far_t, xs.shape[0], n_samples,
                                      stratified)

    pts = geometry.points_along_rays(rays_o, rays_d, z_vals)
    ndc = geometry.world_to_ndc(pts, w2cs[0], intrinsics[0], inv_scale,
                                near=near_fars[0, 0], far=near_fars[0, 1], pad=pad)

    return RayBatch(pts=pts, ndc=ndc, z_vals=z_vals, rays_d=rays_d, color_gt=color,
                    depth_gt=depth_gt, t_vals=t_vals, flow_fwd_gt=flow_fwd_gt,
                    flow_bwd_gt=flow_bwd_gt, mask_fwd_gt=mask_fwd_gt,
                    mask_bwd_gt=mask_bwd_gt)
