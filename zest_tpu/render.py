"""Volume-rendering core: two-field (static + dynamic scene-flow) NeRF compositing.

TPU-first re-design of the reference renderer (``/root/reference/renderer.py``): the whole
batch of rays is rendered in ONE traced computation — no chunk/netchunk python loops (the
reference's memory chunking, renderer.py:221-242, is unnecessary under XLA; full-image
eval instead maps fixed-size chunks with ``lax.map`` at the system level). The t−1/t+1
dynamic re-renderings are batched into a single MLP evaluation over a stacked ray axis.

All functions are pure; model evaluation is injected as callables
``fn(pts_embed, feats, views_embed) -> raw`` closing over params.

Conventions: rays [R, ...], samples S on axis -1 of z-shaped arrays. The reference's
leading N==1 image-batch dim is dropped throughout.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from . import geometry
from .models.embedding import positional_encoding
from .ops.grid_sample import grid_sample_2d, grid_sample_3d


# ---------------------------------------------------------------------------
# compositing primitives
# ---------------------------------------------------------------------------

def raw2alpha(sigma, dists):
    """α = 1 − exp(−σ·δ); weights via exclusive transmittance cumprod.

    Mirrors renderer.py:91-113 including the 1e-10 epsilon.
    Args: sigma, dists [R, S].
    Returns: (alpha [R, S], weights [R, S])
    """
    alpha = 1.0 - jnp.exp(-sigma * dists)
    T = jnp.cumprod(jnp.concatenate([jnp.ones_like(alpha[..., :1]),
                                     1.0 - alpha + 1e-10], -1), -1)[..., :-1]
    return alpha, alpha * T


def raw2outputs(raw, z_vals, dists, white_bkgd: bool = False,
                raw_noise_std: float = 0.0, rng=None):
    """Raw field outputs → rgb/disp/acc/weights/depth maps (renderer.py:115-164).

    Args:
        raw: [R, S, 4]; z_vals, dists: [R, S].
    Returns: (rgb_map [R,3], disp_map [R], acc_map [R], weights [R,S],
              depth_map [R], alpha [R,S])
    """
    rgb = jax.nn.sigmoid(raw[..., :3])
    sigma = raw[..., 3]
    if raw_noise_std > 0.0 and rng is not None:
        sigma = sigma + jax.random.normal(rng, sigma.shape) * raw_noise_std
    opacity = jax.nn.relu(sigma)
    alpha, weights = raw2alpha(opacity, dists)

    rgb_map = jnp.sum(weights[..., None] * rgb, -2)
    depth_map = jnp.sum(weights * z_vals, -1)
    disp_map = 1.0 / jnp.maximum(1e-10, depth_map / jnp.sum(weights, -1))
    acc_map = jnp.sum(weights, -1)
    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])
    return rgb_map, disp_map, acc_map, weights, depth_map, alpha


def raw2outputs_blending(raw_dy, raw_rigid, raw_blend_w, z_vals, dists,
                         raw_noise_std: float = 0.0, rng=None):
    """NSFF two-field compositing with predicted blending weights.

    Mirrors renderer.py:166-219: joint transmittance Ts = Π(1−α_dy)(1−α_rig), blended
    rgb/depth plus dynamic-only (fg) maps.

    Args: raw_dy/raw_rigid [R, S, 4]; raw_blend_w [R, S]; z_vals/dists [R, S].
    Returns: (rgb_map, depth_map, rgb_map_fg, depth_map_fg, weights_fg, weights_dy)
    """
    rgb_dy = jax.nn.sigmoid(raw_dy[..., :3])
    rgb_rigid = jax.nn.sigmoid(raw_rigid[..., :3])

    noise = 0.0
    if raw_noise_std > 0.0 and rng is not None:
        noise = jax.random.normal(rng, raw_dy[..., 3].shape) * raw_noise_std
    opacity_dy = jax.nn.relu(raw_dy[..., 3] + noise)
    opacity_rigid = jax.nn.relu(raw_rigid[..., 3] + noise)

    alpha_dy = (1.0 - jnp.exp(-opacity_dy * dists)) * raw_blend_w
    alpha_rig = (1.0 - jnp.exp(-opacity_rigid * dists)) * (1.0 - raw_blend_w)

    Ts = jnp.cumprod(jnp.concatenate(
        [jnp.ones_like(alpha_dy[..., :1]),
         (1.0 - alpha_dy) * (1.0 - alpha_rig) + 1e-10], -1), -1)[..., :-1]

    weights_dy = Ts * alpha_dy
    weights_rig = Ts * alpha_rig

    rgb_map = jnp.sum(weights_dy[..., None] * rgb_dy
                      + weights_rig[..., None] * rgb_rigid, -2)
    weights_mix = weights_dy + weights_rig
    depth_map = jnp.sum(weights_mix * z_vals, -1)

    # dynamic-only (foreground) render
    alpha_fg = 1.0 - jnp.exp(-opacity_dy * dists)
    T_fg = jnp.cumprod(jnp.concatenate([jnp.ones_like(alpha_fg[..., :1]),
                                        1.0 - alpha_fg + 1e-10], -1), -1)[..., :-1]
    weights_fg = alpha_fg * T_fg
    depth_map_fg = jnp.sum(weights_fg * z_vals, -1)
    rgb_map_fg = jnp.sum(weights_fg[..., None] * rgb_dy, -2)

    return rgb_map, depth_map, rgb_map_fg, depth_map_fg, weights_fg, weights_dy


def compute_2d_prob(weights_p_mix, raw_prob_ref2p):
    """Σ_s w·(1−prob) per ray, weights detached (renderer.py:22-32)."""
    return jnp.sum(jax.lax.stop_gradient(weights_p_mix) * (1.0 - raw_prob_ref2p), -1)


# ---------------------------------------------------------------------------
# conditioning-feature assembly
# ---------------------------------------------------------------------------

def gen_dir_feature(w2c_ref, dirs_unit):
    """View dirs rotated into the reference camera (renderer.py:34-49)."""
    return jnp.matmul(dirs_unit, w2c_ref[:3, :3].T,
                      precision=jax.lax.Precision.HIGHEST)


def sample_volume_features(volume, ndc):
    """Trilinear lookup of the encoding volume at NDC points (utils.py:433-459).

    Args: volume [D, Hv, Wv, 8]; ndc [R, S, 3] in [0, 1].
    Returns: [R, S, 8]
    """
    return grid_sample_3d(volume, ndc * 2.0 - 1.0, padding_mode="zeros")


def build_color_features(pts_world, images, w2cs, intrinsics,
                         with_mask: bool = True, approx: bool = False,
                         order: str = "s_major", band: int = 16,
                         group: int = 1):
    """Per-source-view RGB (+ in-bounds mask) sampled at ray points.

    Mirrors utils.py:461-505 (build_color_volume): project points into each source view
    (no pad), bilinear-sample the *unnormalized* image with border padding, append the
    strict in-bounds mask. ``approx`` gathers the images in bf16 (halved gather
    traffic; the consuming field conditioning is bf16 under --precision 16).

    ``order`` picks the point layout seen by the y-banded gather kernel
    (kernels/color_gather.py) — a pure reordering, identical results:
      - "s_major": 128 consecutive points = 128 rays at one depth sample. The
        band holds for EVAL's contiguous-pixel batches (few image rows) but
        never for training's random pixels.
      - "r_major": 128 consecutive points = ONE ray's S=128 depth samples,
        whose source-view projections span only the epipolar drift (tens of
        rows) REGARDLESS of which pixels were sampled — the kernel engages at
        train with a wider ``band``, with no change to the sampling
        distribution. Requires S == 128 for aligned chunks (runtime ok-check
        falls back otherwise, so this is purely a fast path).

    Args:
        pts_world: [R, S, 3]; images [V, H, W, 3]; w2cs [V,4,4]; intrinsics [V,3,3].
    Returns: [R, S, V*(3+mask)]
    """
    V, H, W, _ = images.shape
    inv_scale = jnp.array([W - 1, H - 1], jnp.float32)
    R, S, _ = pts_world.shape

    def per_view(img, w2c, intr):
        ndc = geometry.world_to_ndc(pts_world, w2c, intr, inv_scale,
                                    near=2.0, far=6.0, pad=0)
        grid = ndc[..., :2] * 2.0 - 1.0
        from .kernels.color_gather import gather_colors_banded
        xy_rs = ndc[..., :2] * inv_scale
        if order == "r_major":
            xy = xy_rs.reshape(-1, 2)
            data = gather_colors_banded(img, xy, band=band, approx=approx,
                                        group=group)
            data = data.reshape(R, S, 3)
        else:
            xy = xy_rs.transpose(1, 0, 2).reshape(-1, 2)
            data = gather_colors_banded(img, xy, band=band, approx=approx,
                                        group=group)
            data = data.reshape(S, R, 3).transpose(1, 0, 2)
        if with_mask:
            inside = (grid > -1.0) & (grid < 1.0)
            mask = (inside[..., 0] & inside[..., 1]).astype(data.dtype)
            data = jnp.concatenate([data, mask[..., None]], -1)
        return data

    # python loop, NOT vmap: vmapping the runtime-banded gather would batch its
    # lax.cond into a select that executes BOTH branches every call
    feats = jnp.stack([per_view(images[v], w2cs[v], intrinsics[v])
                       for v in range(V)])                # [V, R, S, C]
    Vv, R, S, C = feats.shape
    return jnp.moveaxis(feats, 0, 2).reshape(R, S, Vv * C)


def append_color_volume(volume, images, w2cs, intrinsics, near_far, inv_scale,
                        pad: int = 0):
    """Precompute per-view RGB+mask at every voxel center (``--use_color_volume``).

    Reference semantics (opt.py:50, renderer.py:63-69, upstream-MVSNeRF lineage):
    when the flag is set, per-point conditioning is ONE trilinear gather of a
    volume that already carries the color channels, instead of re-projecting every
    ray point into every source view. TPU-friendly: turns R·S·V image gathers per
    step into a single per-image precompute + one volume gather.

    Args:
        volume: [D, Hv, Wv, 8] encoding volume.
        images: [V, H, W, 3] unnormalized source images.
        w2cs/intrinsics: [V+1, ...] pose stack whose entry 0 is the NDC reference
            view (only [0] and the first V entries are used).
        near_far: [2] of the reference view; inv_scale: [2] = (W-1, H-1).
    Returns: [D, Hv, Wv, 8 + V*4]
    """
    D, Hv, Wv, _ = volume.shape
    zs = jnp.linspace(0.0, 1.0, D)
    ys = jnp.linspace(0.0, 1.0, Hv)
    xs = jnp.linspace(0.0, 1.0, Wv)
    gz, gy, gx = jnp.meshgrid(zs, ys, xs, indexing="ij")
    ndc = jnp.stack([gx, gy, gz], -1)                       # [D, Hv, Wv, 3]
    pts_world = geometry.ndc_to_world(ndc, w2cs[0], intrinsics[0], inv_scale,
                                      near=near_far[0], far=near_far[1], pad=pad)
    V = images.shape[0]
    # r-major chunking: consecutive points walk one (d, y) voxel row, whose
    # projections stay within ~2 image rows — the banded gather kernel engages
    # (s-major would interleave all y's per chunk and always fall back)
    colors = build_color_features(pts_world.reshape(D * Hv, Wv, 3), images,
                                  w2cs[:V], intrinsics[:V], order="r_major")
    colors = colors.reshape(D, Hv, Wv, V * 4).astype(volume.dtype)
    return jnp.concatenate([volume, colors], -1)


# ---------------------------------------------------------------------------
# full two-field scene-flow rendering
# ---------------------------------------------------------------------------

class RenderModels(NamedTuple):
    """Injected field evaluators + conditioning-feature callables.

    The dynamic conditioning is split into a volume part (a function of the
    *warped* NDC points) and a color part (a function of the UNWARPED world
    points only, utils.py:461-505) — so render_rays computes the color features
    ONCE per ray batch and reuses them across the t, t±1 and chain passes
    instead of re-gathering identical values 3-4x."""
    static_fn: Callable                         # (pts_emb, feats, views) -> raw
    dynamic_fn: Optional[Callable] = None
    static_feats: Optional[Callable] = None      # (pts_world, ndc3) -> [R,S,F] | None
    dynamic_vol: Optional[Callable] = None       # (ndc3, banded) -> [R,S,8] | None
    dynamic_col: Optional[Callable] = None       # (pts_world) -> [R,S,V*4] | None
    multires: int = 10
    multires_views: int = 4


def _embed_dirs(rays_dir, cos_angle, w2c_ref, n_samples, multires_views):
    dirs = rays_dir / cos_angle
    if w2c_ref is not None:
        dirs = gen_dir_feature(w2c_ref, dirs)
    views = positional_encoding(dirs, multires_views)
    return jnp.broadcast_to(views[:, None, :], (views.shape[0], n_samples,
                                                views.shape[-1]))


def render_rays(models: RenderModels, rays, *, im_w2c_ref=None, nb_w2c_ref=None,
                scene_flow: bool = False, chain_bwd=False, chain_5frames: bool = False,
                ref_frame_idx=None, num_frames=None, time_codes=None,
                white_bkgd: bool = False, raw_noise_std: float = 0.0, rng=None,
                val: bool = False) -> dict:
    """Render one ray batch through the static field and (optionally) the dynamic
    scene-flow field with temporal re-rendering at t±1 (and t±2 chain points).

    Mirrors renderer.py:579-626 (``rendering``) + render_static/render_dynamic.

    Args:
        rays: sampling.RayBatch.
        im_w2c_ref: [4,4] reference-view w2c for the static view-dir feature.
        nb_w2c_ref: [4,4] reference w2c of the *neighbour* camera set (dynamic path).
        chain_bwd: traced bool — chain t−2 (True) or t+2 (False) this step.
        chain_5frames: python bool — run the extra MLP pass on chain points.
        ref_frame_idx: normalized frame index in [−1, 1]; num_frames: scalar.
        val: python bool — skip loss-only branches (renderer.py:444-445).
    Returns: dict with the reference's output keys.
    """
    R, S, _ = rays.pts.shape
    cos_angle = jnp.linalg.norm(rays.rays_d, axis=-1, keepdims=True)  # [R, 1]
    dists = geometry.depth2dist(rays.z_vals, cos_angle)

    k_static = k_dyn = k_prev = k_post = k_pp = None
    if rng is not None:
        k_static, k_dyn, k_prev, k_post, k_pp = jax.random.split(rng, 5)

    # ---------------- static field (renderer.py:322-373) ----------------
    pts_emb = positional_encoding(rays.ndc, models.multires)
    if time_codes is not None:
        tc = jax.nn.sigmoid(time_codes)
        tc = jnp.broadcast_to(tc[None, None, :], (R, S, tc.shape[-1]))
        pts_emb = jnp.concatenate([pts_emb, tc], -1)
    st_feats = models.static_feats(rays.pts, rays.ndc) if models.static_feats else None
    views_st = _embed_dirs(rays.rays_d, cos_angle, im_w2c_ref, S, models.multires_views)

    raw_static = models.static_fn(pts_emb, st_feats, views_st)
    raw_rgba = raw_static[..., :4]
    raw_blend_w = raw_static[..., 4] if scene_flow else None

    rgb_map, disp_map, acc_map, weights, depth_map, alpha = raw2outputs(
        raw_rgba, rays.z_vals, dists, white_bkgd, raw_noise_std, k_static)

    ret = {"rgb_map": rgb_map, "depth_map": depth_map, "raw_rgba": raw_rgba,
           "input_feat": st_feats, "weights": weights, "raw_blend_w": raw_blend_w,
           "alpha": alpha}

    if not scene_flow:
        return ret

    # ---------------- dynamic field @ t (renderer.py:409-453) ----------------
    views_dy = _embed_dirs(rays.rays_d, cos_angle, nb_w2c_ref, S, models.multires_views)

    # color features depend only on the UNWARPED world points → compute once,
    # reuse for the t, t±1 (2R stacked) and chain passes
    col_dy = models.dynamic_col(rays.pts) if models.dynamic_col else None

    def dyn_feats(ndc_xyz, banded):
        if models.dynamic_vol is None:
            return None
        vol = models.dynamic_vol(ndc_xyz, banded)
        n_rep = ndc_xyz.shape[0] // R
        col = col_dy if n_rep == 1 else jnp.concatenate([col_dy] * n_rep, 0)
        return jnp.concatenate([vol, col], -1)

    def eval_dynamic(ndc_xyz, frame_idx, key=None, banded=False):
        """One dynamic-field evaluation at (possibly warped) NDC points + time.

        ``banded=True`` only for UNWARPED points (z-banded volume-sampling
        kernel; warped points carry scene-flow gradients through ndc).
        """
        t_ch = jnp.full_like(ndc_xyz[..., :1], 1.0) * frame_idx
        xyzt = jnp.concatenate([ndc_xyz, t_ch], -1)
        emb = positional_encoding(xyzt, models.multires)
        feats = dyn_feats(ndc_xyz, banded)
        n_rep = ndc_xyz.shape[0] // R
        v = views_dy if n_rep == 1 else jnp.concatenate([views_dy] * n_rep, 0)
        return xyzt, models.dynamic_fn(emb, feats, v)

    raw_pts_ref, raw_ref_t = eval_dynamic(rays.ndc, ref_frame_idx, banded=True)
    raw_rgba_ref = raw_ref_t[..., :4]
    raw_sf_ref2prev = raw_ref_t[..., 4:7]
    raw_sf_ref2post = raw_ref_t[..., 7:10]
    raw_prob_ref2prev = raw_ref_t[..., 10]
    raw_prob_ref2post = raw_ref_t[..., 11]

    (rgb_map_ref, depth_map_ref, rgb_map_ref_dy, depth_map_ref_dy,
     weights_ref_dy, weights_ref_dd) = raw2outputs_blending(
        raw_rgba_ref, raw_rgba, raw_blend_w, rays.z_vals, dists, raw_noise_std, k_dyn)

    weights_map_dd = jax.lax.stop_gradient(jnp.sum(weights_ref_dd, -1))

    ret.update({"rgb_map_ref": rgb_map_ref, "depth_map_ref": depth_map_ref,
                "rgb_map_ref_dy": rgb_map_ref_dy, "depth_map_ref_dy": depth_map_ref_dy,
                "weights_map_dd": weights_map_dd})
    if val:
        return ret

    ret.update({"raw_sf_ref2prev": raw_sf_ref2prev, "raw_sf_ref2post": raw_sf_ref2post,
                "raw_pts_ref": raw_pts_ref[..., :3], "weights_ref_dy": weights_ref_dy,
                "raw_blend_w": raw_blend_w, "raw_prob_ref2prev": raw_prob_ref2prev,
                "raw_prob_ref2post": raw_prob_ref2post})

    # ------------- t−1 / t+1 re-render, batched in ONE MLP pass -------------
    # (renderer.py:455-507 runs these sequentially; points are independent, so we
    # stack them on the ray axis — one big MXU-friendly evaluation.)
    dt = 1.0 / num_frames * 2.0
    prev_frame_idx = ref_frame_idx - dt
    post_frame_idx = ref_frame_idx + dt
    prev_ndc = rays.ndc + raw_sf_ref2prev
    post_ndc = rays.ndc + raw_sf_ref2post

    stacked_ndc = jnp.concatenate([prev_ndc, post_ndc], 0)          # [2R, S, 3]
    t_prev = jnp.full((R, S, 1), 1.0) * prev_frame_idx
    t_post = jnp.full((R, S, 1), 1.0) * post_frame_idx
    xyzt_pp = jnp.concatenate([jnp.concatenate([prev_ndc, t_prev], -1),
                               jnp.concatenate([post_ndc, t_post], -1)], 0)
    emb_pp = positional_encoding(xyzt_pp, models.multires)
    feats_pp = dyn_feats(stacked_ndc, False)
    views2 = jnp.concatenate([views_dy, views_dy], 0)
    raw_both = models.dynamic_fn(emb_pp, feats_pp, views2)
    raw_prev, raw_post = raw_both[:R], raw_both[R:]

    raw_rgba_prev = raw_prev[..., :4]
    raw_sf_prev2prevprev = raw_prev[..., 4:7]
    raw_sf_prev2ref = raw_prev[..., 7:10]
    ret["raw_pts_prev"] = jnp.concatenate([prev_ndc, t_prev], -1)[..., :3]
    ret["raw_sf_prev2ref"] = raw_sf_prev2ref

    rgb_map_prev_dy, _, _, weights_prev_dy, _, _ = raw2outputs(
        raw_rgba_prev, rays.z_vals, dists, False, raw_noise_std, k_prev)
    ret["rgb_map_prev_dy"] = rgb_map_prev_dy

    raw_rgba_post = raw_post[..., :4]
    raw_sf_post2ref = raw_post[..., 4:7]
    raw_sf_post2postpost = raw_post[..., 7:10]
    ret["raw_pts_post"] = jnp.concatenate([post_ndc, t_post], -1)[..., :3]
    ret["raw_sf_post2ref"] = raw_sf_post2ref

    rgb_map_post_dy, _, _, weights_post_dy, _, _ = raw2outputs(
        raw_rgba_post, rays.z_vals, dists, False, raw_noise_std, k_post)
    ret["rgb_map_post_dy"] = rgb_map_post_dy

    ret["prob_map_prev"] = compute_2d_prob(weights_prev_dy, raw_prob_ref2prev)
    ret["prob_map_post"] = compute_2d_prob(weights_post_dy, raw_prob_ref2post)

    # ------------- t±2 chain (renderer.py:519-575) -------------
    # chain_bwd alternates every step (traced); select the warped chain points with
    # lax.cond so a single compiled step covers both phases.
    def bwd_branch(_):
        return prev_ndc + raw_sf_prev2prevprev, ref_frame_idx - 2.0 * dt

    def fwd_branch(_):
        return post_ndc + raw_sf_post2postpost, ref_frame_idx + 2.0 * dt

    pp_ndc, pp_frame_idx = jax.lax.cond(chain_bwd, bwd_branch, fwd_branch, None)
    ret["raw_pts_pp"] = pp_ndc

    if chain_5frames:
        _, raw_pp = eval_dynamic(pp_ndc, pp_frame_idx)
        rgb_map_pp_dy, _, _, _, _, _ = raw2outputs(
            raw_pp[..., :4], rays.z_vals, dists, False, raw_noise_std, k_pp)
        ret["rgb_map_pp_dy"] = rgb_map_pp_dy

    return ret
