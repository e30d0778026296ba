"""Full loss suite — pure functions of the render dict + batch.

Mirrors ``/root/reference/losses.py`` (regularizers, masked errors, scene-flow
smoothness) and the scene-flow loss bundle assembled in ``train.py:346-585``
(``train_sf_step``). Every term is a pure jnp function; step-dependent gating uses
traced ops (``jnp.where``) so one compiled train step covers all phases except the
shape-changing ones (extra motion samples, chain_5frames — python-level flags).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import geometry


# ---------------------------------------------------------------------------
# generic regularizers (losses.py:20-116)
# ---------------------------------------------------------------------------

def get_disparity_smoothness(disp, img):
    """Image-gradient-weighted disparity smoothness (losses.py:28-45).

    Args: disp [N, H, W, 1]; img [N, H, W, 3].
    """
    def gx(t):
        return t[:, :, :-1, :] - t[:, :, 1:, :]

    def gy(t):
        return t[:, :-1, :, :] - t[:, 1:, :, :]

    wx = jnp.exp(-jnp.mean(jnp.abs(gx(img)), 3, keepdims=True))
    wy = jnp.exp(-jnp.mean(jnp.abs(gy(img)), 3, keepdims=True))
    return jnp.mean(jnp.abs(gx(disp)) * wx) + jnp.mean(jnp.abs(gy(disp)) * wy)


def total_variation_loss(image):
    """TV on [N, H, W] patches (losses.py:47-51)."""
    return (jnp.mean(jnp.abs(image[:, :, :-1] - image[:, :, 1:]))
            + jnp.mean(jnp.abs(image[:, :-1, :] - image[:, 1:, :])))


def distortion_loss(ray_weights, t_vals):
    """Mip-NeRF-360 interval distortion (losses.py:53-87).

    Exact O(S) reformulation of the reference's O(S²) pairwise sum (the t_mids
    are sorted, so Σ_{i,j} w_i w_j |m_i − m_j| telescopes into prefix sums):
        Σ_{i,j} w_i w_j |m_i − m_j| = 2 Σ_i w_i (m_i A_{i-1} − B_{i-1})
    with A_i = Σ_{k≤i} w_k, B_i = Σ_{k≤i} w_k m_k. Verified against the naive
    double loop in tests/test_losses.py.

    Args: ray_weights [R, S]; t_vals [S] (normalized sample positions).
    """
    w = ray_weights[..., :-1]
    t_mids = 0.5 * (t_vals[..., :-1] + t_vals[..., 1:])
    A = jnp.cumsum(w, axis=-1)
    B = jnp.cumsum(w * t_mids, axis=-1)
    A_prev = A - w
    B_prev = B - w * t_mids
    pairwise = 2.0 * jnp.sum(w * (t_mids * A_prev - B_prev), axis=-1)
    weighted = 0.5 * pairwise
    t_dists = t_vals[..., 1:] - t_vals[..., :-1]
    individual = (1.0 / 3.0) * jnp.sum(ray_weights[..., :-1] ** 2 * t_dists,
                                       axis=-1)
    return jnp.sum(weighted + individual)


def mse_masked(pred, gt, mask):
    """Masked MSE normalized by mask count (losses.py:89-101). mask broadcasts over
    the last axis of pred."""
    reps = pred.shape[-1] // mask.shape[-1]
    mask_rep = jnp.repeat(mask, reps, axis=-1)
    num = jnp.sum(mask_rep) + 1e-8
    return jnp.sum(((pred - gt) ** 2) * mask_rep) / num


def mae_masked(pred, gt, mask):
    """Masked MAE normalized by mask count (losses.py:103-116)."""
    reps = pred.shape[-1] // mask.shape[-1]
    mask_rep = jnp.repeat(mask, reps, axis=-1)
    num = jnp.sum(mask_rep) + 1e-8
    return jnp.sum(jnp.abs(pred - gt) * mask_rep) / num


def compute_depth_loss(pred_depth, gt_depth):
    """Scale/shift-invariant depth prior: median/MAD whitening then MSE
    (losses.py:118-140)."""
    t_pred = jnp.median(pred_depth)
    s_pred = jnp.mean(jnp.abs(pred_depth - t_pred))
    t_gt = jnp.median(gt_depth)
    s_gt = jnp.mean(jnp.abs(gt_depth - t_gt))
    # the reference divides unguarded; the epsilon only matters when a depth map is
    # exactly constant (zero-weight init), where the reference would NaN-poison
    pred_n = (pred_depth - t_pred) / (s_pred + 1e-8)
    gt_n = (gt_depth - t_gt) / (s_gt + 1e-8)
    return jnp.mean((pred_n - gt_n) ** 2)


def compute_sf_smooth_loss(pts_1_ndc, pts_2_ndc, H, W, f):
    """Scene-flow spatial smoothness in Euclidean space, dropping the farthest 5% of
    samples (losses.py:142-160)."""
    n = pts_1_ndc.shape[-2]
    k = int(n * 0.95)
    p1 = geometry.ndc_to_euclidean(pts_1_ndc[..., :k, :], H, W, f)
    p2 = geometry.ndc_to_euclidean(pts_2_ndc[..., :k, :], H, W, f)
    sf = p1 - p2
    return jnp.mean(jnp.abs(sf[..., :-1, :] - sf[..., 1:, :]))


def compute_sf_lke_loss(pts_ref_ndc, pts_post_ndc, pts_prev_ndc, H, W, f):
    """Least-kinetic-energy temporal smoothness, dropping the farthest 10%
    (losses.py:163-203)."""
    n = pts_ref_ndc.shape[-2]
    k = int(n * 0.9)
    p_ref = geometry.ndc_to_euclidean(pts_ref_ndc[..., :k, :], H, W, f)
    p_post = geometry.ndc_to_euclidean(pts_post_ndc[..., :k, :], H, W, f)
    p_prev = geometry.ndc_to_euclidean(pts_prev_ndc[..., :k, :], H, W, f)
    sf_fwd = p_post - p_ref
    sf_bwd = p_ref - p_prev
    return 0.5 * jnp.mean((sf_fwd - sf_bwd) ** 2)


def entropy_loss_fn(raw_blend_w):
    """Blend-weight entropy: −w log(w + 1e-8) (train.py:514-521)."""
    return jnp.mean(-raw_blend_w * jnp.log(raw_blend_w + 1e-8))


# ---------------------------------------------------------------------------
# scene-flow loss bundle (train.py:346-585)
# ---------------------------------------------------------------------------

def sceneflow_losses(cfg, results: dict, rays, *, step, frame_t, total_frames,
                     H, W, focal, fnb_w2cs, chain_bwd, chain_5frames: bool):
    """The 9-term NSFF loss bundle of ``train_sf_step``.

    Args:
        cfg: ZestConfig (lambdas + decay_iteration).
        results: render dict from ``render.render_rays`` (training mode).
        rays: sampling.RayBatch (gt color/depth/flow/mask).
        step: traced global step; frame_t / total_frames: traced scalars.
        fnb_w2cs: [2, 4, 4] w2c of the t−1 / t+1 neighbour cameras.
        chain_bwd: traced bool; chain_5frames: python bool (changes compute graph).
    Returns: (total_loss, metrics dict)
    """
    decay_it = cfg.decay_iteration_clamped
    rgb_gt = rays.color_gt
    logs = {}

    rgb_map_ref = results["rgb_map_ref"]
    rgb_map_ref_dy = results["rgb_map_ref_dy"]
    rgb_map_post_dy = results["rgb_map_post_dy"]
    rgb_map_prev_dy = results["rgb_map_prev_dy"]
    prob_map_post = results["prob_map_post"][..., None]
    prob_map_prev = results["prob_map_prev"][..., None]
    weights_map_dd = jax.lax.stop_gradient(results["weights_map_dd"][..., None])

    # --- temporal photometric consistency (train.py:396-423) ---
    init_phase = step <= decay_it * 1000
    pho_init = (jnp.mean((rgb_map_ref_dy - rgb_gt) ** 2)
                + mse_masked(rgb_map_post_dy, rgb_gt, prob_map_post)
                + mse_masked(rgb_map_prev_dy, rgb_gt, prob_map_prev))
    pho_late = (mse_masked(rgb_map_ref_dy, rgb_gt, weights_map_dd)
                + mse_masked(rgb_map_post_dy, rgb_gt, prob_map_post * weights_map_dd)
                + mse_masked(rgb_map_prev_dy, rgb_gt, prob_map_prev * weights_map_dd))
    pho_loss = jnp.where(init_phase, pho_init, pho_late)
    if chain_5frames:
        pho_loss = pho_loss + mse_masked(results["rgb_map_pp_dy"], rgb_gt,
                                         weights_map_dd)
    logs["pho_loss"] = pho_loss

    # --- disocclusion-weight L1 regularisation (train.py:426-434) ---
    prob_reg_loss = (jnp.mean(jnp.abs(results["raw_prob_ref2prev"]))
                     + jnp.mean(jnp.abs(results["raw_prob_ref2post"])))
    logs["prob_reg_loss"] = cfg.lambda_prob_reg * prob_reg_loss

    # --- combined (blended) render loss (train.py:436-441) ---
    combined_loss = jnp.mean((rgb_map_ref - rgb_gt) ** 2)
    logs["combined_loss"] = combined_loss

    # --- scene-flow cycle consistency (train.py:445-458) ---
    weight_post = (1.0 - results["raw_prob_ref2post"])[..., None]
    weight_prev = (1.0 - results["raw_prob_ref2prev"])[..., None]
    sf_cycle_loss = (mse_masked(results["raw_sf_ref2post"],
                                -results["raw_sf_post2ref"], weight_post)
                     + mse_masked(results["raw_sf_ref2prev"],
                                  -results["raw_sf_prev2ref"], weight_prev))
    logs["sf_cycle_loss"] = cfg.lambda_cyc * sf_cycle_loss

    # --- rendered scene-flow minimality (train.py:465-472) ---
    # NOTE: the reference sums weights·sf over the LAST axis (the xyz axis, not the
    # sample axis) — reproduced faithfully.
    w_dy = results["weights_ref_dy"][..., None]
    render_sf_prev = jnp.sum(w_dy * results["raw_sf_ref2prev"], -1)
    render_sf_post = jnp.sum(w_dy * results["raw_sf_ref2post"], -1)
    sf_min_loss = jnp.mean(jnp.abs(render_sf_prev)) + jnp.mean(jnp.abs(render_sf_post))
    logs["sf_min_loss"] = cfg.lambda_sf_reg * sf_min_loss

    # --- spatial smoothness (train.py:478-486) ---
    sf_sp_loss = (compute_sf_smooth_loss(results["raw_pts_ref"],
                                         results["raw_pts_post"], H, W, focal)
                  + compute_sf_smooth_loss(results["raw_pts_ref"],
                                           results["raw_pts_prev"], H, W, focal))
    logs["sf_sp_loss"] = cfg.lambda_sf_smooth * sf_sp_loss

    # --- temporal smoothness / least kinetic energy (train.py:489-511) ---
    sf_st_base = compute_sf_lke_loss(results["raw_pts_ref"], results["raw_pts_post"],
                                     results["raw_pts_prev"], H, W, focal)
    sf_st_bwd = compute_sf_lke_loss(results["raw_pts_prev"], results["raw_pts_ref"],
                                    results["raw_pts_pp"], H, W, focal)
    sf_st_fwd = compute_sf_lke_loss(results["raw_pts_post"], results["raw_pts_pp"],
                                    results["raw_pts_ref"], H, W, focal)
    sf_st_loss = sf_st_base + jnp.where(chain_bwd, sf_st_bwd, sf_st_fwd)
    logs["sf_st_loss"] = cfg.lambda_sf_smooth * sf_st_loss

    # --- blend-weight entropy (train.py:514-521) ---
    entropy_loss = entropy_loss_fn(results["raw_blend_w"])
    logs["entropy_loss"] = cfg.lambda_blending_reg * entropy_loss

    # --- data-driven priors, decayed (train.py:525-530) ---
    divisor = step // (decay_it * 1000)
    decay = 10.0 ** divisor.astype(jnp.float32)
    w_of = cfg.lambda_optical_flow / decay
    w_depth = cfg.lambda_sf_depth / decay

    # --- geometric consistency vs optical flow (train.py:532-562) ---
    render_of_fwd = geometry.projection_from_ndc(fnb_w2cs[1], H, W, focal,
                                                 results["weights_ref_dy"],
                                                 results["raw_pts_post"])
    render_of_bwd = geometry.projection_from_ndc(fnb_w2cs[0], H, W, focal,
                                                 results["weights_ref_dy"],
                                                 results["raw_pts_prev"])
    fwd_term = mae_masked(render_of_fwd, rays.flow_fwd_gt, rays.mask_fwd_gt[..., None])
    bwd_term = mae_masked(render_of_bwd, rays.flow_bwd_gt, rays.mask_bwd_gt[..., None])
    flow_loss = jnp.where(frame_t == 0, fwd_term,
                          jnp.where(frame_t == total_frames - 1, bwd_term,
                                    fwd_term + bwd_term))
    logs["flow_loss"] = w_of * flow_loss

    # --- single-view depth prior (train.py:565-571) ---
    sf_depth_loss = compute_depth_loss(results["depth_map_ref_dy"], -rays.depth_gt)
    logs["sf_depth_loss"] = w_depth * sf_depth_loss

    total = (pho_loss + combined_loss
             + cfg.lambda_cyc * sf_cycle_loss
             + cfg.lambda_prob_reg * prob_reg_loss
             + cfg.lambda_sf_reg * sf_min_loss
             + cfg.lambda_sf_smooth * sf_sp_loss
             + cfg.lambda_sf_smooth * sf_st_loss
             + cfg.lambda_blending_reg * entropy_loss
             + w_of * flow_loss
             + w_depth * sf_depth_loss)
    return total, logs
