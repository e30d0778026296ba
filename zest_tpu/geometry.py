"""Camera / ray / NDC geometry — pure jnp, fully vmappable, static shapes.

Functional equivalents of the reference's tensor geometry helpers
(``/root/reference/utils.py:133-539``), re-derived for JAX: no in-place mutation,
no data-dependent shapes, batch dims expressed with vmap-friendly layouts.

Convention: this framework drops the dummy image-batch dim (N==1 everywhere in the
reference); rays are ``[R, 3]``, ray point samples ``[R, S, 3]``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST  # camera math must not round through bf16


def pixel_dirs_cam(xs: jnp.ndarray, ys: jnp.ndarray, intrinsic: jnp.ndarray) -> jnp.ndarray:
    """Homogeneous camera-space direction for pixel coords.

    Mirrors utils.py:215-217: dirs = [(x-cx)/fx, (y-cy)/fy, 1].

    Args:
        xs, ys: [R] pixel coordinates (float).
        intrinsic: [3, 3].
    Returns: [R, 3]
    """
    fx, fy = intrinsic[0, 0], intrinsic[1, 1]
    cx, cy = intrinsic[0, 2], intrinsic[1, 2]
    return jnp.stack([(xs - cx) / fx, (ys - cy) / fy, jnp.ones_like(xs)], axis=-1)


def get_rays(xs, ys, intrinsic, c2w):
    """World-space ray origin/directions for pixel coords of one camera.

    Mirrors utils.py:214-223 (get_rays_mvs tail): rays_d = dirs @ R_c2w^T (unnormalized),
    rays_o = camera center.

    Returns:
        rays_o: [3]
        rays_d: [R, 3] (NOT normalized — reference keeps |d| as cos_angle factor)
    """
    dirs = pixel_dirs_cam(xs, ys, intrinsic)
    rays_d = jnp.matmul(dirs, c2w[:3, :3].T, precision=_HI)
    rays_o = c2w[:3, -1]
    return rays_o, rays_d


def points_along_rays(rays_o, rays_d, z_vals):
    """[R,S,3] = o + z * d. Mirrors utils.py:379."""
    return rays_o[None, None, :] + z_vals[..., None] * rays_d[:, None, :]


def world_to_ndc(points, w2c_ref, intrinsic_ref, inv_scale, near, far, pad: int = 0,
                 lindisp: bool = False):
    """World points → reference-view NDC in [0,1]^3, with pad correction.

    Mirrors utils.py:232-288 (get_ndc_coordinate), projection branch:
      1. world → ref camera: x_c = R x + T
      2. pixel projection: p = K x_c; xy = (p.xy / p.z) / (W-1, H-1)
      3. z normalized to [0,1] by (z - near)/(far - near)  (or inverse-depth if lindisp)
      4. pad>0: xy rescaled for the enlarged (H/4+2p, W/4+2p) feature volume
         (utils.py:280-283; feature space is input resolution / 4).

    Args:
        points: [..., 3] world coordinates.
        w2c_ref: [4, 4] (or [3,4]); None skips the transform.
        intrinsic_ref: [3, 3].
        inv_scale: [2] = (W-1, H-1).
    Returns: [..., 3] NDC coordinates.
    """
    if w2c_ref is not None:
        R = w2c_ref[:3, :3]
        T = w2c_ref[:3, 3]
        points = jnp.matmul(points, R.T, precision=_HI) + T

    pix = jnp.matmul(points, intrinsic_ref.T, precision=_HI)
    xy = (pix[..., :2] / pix[..., 2:3]) / inv_scale
    if not lindisp:
        z = (pix[..., 2] - near) / (far - near)
    else:
        z = (1.0 / pix[..., 2] - 1.0 / near) / (1.0 / far - 1.0 / near)
    ndc = jnp.concatenate([xy, z[..., None]], axis=-1)

    if pad > 0:
        # inv_scale is (W-1, H-1); feature map dims are (W_feat, H_feat) = (inv+1)/4
        wh_feat = (inv_scale + 1.0) / 4.0
        scale = wh_feat / (wh_feat + pad * 2)
        shift = pad / (wh_feat + pad * 2)
        ndc = jnp.concatenate([ndc[..., :2] * scale + shift, ndc[..., 2:]], axis=-1)
    return ndc


def ndc_to_world(ndc, w2c_ref, intrinsic_ref, inv_scale, near, far, pad: int = 0):
    """Exact inverse of :func:`world_to_ndc` (projection branch, lindisp=False).

    Used to place encoding-volume voxel centers back in world space for the
    ``--use_color_volume`` precompute (reference opt.py:50, renderer.py:63-69).

    Args:
        ndc: [..., 3] NDC coordinates in [0, 1]^3 (pad-corrected like world_to_ndc).
        w2c_ref: [4, 4]; None skips the camera transform.
        intrinsic_ref: [3, 3]; inv_scale: [2] = (W-1, H-1).
    Returns: [..., 3] world points.
    """
    xy = ndc[..., :2]
    if pad > 0:
        wh_feat = (inv_scale + 1.0) / 4.0
        scale = wh_feat / (wh_feat + pad * 2)
        shift = pad / (wh_feat + pad * 2)
        xy = (xy - shift) / scale
    z_cam = ndc[..., 2] * (far - near) + near
    pix = xy * inv_scale
    homog = jnp.concatenate([pix, jnp.ones_like(z_cam)[..., None]], -1) \
        * z_cam[..., None]
    points = jnp.matmul(homog, jnp.linalg.inv(intrinsic_ref).T, precision=_HI)
    if w2c_ref is not None:
        R = w2c_ref[:3, :3]
        T = w2c_ref[:3, 3]
        points = jnp.matmul(points - T, R, precision=_HI)  # R^T (x_c − T)
    return points


def world_to_bbox_ndc(points, near_xyz, far_xyz):
    """Bounding-box normalization branch of get_ndc_coordinate (utils.py:274-277)."""
    return (points - near_xyz) / (far_xyz - near_xyz)


def ndc_to_euclidean(xyz_ndc, H: float, W: float, f: float):
    """NDC → Euclidean (OpenGL-style forward-facing NDC). Mirrors utils.py:507-514.

    z_e = 2 / (clamp(z_ndc, -1, 0.99) - 1)
    x_e = -x_ndc * z_e * W / (2 f);  y_e = -y_ndc * z_e * H / (2 f)
    """
    z_e = 2.0 / (jnp.clip(xyz_ndc[..., 2:3], -1.0, 0.99) - 1.0)
    x_e = -xyz_ndc[..., 0:1] * z_e * W / (2.0 * f)
    y_e = -xyz_ndc[..., 1:2] * z_e * H / (2.0 * f)
    return jnp.concatenate([x_e, y_e, z_e], axis=-1)


def se3_transform_points(pts, R, T):
    """pts' = R pts + T. Mirrors utils.py:516-518.

    Args: pts [..., 3]; R [..., 3, 3]; T [..., 3, 1].
    """
    return jnp.squeeze(jnp.matmul(R, pts[..., :3, None], precision=_HI) + T, -1)


def perspective_projection(pts_3d, h: float, w: float, f: float):
    """Project camera-space points to pixels (COLMAP/OpenCV convention applied to
    OpenGL-format input — reproduces the sign quirk at utils.py:520-525)."""
    x = pts_3d[..., 0:1] * f / -pts_3d[..., 2:3] + w / 2.0
    y = -pts_3d[..., 1:2] * f / -pts_3d[..., 2:3] + h / 2.0
    return jnp.concatenate([x, y], axis=-1)


def projection_from_ndc(w2c, H: float, W: float, f: float, weights_ref, raw_pts):
    """Render expected 3D point per ray, reproject into a neighbour camera.

    Mirrors utils.py:527-539: the optical-flow reprojection used by the geometric
    consistency loss (train.py:539-544).

    Args:
        w2c: [4, 4] neighbour world-to-camera.
        weights_ref: [R, S] compositing weights.
        raw_pts: [R, S, 3] NDC points at the neighbour time.
    Returns: [R, 2] projected pixel coords.
    """
    R_w2c = w2c[..., :3, :3]
    t_w2c = w2c[..., :3, 3:]
    pts_3d = jnp.sum(weights_ref[..., None] * raw_pts, axis=-2)  # [R, 3]
    pts_world = ndc_to_euclidean(pts_3d, H, W, f)
    pts_local = se3_transform_points(pts_world, R_w2c, t_w2c)
    return perspective_projection(pts_local, H, W, f)


def depth2dist(z_vals, cos_angle):
    """Distances between adjacent samples; last = 1e10. Mirrors renderer.py:74-89.

    Args: z_vals [R, S]; cos_angle [R, 1] (|rays_d|).
    Returns: [R, S]
    """
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate([dists, jnp.full_like(dists[..., :1], 1e10)], axis=-1)
    return dists * cos_angle


def normalize_frame_idx(frame_t, num_frames):
    """Normalized frame index in [-1, 1]. Mirrors networks.py:486."""
    return frame_t / num_frames * 2.0 - 1.0
