"""MVS neural encoding volume: FeatureNet → plane-sweep cost volume → CostRegNet.

TPU-native re-design of the reference ``MVSNet`` (``/root/reference/networks.py:1061-1238``).
One fused jittable function: 2D features for all V views, differentiable homography warp
of each source view's features+RGB to D=128 fronto-parallel depth planes of the reference
view (view 0), variance aggregation masked by per-view in-bounds counts, then the 3D
U-Net regularizer.

Reference-behavior notes reproduced deliberately:
- The raw cost volume has 9 + 32 channels (networks.py:1100): 3 for the (unwarped,
  interior-placed) reference RGB and 3+3 for the first two warped source RGBs. Warped
  RGBs of sources beyond the first two are clobbered by the variance block in the
  reference (written at ``img_feat[:, -32:]`` *after* the loop) — so here they are simply
  never written. Views beyond the first two contribute through the variance only.
- D = 128 depth planes, linear in [near, far] (networks.py:1192-1200).
- Variance normalization divides by the per-voxel count of in-bounds views
  (networks.py:1135-1136), where warped features are zero outside the source image.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .feature_net import FeatureNet
from .cost_reg import CostRegNet
from ..ops.homography import homo_warp, identity_warp_cm, in_bounds_mask

N_DEPTH_PLANES = 128  # hardcoded in the reference (networks.py:1192)


def depth_plane_values(near, far, n_planes: int = N_DEPTH_PLANES, lindisp: bool = False):
    """Linear (or inverse-depth) depth candidates (networks.py:1193-1198)."""
    t = jnp.linspace(0.0, 1.0, n_planes)
    if lindisp:
        return 1.0 / (1.0 / near * (1.0 - t) + 1.0 / far * t)
    return near * (1.0 - t) + far * t


def build_cost_volume(imgs, feats, proj_mats, depth_values, pad: int = 0,
                      identity_src_warp: bool = False,
                      use_pallas_warp: bool = False, warp_band: int = 16,
                      warp_group: int = 1):
    """Variance-based plane-sweep cost volume.

    Args:
        imgs: [V, H, W, 3] ImageNet-normalized input views (full res).
        feats: [V, h, w, C] 2D CNN features (h = H/4).
        proj_mats: [V, 3, 4] src_proj @ ref_proj_inv in feature space (identity for
                   view 0).
        depth_values: [D].
        pad: reference-frustum padding (volume covers (h+2p, w+2p)).
    Returns:
        cost_vol: [D, h+2p, w+2p, 9 + C]

    In-bounds masks are NOT returned here: the reference's return_color mask
    story (networks.py:1204-1205) lives in the color-volume sampling path
    (ops/grid_sample.py / render.py gen_pts_feats) in this framework.
    """
    V, h, w, C = feats.shape
    D = depth_values.shape[0]
    hp, wp = h + 2 * pad, w + 2 * pad
    Px = hp * wp

    # CHANNEL-MAJOR pipeline [D, C, Px]: the variance chain is elementwise, so
    # layout is free to choose — channel-major keeps the minor dim a dense
    # multiple of 128 lanes (vs a 41-lane-padded channel minor that wastes 3x
    # of every tile) and lets the Pallas warp kernel emit its native block
    # layout with no per-view minor transpose. One transpose back to NHWC at
    # the end feeds the 3D U-Net.
    def cm(x_hwc):                     # [hp, wp, c] -> [c, Px]
        return jnp.moveaxis(x_hwc, -1, 0).reshape(x_hwc.shape[-1], Px)

    # --- reference view ---
    ref_feats = cm(jnp.pad(feats[0], ((pad, pad), (pad, pad), (0, 0))))
    ref_volume = jnp.broadcast_to(ref_feats[None], (D, C, Px))

    # images downsampled to feature resolution (align_corners=False bilinear,
    # networks.py:1101). antialias=False: torch F.interpolate(bilinear) does NOT
    # low-pass before downsampling — jax's default antialias=True diverged by
    # ~1.4 max abs on the RGB cost channels (caught by test_parity_oracle).
    imgs_small = jax.image.resize(imgs, (V, h, w, 3), method="linear",
                                  antialias=False)
    ref_img = cm(jnp.pad(imgs_small[0], ((pad, pad), (pad, pad), (0, 0))))
    ref_img = jnp.broadcast_to(ref_img[None], (D, 3, Px))

    volume_sum = ref_volume
    volume_sq_sum = ref_volume ** 2
    mask_sum = jnp.ones((D, 1, Px), feats.dtype)  # ref view always in bounds

    warped_rgb = [ref_img]
    n_src = V - 1
    D_planes = depth_values.shape[0]
    for i in range(n_src):
        if identity_src_warp:
            # gather-free fast path (see ops.homography.identity_warp_cm):
            # exact for the dynamic volume whose neighbour proj_mats are identity
            warped_feat, mask = identity_warp_cm(feats[i + 1], D_planes, pad=pad)
            if i < 2:
                warped_img, _ = identity_warp_cm(imgs_small[i + 1], D_planes,
                                                 pad=pad)
                warped_rgb.append(warped_img)
        else:
            if use_pallas_warp:
                # MXU banded lane-gather kernel (kernels/plane_sweep.py); falls
                # back to the XLA gather path when the feature width is not 128.
                # Img channels ride along in the same call (shared tap data)
                # instead of a second kernel launch. Under precision 16 this
                # warps the reference-quirk RGB conditioning channels through
                # the kernel too — accepted rounding of the opt-in bf16 mode,
                # documented in CLAUDE.md invariants.
                from ..kernels.plane_sweep import homo_warp_fast_cm
                src = feats[i + 1]
                if i < 2:
                    src = jnp.concatenate(
                        [src, imgs_small[i + 1].astype(src.dtype)], axis=-1)
                warped, grid = homo_warp_fast_cm(src, proj_mats[i + 1],
                                                 depth_values, pad=pad,
                                                 band=warp_band,
                                                 group=warp_group)
                warped = warped.astype(src.dtype)
                warped_feat = warped[:, :C]
                if i < 2:
                    warped_rgb.append(warped[:, C:].astype(imgs_small.dtype))
            else:
                warp = lambda f, **kw: homo_warp(f, proj_mats[i + 1],
                                                 depth_values, pad=pad, **kw)
                wf, grid = warp(feats[i + 1])
                warped_feat = jnp.moveaxis(wf, -1, 1).reshape(D, C, Px)
                if i < 2:
                    warped_img, _ = warp(imgs_small[i + 1], src_grid=grid)
                    warped_rgb.append(
                        jnp.moveaxis(warped_img, -1, 1).reshape(D, 3, Px))
            mask = in_bounds_mask(grid).reshape(D, 1, Px)
        mask_sum = mask_sum + mask
        volume_sum = volume_sum + warped_feat
        volume_sq_sum = volume_sq_sum + warped_feat ** 2

    while len(warped_rgb) < 3:  # V<3: reference leaves these channels uninitialized
        warped_rgb.append(jnp.zeros_like(ref_img))

    count = 1.0 / mask_sum
    variance = volume_sq_sum * count - (volume_sum * count) ** 2

    cost_cm = jnp.concatenate(warped_rgb + [variance], axis=1)  # [D, 9+C, Px]
    # single NHWC transpose for the 3D U-Net (was one minor transpose per view)
    cost_vol = jnp.swapaxes(cost_cm, 1, 2).reshape(D, hp, wp, 9 + C)
    return cost_vol


class MVSEncoder(nn.Module):
    """imgs [V, H, W, 3] + proj_mats [V, 3, 4] + near_far → encoding volume.

    Returns:
        volume_feat: [D, h+2p, w+2p, 8]
        feats: [V, h, w, 32] per-view 2D features
        depth_values: [D]
    """
    n_planes: int = N_DEPTH_PLANES
    identity_src_warp: bool = False  # dynamic volume: neighbour proj_mats are I
    dtype: object = jnp.float32      # compute dtype (bf16 under --precision 16)
    use_pallas_warp: bool = False    # MXU banded-matmul plane-sweep kernel
    warp_band: int = 16              # static band size (see kernels/plane_sweep)
    warp_group: int = 1              # warp-kernel chunks-per-matmul

    @nn.compact
    def __call__(self, imgs, proj_mats, near_far, pad: int = 0,
                 lindisp: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        V, H, W, _ = imgs.shape
        feats = FeatureNet(dtype=self.dtype, name="feature")(imgs)
        depth_values = depth_plane_values(near_far[0], near_far[1], self.n_planes,
                                          lindisp)
        cost_vol = build_cost_volume(imgs.astype(self.dtype), feats, proj_mats,
                                     depth_values, pad=pad,
                                     identity_src_warp=self.identity_src_warp,
                                     use_pallas_warp=self.use_pallas_warp,
                                     warp_band=self.warp_band,
                                     warp_group=self.warp_group)
        # pad channels (41 → 48): zero channels are mathematically inert but give
        # the first 3D conv a sublane-aligned channel count — the unpadded 41-ch
        # conv backward ran at ~1.3 TFLOP/s with 16x-padded layout copies
        pad_c = (-cost_vol.shape[-1]) % 8
        if pad_c:
            cost_vol = jnp.pad(cost_vol, ((0, 0),) * 3 + ((0, pad_c),))
        volume_feat = CostRegNet(dtype=self.dtype, name="cost_reg_2")(
            cost_vol[None])[0]
        # the encoding volume feeds f32 trilinear sampling + MLP conditioning
        return volume_feat.astype(jnp.float32), feats, depth_values
