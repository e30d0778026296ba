"""NSFF Dynamic Scenes dataset — host-side loader producing jit-ready sample dicts.

Re-design of the reference loader (``/root/reference/data/nsff.py``) for the TPU
pipeline: channels-last arrays, static-shape motion-coordinate padding, no torch.
Scene layout on disk (per scene dir): ``images/``, ``disp/*.npy`` (monocular
disparity), ``motion_masks/``, ``flow_i1/*_{fwd,bwd}.npz`` (optical flow + mask),
``dense/poses_bounds.npy`` (COLMAP/LLFF format).

Behavior pinned to the reference:
- keyframe list: every ``num_frames // (num_keyframes - 1)``-th frame (nsff.py:78-81)
- scale: 5th-percentile near bound · 0.9 (nsff.py:123)
- near/far of a sample: [min·0.8, max·1.2] over its view ids (nsff.py:272)
- proj_mats relative to view 0 at 1/4 feature scale (nsff.py:146-154, 311-317)
- temporal-neighbour proj_mats are P @ P⁻¹ == IDENTITY (nsff.py:294-297) — the
  dynamic volume is built from unwarped neighbour features (reference quirk kept)
- flow stored relative, converted to absolute coords with a pixel grid
  (nsff.py:341-344); frame 0 / last frame get zero bwd/fwd flow
- wander-path: 60 orbit poses per frame (nsff.py:169-207)
"""
from __future__ import annotations

from pathlib import Path

import numpy as np

from .common import (MOTION_COORDS_PAD, imagenet_normalize, load_image,
                     pad_motion_coords, resize_image, uv_grid)
from .pose_utils import center_poses


def wanderpath_poses(c2w, focal_y, num_frames: int = 60, max_disp: float = 48.0):
    """60-pose orbit around a target view (data/nsff.py:169-207)."""
    max_trans = max_disp / focal_y
    out = []
    c2w = np.asarray(c2w)
    ref_pose = np.concatenate([c2w[:3, :4],
                               np.array([[0.0, 0.0, 0.0, 1.0]])], axis=0)
    for i in range(num_frames):
        x_t = max_trans * np.sin(2.0 * np.pi * i / num_frames)
        y_t = max_trans * np.cos(2.0 * np.pi * i / num_frames) / 3.0
        z_t = max_trans * np.cos(2.0 * np.pi * i / num_frames) / 3.0
        i_pose = np.eye(4)
        i_pose[:3, 3] = [x_t, y_t, z_t]
        out.append(ref_pose @ np.linalg.inv(i_pose))
    return np.stack(out).astype(np.float32)


class NSFFDataset:
    def __init__(self, root_dir, config_dir=None, split="train", crossval="NSFF",
                 downSample=1.0, max_len=-1, scene=None, closest_views=False,
                 use_mvs=False, use_mvs_dy=False, num_keyframes=10, frame_jump=1,
                 img_h=288, img_w=544, **_):
        self.root_dir = Path(root_dir)
        self.config_dir = Path(config_dir) if config_dir else None
        self.split = split
        self.use_mvs = use_mvs
        self.use_mvs_dy = use_mvs_dy
        self.num_keyframes = num_keyframes
        self.frame_jump = frame_jump
        self.img_wh = (int(img_w * downSample), int(img_h * downSample))
        assert self.img_wh[0] % 32 == 0 or self.img_wh[1] % 32 == 0, \
            "image size must be divisible by 32"
        self.max_len = max_len

        self._build_metas(scene, crossval)
        self._build_proj_mats()

    # ------------------------------------------------------------------
    def _build_metas(self, scene, crossval):
        if scene is None:
            scene_list = self.config_dir / f"lists/{crossval}_{self.split}.txt"
            self.scenes = [l.strip() for l in scene_list.read_text().splitlines()
                           if l.strip()]
        else:
            self.scenes = [scene]

        self.image_paths, self.disp_paths, self.mask_paths = {}, {}, {}
        self.flow_fwd_paths, self.flow_bwd_paths = {}, {}
        self.metas, self.key_frames = [], {}
        for sc in self.scenes:
            sp = self.root_dir / sc
            self.image_paths[sc] = sorted(sp.glob("**/images/*"))
            self.disp_paths[sc] = sorted(sp.glob("**/disp/*"))
            self.mask_paths[sc] = sorted(sp.glob("**/motion_masks/*"))
            self.flow_fwd_paths[sc] = sorted(sp.glob("**/flow_i1/*_fwd.npz"))
            self.flow_bwd_paths[sc] = sorted(sp.glob("**/flow_i1/*_bwd.npz"))

            n = len(self.image_paths[sc])
            self.metas += [(sc, t, n) for t in range(n)]
            interval = n // (self.num_keyframes - 1)
            self.key_frames[sc] = list(range(0, n, interval))

    def _build_proj_mats(self):
        self.proj_mats, self.intrinsics = {}, {}
        self.world2cams, self.cam2worlds = {}, {}
        self.wander_c2w, self.wander_w2c = {}, {}
        self.bounds = {}
        for sc in self.scenes:
            pb = np.load(self.root_dir / sc / "dense" / "poses_bounds.npy")
            if self.split in ("train", "val"):
                assert len(pb) == len(self.image_paths[sc]), \
                    f"poses/images mismatch in {sc}"
            poses = pb[:, :15].reshape(-1, 3, 5)
            bounds = pb[:, -2:]
            H, W, focal = poses[0, :, -1]
            focal = [focal * self.img_wh[0] / W, focal * self.img_wh[1] / H]
            poses = np.concatenate([poses[..., 1:2], -poses[..., :1],
                                    poses[..., 2:4]], -1)
            poses, _ = center_poses(poses)
            scale = np.percentile(bounds[:, 0], 5) * 0.9
            bounds = bounds / scale
            poses = poses.copy()
            poses[..., 3] /= scale
            self.bounds[sc] = bounds

            w, h = self.img_wh
            pms, intrs, w2cs, c2ws, wc2w, ww2c = [], [], [], [], [], []
            for idx in range(len(poses)):
                c2w = np.eye(4, dtype=np.float32)
                c2w[:3] = poses[idx]
                w2c = np.linalg.inv(c2w)
                c2ws.append(c2w)
                w2cs.append(w2c)
                intr = np.array([[focal[0], 0, w / 2], [0, focal[1], h / 2],
                                 [0, 0, 1]], np.float32)
                intrs.append(intr)
                intr_feat = intr.copy()
                intr_feat[:2] /= 4.0  # 4x downscale in feature space
                pm = np.eye(4, dtype=np.float32)
                pm[:3, :4] = intr_feat @ w2c[:3, :4]
                pms.append(pm)
                target_c2w = wanderpath_poses(c2w, focal[1])
                wc2w.append(target_c2w)
                ww2c.append(np.linalg.inv(target_c2w))
            self.proj_mats[sc] = np.stack(pms)
            self.intrinsics[sc] = np.stack(intrs)
            self.world2cams[sc] = np.stack(w2cs)
            self.cam2worlds[sc] = np.stack(c2ws)
            self.wander_c2w[sc] = np.stack(wc2w)
            self.wander_w2c[sc] = np.stack(ww2c)

    # ------------------------------------------------------------------
    def _read_flow(self, path):
        data = np.load(path)
        flow, mask = data["flow"], np.float32(data["mask"])
        flow = resize_image(flow, self.img_wh, "bilinear")
        mask = resize_image(mask, self.img_wh, "nearest")
        return flow, mask

    def __len__(self):
        return len(self.metas) if self.max_len <= 0 else self.max_len

    def __getitem__(self, idx):
        sc, target, n_frames = self.metas[idx]
        jump = self.frame_jump
        view_ids = (self.key_frames[sc] if self.use_mvs else []) + [target]

        near_far = np.array([self.bounds[sc][view_ids].min() * 0.8,
                             self.bounds[sc][view_ids].max() * 1.2], np.float32)

        imgs, intrs, w2cs, c2ws, near_fars, pms = [], [], [], [], [], []
        ref_proj_inv = None
        for i, vid in enumerate(view_ids):
            intrs.append(self.intrinsics[sc][vid])
            w2cs.append(self.world2cams[sc][vid])
            c2ws.append(self.cam2worlds[sc][vid])
            near_fars.append(near_far)
            pm = self.proj_mats[sc][vid]
            if i == 0:
                ref_proj_inv = np.linalg.inv(pm)
                pms.append(np.eye(4, dtype=np.float32))
            else:
                pms.append(pm @ ref_proj_inv)
            imgs.append(imagenet_normalize(
                load_image(self.image_paths[sc][vid], self.img_wh)))

        # optical flow (absolute coords) — nsff.py:326-344
        W, H = self.img_wh
        grid = uv_grid(H, W)
        if target == 0:
            flow_fwd, mask_fwd = self._read_flow(self.flow_fwd_paths[sc][target])
            flow_bwd = np.zeros_like(flow_fwd)
            mask_bwd = np.zeros_like(mask_fwd)
        elif target == n_frames - 1:
            flow_bwd, mask_bwd = self._read_flow(self.flow_bwd_paths[sc][target - 1])
            flow_fwd = np.zeros_like(flow_bwd)
            mask_fwd = np.zeros_like(mask_bwd)
        else:
            flow_fwd, mask_fwd = self._read_flow(self.flow_fwd_paths[sc][target])
            flow_bwd, mask_bwd = self._read_flow(self.flow_bwd_paths[sc][target - 1])
        flow_fwd = flow_fwd + grid
        flow_bwd = flow_bwd + grid

        disp = np.load(self.disp_paths[sc][target])
        disp = resize_image(disp, self.img_wh, "nearest")

        mask_img = load_image(self.mask_paths[sc][target], self.img_wh)[..., 0]
        mask_bin = (mask_img > 1e-3).astype(np.float32)
        coords = np.argwhere(mask_bin > 0.1).astype(np.float32)
        motion_coords, motion_count = pad_motion_coords(coords)

        sample = {
            "images": np.stack(imgs).astype(np.float32),
            "depths": disp.astype(np.float32),
            "flow_fwd": flow_fwd.astype(np.float32),
            "flow_bwd": flow_bwd.astype(np.float32),
            "mask_fwd": mask_fwd.astype(np.float32),
            "mask_bwd": mask_bwd.astype(np.float32),
            "motion_coords": motion_coords,
            "motion_count": motion_count,
            "w2cs": np.stack(w2cs).astype(np.float32),
            "c2ws": np.stack(c2ws).astype(np.float32),
            "near_fars": np.stack(near_fars),
            "proj_mats": np.stack(pms)[:, :3].astype(np.float32),
            "intrinsics": np.stack(intrs).astype(np.float32),
            "time": np.asarray(target, np.float32),
            "total_frames": np.asarray(n_frames, np.float32),
            "wander_path_c2w": self.wander_c2w[sc][target],
            "wander_path_w2c": self.wander_w2c[sc][target],
        }

        fnb = [max(target - jump, 0), min(target + jump, n_frames - 1)]
        sample["fnb_w2cs"] = np.stack([self.world2cams[sc][v] for v in fnb])

        if self.use_mvs_dy:
            nbs = [max(target - 2 * jump, 0), max(target - jump, 0),
                   min(target + jump, n_frames - 1),
                   min(target + 2 * jump, n_frames - 1)]
            nb_imgs = [imagenet_normalize(
                load_image(self.image_paths[sc][v], self.img_wh)) for v in nbs]
            sample["nb_imgs"] = np.stack(nb_imgs).astype(np.float32)
            sample["nb_w2cs"] = np.stack([self.world2cams[sc][v]
                                          for v in nbs]).astype(np.float32)
            sample["nb_intr"] = np.stack([self.intrinsics[sc][v] for v in nbs])
            # reference quirk: P @ P^-1 == identity (see module docstring)
            sample["nb_proj_mats"] = np.stack(
                [np.eye(4, dtype=np.float32)[:3] for _ in nbs])
        return sample

    def warp_band_bound(self, feat_h=None, feat_w=None, pad=24, group=1):
        """Host-side exact band bound for the Pallas plane-sweep kernel over
        every (reference keyframe, source view) pair of every scene.

        The reference view of a sample is always the scene's first keyframe
        (view_ids[0]), so the relevant proj relations are P_v @ P_kf0⁻¹.
        Use the result to set cfg.warp_band (kernels/plane_sweep.py).
        """
        from ..kernels.plane_sweep import warp_band_bound_host
        w_img, h_img = self.img_wh
        feat_h = feat_h or h_img // 4
        feat_w = feat_w or w_img // 4
        worst = 1
        for sc in self.scenes:
            kf0 = self.key_frames[sc][0]
            ref_inv = np.linalg.inv(self.proj_mats[sc][kf0])
            near = float(self.bounds[sc].min() * 0.8)
            far = float(self.bounds[sc].max() * 1.2)
            for v in range(len(self.proj_mats[sc])):
                rel = (self.proj_mats[sc][v] @ ref_inv)[:3]
                worst = max(worst, warp_band_bound_host(rel, near, far,
                                                        feat_h, feat_w, pad=pad,
                                                        group=group))
        return worst
