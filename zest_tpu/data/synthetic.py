"""Synthetic dynamic scene generator — test/bench fixture with the NSFF sample schema.

Produces the exact sample-dict layout of the real NSFF loader
(``/root/reference/data/nsff.py:369-396``, re-laid-out channels-last) without any data
on disk: procedural smooth images, a small camera ring, consistent proj_mats
(intrinsic/4 @ w2c relative to view 0, data/nsff.py:146-154), zero optical flow and
unit disparity. Deterministic per (frame, seed).
"""
from __future__ import annotations

import numpy as np

from .common import imagenet_normalize, MOTION_COORDS_PAD


def _procedural_image(H, W, t, seed=0):
    """Smooth time-varying pattern in [0,1]: sums of shifted sinusoids."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    img = np.zeros((H, W, 3), np.float32)
    for c in range(3):
        f1, f2 = rng.uniform(1, 4, 2)
        p1, p2 = rng.uniform(0, 2 * np.pi, 2)
        img[..., c] = 0.5 + 0.25 * np.sin(2 * np.pi * f1 * xx / W + p1 + 0.3 * t) \
            + 0.25 * np.cos(2 * np.pi * f2 * yy / H + p2 + 0.2 * t)
    return np.clip(img, 0.0, 1.0)


class SyntheticDataset:
    """Iterable of NSFF-schema samples for a tiny synthetic dynamic scene."""

    def __init__(self, root_dir=None, config_dir=None, split="train", *,
                 img_h=48, img_w=64, num_frames=None, num_keyframes=4,
                 use_mvs=True, use_mvs_dy=True, seed=0, max_len=-1, **_):
        if num_frames is None:
            # pick a frame count for which the reference keyframe-interval rule
            # (nsff.py:78-81) yields exactly num_keyframes keyframes, so the
            # config-derived feat_dim matches the actual source-view count
            num_frames = 3 * (num_keyframes - 1) + 1
        self.H, self.W = img_h, img_w
        self.num_frames = num_frames
        self.num_keyframes = num_keyframes
        self.use_mvs = use_mvs
        self.use_mvs_dy = use_mvs_dy
        self.seed = seed
        self.max_len = max_len
        f = 1.2 * img_w
        self.intrinsic = np.array([[f, 0, img_w / 2],
                                   [0, f, img_h / 2],
                                   [0, 0, 1]], np.float32)
        interval = max(num_frames // max(num_keyframes - 1, 1), 1)
        self.key_frames = list(range(0, num_frames, interval))[:num_keyframes]

    def __len__(self):
        return self.num_frames if self.max_len <= 0 else self.max_len

    def _pose(self, frame):
        """Camera on a small x-axis arc; c2w [4,4]."""
        c2w = np.eye(4, dtype=np.float32)
        c2w[0, 3] = 0.05 * np.sin(2 * np.pi * frame / self.num_frames)
        c2w[1, 3] = 0.03 * np.cos(2 * np.pi * frame / self.num_frames)
        return c2w

    def _proj_mat(self, w2c):
        intr = self.intrinsic.copy()
        intr[:2] /= 4.0
        pm = np.eye(4, dtype=np.float32)
        pm[:3, :4] = intr @ w2c[:3, :4]
        return pm

    def warp_band_bound(self, pad=24, group=1):
        """Exact host-side Pallas warp band bound over every (keyframe ref,
        view) pair — same preflight the NSFF loader runs (data/nsff.py:240)."""
        from ..kernels.plane_sweep import warp_band_bound_host
        ref_inv = np.linalg.inv(self._proj_mat(
            np.linalg.inv(self._pose(self.key_frames[0]))))
        worst = 1
        for f in range(self.num_frames):
            pm = self._proj_mat(np.linalg.inv(self._pose(f)))
            rel = (pm @ ref_inv)[:3]
            worst = max(worst, warp_band_bound_host(
                rel, 2.0, 6.0,   # fixed synthetic near/far (see __getitem__)
                self.H // 4, self.W // 4, pad=pad, group=group))
        return worst

    def __getitem__(self, idx):
        target = idx % self.num_frames
        nf = self.num_frames
        view_ids = (self.key_frames if self.use_mvs else []) + [target]

        imgs, w2cs, c2ws, intrinsics, near_fars, proj_mats = [], [], [], [], [], []
        ref_proj_inv = None
        for i, vid in enumerate(view_ids):
            c2w = self._pose(vid)
            w2c = np.linalg.inv(c2w)
            pm = self._proj_mat(w2c)
            if i == 0:
                ref_proj_inv = np.linalg.inv(pm)
                proj_mats.append(np.eye(4, dtype=np.float32))
            else:
                proj_mats.append(pm @ ref_proj_inv)
            img = _procedural_image(self.H, self.W, vid, self.seed)
            imgs.append(imagenet_normalize(img))
            w2cs.append(w2c)
            c2ws.append(c2w)
            intrinsics.append(self.intrinsic)
            near_fars.append(np.array([2.0, 6.0], np.float32))

        H, W = self.H, self.W
        sample = {
            "images": np.stack(imgs).astype(np.float32),
            "depths": 0.5 + np.linspace(0, 1, H * W, dtype=np.float32)
                      .reshape(H, W),
            "flow_fwd": np.stack(np.mgrid[0:H, 0:W][::-1], -1).astype(np.float32),
            "flow_bwd": np.stack(np.mgrid[0:H, 0:W][::-1], -1).astype(np.float32),
            "mask_fwd": np.ones((H, W), np.float32),
            "mask_bwd": np.ones((H, W), np.float32),
            "motion_coords": np.zeros((MOTION_COORDS_PAD, 2), np.float32),
            "motion_count": np.asarray(1, np.int32),
            "w2cs": np.stack(w2cs).astype(np.float32),
            "c2ws": np.stack(c2ws).astype(np.float32),
            "near_fars": np.stack(near_fars),
            "proj_mats": np.stack(proj_mats)[:, :3].astype(np.float32),
            "intrinsics": np.stack(intrinsics),
            "time": np.asarray(target, np.float32),
            "total_frames": np.asarray(nf, np.float32),
        }
        coords = np.argwhere(np.ones((H, W)))[:MOTION_COORDS_PAD]
        sample["motion_coords"][:len(coords)] = coords
        sample["motion_count"] = np.asarray(len(coords), np.int32)

        # first temporal neighbours t±1 (data/nsff.py:263-277)
        fnb = [max(target - 1, 0), min(target + 1, nf - 1)]
        sample["fnb_w2cs"] = np.stack([np.linalg.inv(self._pose(v)) for v in fnb])

        # 60-pose bullet-time orbit (data/nsff.py:169-207)
        from .nsff import wanderpath_poses
        wc2w = wanderpath_poses(self._pose(target), self.intrinsic[1, 1])
        sample["wander_path_c2w"] = wc2w
        sample["wander_path_w2c"] = np.linalg.inv(wc2w).astype(np.float32)

        if self.use_mvs_dy:
            nbs = [max(target - 2, 0), max(target - 1, 0),
                   min(target + 1, nf - 1), min(target + 2, nf - 1)]
            nb_imgs, nb_w2cs, nb_intr, nb_pm = [], [], [], []
            for v in nbs:
                img = _procedural_image(self.H, self.W, v, self.seed)
                nb_imgs.append(imagenet_normalize(img))
                nb_w2cs.append(np.linalg.inv(self._pose(v)))
                nb_intr.append(self.intrinsic)
                # reference quirk: neighbour proj_mats are P @ P^-1 == identity
                # (data/nsff.py:294-297) — the dynamic cost volume is built from
                # UNWARPED neighbour features; reproduced deliberately.
                nb_pm.append(np.eye(4, dtype=np.float32))
            sample["nb_imgs"] = np.stack(nb_imgs).astype(np.float32)
            sample["nb_w2cs"] = np.stack(nb_w2cs).astype(np.float32)
            sample["nb_intr"] = np.stack(nb_intr)
            sample["nb_proj_mats"] = np.stack(nb_pm)[:, :3].astype(np.float32)
        return sample
