"""Neural 3D Video multi-camera dataset loader (time-code training path).

Re-design of ``/root/reference/data/neural3Dvideo.py``: per-scene camera directories
(``cam00/…``, frames extracted from the mp4s) + one ``poses_bounds.npy``; samples are
(scene × camera × frame); nearest-8 far views with random 3 at train; each sample
carries ``time``/``total_frames`` and the ``keyframe_id`` that indexes the learnable
time codes (train.py:92-99, 342).
"""
from __future__ import annotations

from pathlib import Path

import numpy as np

from .common import imagenet_normalize, load_image
from .pose_utils import center_poses, get_nearest_pose_ids


class Neural3DVideoDataset:
    def __init__(self, root_dir, config_dir=None, split="train", downSample=1.0,
                 max_len=-1, scene=None, closest_views=False,
                 train_key_frames=False, keyframe_interval=30, seed=None, **_):
        self.root_dir = Path(root_dir)
        self.config_dir = Path(config_dir) if config_dir else None
        self.split = split
        self.train_key_frames = train_key_frames
        self.keyframe_interval = keyframe_interval
        self.img_wh = (int(960 * downSample), int(640 * downSample))
        assert self.img_wh[0] % 32 == 0 or self.img_wh[1] % 32 == 0
        self.max_len = max_len
        self.closest_views = closest_views
        self.rng = np.random.default_rng(seed)

        self._build_metas(scene)
        self._build_proj_mats()

    def _build_metas(self, scene):
        if scene is None:
            lst = self.config_dir / f"lists/neural3Dvideo_{self.split}_all.txt"
            self.scenes = [l.strip() for l in lst.read_text().splitlines()
                           if l.strip()]
        else:
            self.scenes = [scene]
        self.image_paths, self.cameras, self.key_frames = {}, {}, {}
        self.metas = []
        for sc in self.scenes:
            sp = self.root_dir / sc
            self.cameras[sc] = sorted(c.stem for c in sp.glob("*")
                                      if c.stem != "poses_bounds")
            self.image_paths[sc] = {}
            for cam_id, cam in enumerate(self.cameras[sc]):
                self.image_paths[sc][cam] = sorted((sp / cam).glob("*"))
                n = len(self.image_paths[sc][cam])
                self.key_frames[sc] = {}
                interval = self.keyframe_interval if self.train_key_frames else 1
                for frame_id, frame_t in enumerate(range(0, n, interval)):
                    self.metas.append((sc, cam_id, frame_t, n))
                    self.key_frames[sc][frame_t] = frame_id

    def _build_proj_mats(self):
        self.proj_mats, self.intrinsics = {}, {}
        self.world2cams, self.cam2worlds, self.bounds = {}, {}, {}
        for sc in self.scenes:
            pb = np.load(self.root_dir / sc / "poses_bounds.npy")
            poses = pb[:, :15].reshape(-1, 3, 5)
            bounds = pb[:, -2:]
            H, W, focal = poses[0, :, -1]
            focal = [focal * self.img_wh[0] / W, focal * self.img_wh[1] / H]
            poses = np.concatenate([poses[..., 1:2], -poses[..., :1],
                                    poses[..., 2:4]], -1)
            poses, _ = center_poses(poses)
            scale = bounds.min() * 0.75
            bounds = bounds / scale
            poses = poses.copy()
            poses[..., 3] /= scale
            self.bounds[sc] = bounds

            w, h = self.img_wh
            pms, intrs, w2cs, c2ws = [], [], [], []
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
                intr_feat[:2] /= 4.0
                pm = np.eye(4, dtype=np.float32)
                pm[:3, :4] = intr_feat @ w2c[:3, :4]
                pms.append(pm)
            self.proj_mats[sc] = np.stack(pms)
            self.intrinsics[sc] = np.stack(intrs)
            self.world2cams[sc] = np.stack(w2cs)
            self.cam2worlds[sc] = np.stack(c2ws)

    def __len__(self):
        return len(self.metas) if self.max_len <= 0 else self.max_len

    def __getitem__(self, idx):
        sc, target_cam, frame_t, n_frames = self.metas[idx]
        near_ids = get_nearest_pose_ids(self.cam2worlds[sc][target_cam],
                                        self.cam2worlds[sc],
                                        len(self.cam2worlds[sc]),
                                        tar_id=target_cam,
                                        angular_dist_method="dist")
        pool = near_ids[:5] if self.closest_views else near_ids[-8:]
        if self.split == "train":
            sel = self.rng.permutation(5)[:3]
            view_ids = [int(pool[i]) for i in sel] + [target_cam]
        else:
            view_ids = [int(pool[i]) for i in range(3)] + [target_cam]

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
            cam = self.cameras[sc][vid]
            imgs.append(imagenet_normalize(
                load_image(self.image_paths[sc][cam][frame_t], self.img_wh)))

        W, H = self.img_wh
        return {
            "images": np.stack(imgs).astype(np.float32),
            "depths": np.zeros((H, W), np.float32),
            "w2cs": np.stack(w2cs).astype(np.float32),
            "c2ws": np.stack(c2ws).astype(np.float32),
            "near_fars": np.stack(near_fars),
            "proj_mats": np.stack(pms)[:, :3].astype(np.float32),
            "intrinsics": np.stack(intrs).astype(np.float32),
            "time": np.asarray(frame_t, np.float32),
            "total_frames": np.asarray(n_frames, np.float32),
            "keyframe_id": np.asarray(self.key_frames[sc][frame_t], np.int32),
        }
