"""LLFF forward-facing dataset loader (static MVSNeRF path).

Re-design of ``/root/reference/data/llff.py``: ``images_4/`` + ``poses_bounds.npy``
per scene, pose centering, scale so the nearest depth ≈ 1.33 (near·0.75), nearest- or
farthest-view source selection, spiral/spheric render-path generators.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np

from .common import imagenet_normalize, load_image
from .pose_utils import center_poses, get_nearest_pose_ids


def create_spiral_poses(radii, focus_depth, n_poses=120):
    """Spiral render path (data/llff.py:99-129)."""
    poses = []
    for t in np.linspace(0, 4 * np.pi, n_poses + 1)[:-1]:
        center = np.array([np.cos(t), -np.sin(t), -np.sin(0.5 * t)]) * radii
        z = center - np.array([0, 0, -focus_depth])
        z = z / np.linalg.norm(z)
        y_ = np.array([0, 1, 0])
        x = np.cross(y_, z)
        x = x / np.linalg.norm(x)
        y = np.cross(z, x)
        poses.append(np.stack([x, y, z, center], 1))
    return np.stack(poses).astype(np.float32)


def create_spheric_poses(radius, n_poses=120):
    """Circular poses around z (data/llff.py:132-170)."""
    def spheric_pose(theta, phi, r):
        trans_t = np.array([[1, 0, 0, 0], [0, 1, 0, -0.9 * r],
                            [0, 0, 1, r], [0, 0, 0, 1.0]])
        rot_phi = np.array([[1, 0, 0, 0],
                            [0, np.cos(phi), -np.sin(phi), 0],
                            [0, np.sin(phi), np.cos(phi), 0],
                            [0, 0, 0, 1.0]])
        rot_theta = np.array([[np.cos(theta), 0, -np.sin(theta), 0],
                              [0, 1, 0, 0],
                              [np.sin(theta), 0, np.cos(theta), 0],
                              [0, 0, 0, 1.0]])
        c2w = rot_theta @ rot_phi @ trans_t
        flip = np.array([[-1, 0, 0, 0], [0, 0, 1, 0],
                         [0, 1, 0, 0], [0, 0, 0, 1.0]])
        return (flip @ c2w)[:3]

    return np.stack([spheric_pose(th, -np.pi / 5, radius)
                     for th in np.linspace(0, 2 * np.pi, n_poses + 1)[:-1]]) \
        .astype(np.float32)


class LLFFDataset:
    def __init__(self, root_dir, config_dir=None, split="train", downSample=1.0,
                 max_len=-1, scene=None, depth_path=None, closest_views=False,
                 seed=None, **_):
        self.root_dir = Path(root_dir)
        self.config_dir = Path(config_dir) if config_dir else None
        self.split = split
        self.img_wh = (int(960 * downSample), int(640 * downSample))
        assert self.img_wh[0] % 32 == 0 or self.img_wh[1] % 32 == 0
        self.max_len = max_len
        self.closest_views = closest_views
        self.rng = np.random.default_rng(seed)
        # adversarial-depth injection (reference data/llff.py:203-204,368-372):
        # random DTU PFM depth maps from an UNRELATED dataset feed the depth
        # discriminator as "real" samples
        self.depth_files = (sorted(Path(depth_path).glob("**/*.pfm"))
                            if depth_path else [])

        self._build_metas(scene)
        self._build_proj_mats()

    def _build_metas(self, scene):
        if scene is None:
            lst = self.config_dir / f"lists/llff_{self.split}_all.txt"
            self.scenes = [l.strip() for l in lst.read_text().splitlines()
                           if l.strip()]
        else:
            self.scenes = [scene]
        self.image_paths, self.metas = {}, []
        for sc in self.scenes:
            self.image_paths[sc] = sorted((self.root_dir / sc).glob("**/images_4/*"))
            for vid in range(len(self.image_paths[sc])):
                self.metas.append((sc, vid))

    def _build_proj_mats(self):
        self.proj_mats, self.intrinsics = {}, {}
        self.world2cams, self.cam2worlds, self.bounds = {}, {}, {}
        self.scale_factor = {}
        for sc in self.scenes:
            pb = np.load(self.root_dir / sc / "poses_bounds.npy")
            if self.split in ("train", "val"):
                assert len(pb) == len(self.image_paths[sc])
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
            self.scale_factor[sc] = scale

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

    def read_depth(self, filename):
        """Random-DTU depth pipeline (data/llff.py:292-312): PFM → ×0.5 nearest
        → crop [44:556, 80:720] → ×downSample → resize to img_wh. Host-side
        numpy nearest resize replaces cv2 (not in this image); these are random
        unrelated maps, so interpolation parity is irrelevant."""
        from .pfm import read_pfm

        def nearest(a, oh, ow):
            yi = np.minimum((np.arange(oh) * a.shape[0] / oh).astype(np.int64),
                            a.shape[0] - 1)
            xi = np.minimum((np.arange(ow) * a.shape[1] / ow).astype(np.int64),
                            a.shape[1] - 1)
            return a[yi][:, xi]

        depth = np.asarray(read_pfm(filename)[0], dtype=np.float32)
        depth = nearest(depth, depth.shape[0] // 2, depth.shape[1] // 2)
        depth = depth[44:556, 80:720]
        down = self.img_wh[0] / 960.0
        depth = nearest(depth, max(int(depth.shape[0] * down), 1),
                        max(int(depth.shape[1] * down), 1))
        return nearest(depth, self.img_wh[1], self.img_wh[0])

    def __len__(self):
        return len(self.metas) if self.max_len <= 0 else self.max_len

    def __getitem__(self, idx):
        sc, target = self.metas[idx]
        near_ids = get_nearest_pose_ids(self.cam2worlds[sc][target],
                                        self.cam2worlds[sc],
                                        len(self.cam2worlds[sc]), tar_id=target,
                                        angular_dist_method="dist")
        # nearest 5 or farthest 10 (data/llff.py:327-332)
        pool = near_ids[:5] if self.closest_views else near_ids[-10:]
        if self.split == "train":
            sel = self.rng.permutation(5)[:3]
            view_ids = [int(pool[i]) for i in sel] + [target]
        else:
            view_ids = [int(pool[i]) for i in range(3)] + [target]

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

        W, H = self.img_wh
        if self.depth_files:
            fname = self.depth_files[int(self.rng.integers(len(self.depth_files)))]
            depths = self.read_depth(fname) * self.scale_factor[sc]
        else:
            depths = np.zeros((H, W), np.float32)
        return {
            "images": np.stack(imgs).astype(np.float32),
            "depths": depths.astype(np.float32),
            "w2cs": np.stack(w2cs).astype(np.float32),
            "c2ws": np.stack(c2ws).astype(np.float32),
            "near_fars": np.stack(near_fars),
            "proj_mats": np.stack(pms)[:, :3].astype(np.float32),
            "intrinsics": np.stack(intrs).astype(np.float32),
        }
