"""CNN introspection (--vis_cnn): dump encoder activations + PCA visualizations.

Equivalent of the reference's vis_test mode (networks.py:1164-1235): every
FeatureNet / CostRegNet activation is saved as a tensor plus a 3-channel PCA
image under ``<save_test>/{2cnn,3cnn}_vis/``. Implemented with flax's
``capture_intermediates`` (no hand-wired taps) and a NumPy SVD PCA (replaces
sklearn, networks.py:1240-1253).
"""
from __future__ import annotations

from pathlib import Path

import numpy as np

from .visualize import save_image


def feat2viz(feat: np.ndarray) -> np.ndarray:
    """[B, H, W, C] feature map → [B, H, W, 3] normalized PCA visualization
    (networks.py:1240-1253 semantics, channels-last, sklearn-free)."""
    b, h, w, c = feat.shape
    flat = feat.reshape(-1, c).astype(np.float64)
    flat = flat - flat.mean(0)
    # PCA via SVD of the (n, c) matrix
    _, _, vt = np.linalg.svd(flat, full_matrices=False)
    proj = flat @ vt[:3].T
    proj -= proj.min(0)
    proj /= proj.max(0) + 1e-12
    return proj.reshape(b, h, w, 3).astype(np.float32)


def dump_encoder_activations(encoder, params, imgs, proj_mats, near_far, pad,
                             out_dir):
    """Run one encoder forward capturing every intermediate; save tensors + PCA.

    Args:
        encoder: MVSEncoder module; params: its variables.
        out_dir: root directory (reference: --save_test, opt.py:196).
    Returns: dict of {path_name: shape} for the captured activations.
    """
    out_dir = Path(out_dir)
    (out_dir / "2cnn_vis" / "tensors").mkdir(parents=True, exist_ok=True)
    (out_dir / "2cnn_vis" / "feat2viz").mkdir(parents=True, exist_ok=True)
    (out_dir / "3cnn_vis" / "tensors").mkdir(parents=True, exist_ok=True)
    (out_dir / "3cnn_vis" / "feat2viz").mkdir(parents=True, exist_ok=True)
    (out_dir / "cost_vol" / "tensors").mkdir(parents=True, exist_ok=True)

    (vol, feats, dvals), inter = encoder.apply(
        params, imgs, proj_mats, near_far, pad=pad,
        capture_intermediates=True, mutable=["intermediates"])
    inter = inter["intermediates"]

    captured = {}

    def walk(tree, prefix):
        for k, v in tree.items():
            name = f"{prefix}.{k}" if prefix else k
            if k == "__call__":
                if not prefix or isinstance(v[0], (tuple, list, dict)):
                    continue  # top-level / multi-output modules
                arr = np.asarray(v[0])
                captured[prefix] = arr.shape
                sub = "2cnn_vis" if prefix.startswith("feature") else "3cnn_vis"
                np.save(out_dir / sub / "tensors" / f"{prefix}.npy", arr)
                if arr.ndim == 4 and min(arr.shape[1:3]) > 1:       # [B,H,W,C]
                    save_image(out_dir / sub / "feat2viz" / f"{prefix}.png",
                               feat2viz(arr)[0])
                elif arr.ndim == 5:                                  # [B,D,H,W,C]
                    mid = arr.shape[1] // 2
                    save_image(out_dir / sub / "feat2viz" / f"{prefix}.png",
                               feat2viz(arr[:, mid])[0])
            elif isinstance(v, dict):
                walk(v, name)

    walk(inter, "")
    np.save(out_dir / "cost_vol" / "tensors" / "volume_feat.npy", np.asarray(vol))
    return captured
