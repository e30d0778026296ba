"""Visualization helpers (host-side, PIL/NumPy): depth colormaps + PNG dumps.

Replaces the reference's cv2/torchvision visualization (utils.py:28-46).
"""
from __future__ import annotations

import numpy as np


def _jet(x):
    """Minimal JET colormap (x in [0,1] → rgb in [0,1]); replaces cv2.applyColorMap."""
    x = np.clip(x, 0.0, 1.0)
    four = 4.0 * x
    r = np.clip(np.minimum(four - 1.5, -four + 4.5), 0, 1)
    g = np.clip(np.minimum(four - 0.5, -four + 3.5), 0, 1)
    b = np.clip(np.minimum(four + 0.5, -four + 2.5), 0, 1)
    return np.stack([r, g, b], -1)


def visualize_depth(depth, minmax=None):
    """[H, W] depth → [H, W, 3] JET visualization (utils.py:28-46 semantics)."""
    x = np.nan_to_num(np.asarray(depth, np.float32))
    if minmax is None:
        pos = x[x > 0]
        mi = pos.min() if pos.size else 0.0
        ma = x.max()
    else:
        mi, ma = minmax
    x = (x - mi) / (ma - mi + 1e-8)
    return _jet(x)


def save_image(path, img):
    """Save [H, W, 3] or [H, W] float array in [0,1] as PNG."""
    from PIL import Image
    arr = np.asarray(img)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, -1)
    arr = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
    Image.fromarray(arr).save(path)
