"""Shared host-side data utilities (NumPy/PIL only — the data pipeline is host-side)."""
from __future__ import annotations

import numpy as np

# static padding size for the variable-length motion-mask coordinate list
# (jit needs static shapes; the reference samples it with replacement anyway,
# utils.py:207)
MOTION_COORDS_PAD = 16384

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def imagenet_normalize(img):
    """[H, W, 3] in [0,1] → ImageNet-normalized (data/nsff.py:227-229)."""
    return (img - IMAGENET_MEAN) / IMAGENET_STD


def imagenet_unnormalize(img):
    return img * IMAGENET_STD + IMAGENET_MEAN


def pad_motion_coords(coords, pad_to: int = MOTION_COORDS_PAD):
    """Pad an [M, 2] coordinate list to static shape; returns (padded, count)."""
    count = min(len(coords), pad_to)
    out = np.zeros((pad_to, 2), np.float32)
    if count:
        out[:count] = coords[:count]
    return out, np.asarray(max(count, 1), np.int32)


def resize_image(img, wh, method="lanczos"):
    """Resize [H, W, C] float array via PIL (host-side; replaces cv2/PIL mix).

    method: 'lanczos' (images, data/nsff.py:301), 'nearest' (masks/disp), 'bilinear'.
    """
    from PIL import Image
    resample = {"lanczos": Image.LANCZOS, "nearest": Image.NEAREST,
                "bilinear": Image.BILINEAR}[method]
    arr = np.asarray(img)
    if arr.ndim == 2:
        return np.asarray(Image.fromarray(arr.astype(np.float32), mode="F")
                          .resize(wh, resample), np.float32)
    chans = [np.asarray(Image.fromarray(arr[..., c].astype(np.float32), mode="F")
                        .resize(wh, resample), np.float32)
             for c in range(arr.shape[-1])]
    return np.stack(chans, -1)


def load_image(path, wh):
    """PNG/JPG → [H, W, 3] float in [0,1], LANCZOS-resized (data/nsff.py:300-302).

    Uses the native C++ decode+resize pipeline when available (GIL-free
    multi-threaded; Pillow-compatible resampling — see data/native_io.py);
    falls back to PIL."""
    from .native_io import load_image_native, worth_using
    if worth_using():
        out = load_image_native(path, wh)
        if out is not None:
            return out
    from PIL import Image
    img = Image.open(path).convert("RGB").resize(wh, Image.LANCZOS)
    return np.asarray(img, np.float32) / 255.0


def load_images(paths, wh):
    """Batch variant: decodes all views of a sample in parallel natively."""
    from .native_io import load_images_native, worth_using
    if worth_using():
        out = load_images_native(paths, wh)
        if out is not None:
            return out
    return np.stack([load_image(p, wh) for p in paths])


def uv_grid(H, W):
    """[H, W, 2] absolute (x, y) pixel grid (kornia create_meshgrid equivalent,
    data/nsff.py:342)."""
    g = np.mgrid[0:H, 0:W].astype(np.float32)
    return np.stack([g[1], g[0]], -1)
