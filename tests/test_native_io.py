"""Native C++ image pipeline (native/zest_io.cpp) vs PIL: decode + Lanczos
resize parity within uint8 quantization."""
import numpy as np
import pytest
from PIL import Image

from zest_tpu.data.native_io import get_lib, load_image_native, \
    load_images_native


pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="native toolchain unavailable")


def _write_test_images(tmp_path, n=3, size=(96, 64), seed=0):
    rng = np.random.default_rng(seed)
    paths = []
    for i in range(n):
        arr = rng.integers(0, 255, (size[1], size[0], 3), dtype=np.uint8)
        p = tmp_path / f"im{i}.png"
        Image.fromarray(arr).save(p)
        paths.append(p)
    return paths


@pytest.mark.parametrize("out_wh", [(48, 32), (96, 64), (128, 80)])
def test_native_matches_pil_lanczos(tmp_path, out_wh):
    paths = _write_test_images(tmp_path)
    for p in paths:
        pil = np.asarray(Image.open(p).convert("RGB")
                         .resize(out_wh, Image.LANCZOS), np.float32) / 255.0
        nat = load_image_native(p, out_wh)
        assert nat is not None and nat.shape == pil.shape
        # both quantize to uint8 after resampling; allow 1-2 LSB of rounding
        assert np.abs(nat - pil).max() <= 2.5 / 255.0
        assert (np.abs(nat - pil) > 0.5 / 255.0).mean() < 0.02


def test_native_batch_and_jpeg(tmp_path):
    rng = np.random.default_rng(1)
    arr = rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)
    pj = tmp_path / "a.jpg"
    Image.fromarray(arr).save(pj, quality=95)
    pp = tmp_path / "b.png"
    Image.fromarray(arr).save(pp)
    batch = load_images_native([pj, pp, pj], (48, 32))
    assert batch is not None and batch.shape == (3, 32, 48, 3)
    assert np.all((batch >= 0) & (batch <= 1))
    # jpeg decode agrees with PIL's within compression-decoder tolerance
    pil = np.asarray(Image.open(pj).convert("RGB")
                     .resize((48, 32), Image.LANCZOS), np.float32) / 255.0
    assert np.abs(batch[0] - pil).mean() < 4.0 / 255.0


def test_native_missing_file_falls_back():
    assert load_image_native("/nonexistent/zzz.png", (8, 8)) is None
