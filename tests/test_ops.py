"""Grid-sample / homography kernels vs torch oracles and closed forms."""
import numpy as np
import pytest
import jax.numpy as jnp

from zest_tpu.ops import grid_sample_2d, grid_sample_3d, homo_warp
from zest_tpu.ops.grid_sample import resize_bilinear_align_corners

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def test_grid_sample_2d_matches_torch_zeros():
    rng = np.random.default_rng(0)
    img = rng.normal(size=(7, 9, 4)).astype(np.float32)
    grid = rng.uniform(-1.3, 1.3, size=(5, 6, 2)).astype(np.float32)

    ours = np.asarray(grid_sample_2d(jnp.asarray(img), jnp.asarray(grid), "zeros"))

    t_img = torch.from_numpy(img).permute(2, 0, 1)[None]        # [1,C,H,W]
    t_grid = torch.from_numpy(grid)[None]                        # [1,5,6,2]
    ref = F.grid_sample(t_img, t_grid, mode="bilinear", padding_mode="zeros",
                        align_corners=True)[0].permute(1, 2, 0).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_grid_sample_2d_matches_torch_border():
    rng = np.random.default_rng(1)
    img = rng.normal(size=(8, 5, 3)).astype(np.float32)
    grid = rng.uniform(-1.5, 1.5, size=(11, 2)).astype(np.float32)

    ours = np.asarray(grid_sample_2d(jnp.asarray(img), jnp.asarray(grid), "border"))

    t_img = torch.from_numpy(img).permute(2, 0, 1)[None]
    t_grid = torch.from_numpy(grid)[None, None]                  # [1,1,11,2]
    ref = F.grid_sample(t_img, t_grid, mode="bilinear", padding_mode="border",
                        align_corners=True)[0, :, 0].permute(1, 0).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_grid_sample_3d_matches_torch():
    rng = np.random.default_rng(2)
    vol = rng.normal(size=(6, 7, 8, 5)).astype(np.float32)
    grid = rng.uniform(-1.2, 1.2, size=(4, 9, 3)).astype(np.float32)

    ours = np.asarray(grid_sample_3d(jnp.asarray(vol), jnp.asarray(grid), "zeros"))

    t_vol = torch.from_numpy(vol).permute(3, 0, 1, 2)[None]      # [1,C,D,H,W]
    t_grid = torch.from_numpy(grid)[None, None]                  # [1,1,4,9,3]
    ref = F.grid_sample(t_vol, t_grid, mode="bilinear", padding_mode="zeros",
                        align_corners=True)[0, :, 0].permute(1, 2, 0).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_homo_warp_identity_projection():
    """Identity proj matrix + any depth ⇒ warp is the identity resample (pad=0)."""
    rng = np.random.default_rng(3)
    feat = rng.normal(size=(12, 16, 6)).astype(np.float32)
    proj = np.concatenate([np.eye(3), np.zeros((3, 1))], 1).astype(np.float32)
    depths = np.linspace(2.0, 6.0, 4).astype(np.float32)

    warped, grid = homo_warp(jnp.asarray(feat), jnp.asarray(proj), jnp.asarray(depths))
    assert warped.shape == (4, 12, 16, 6)
    for d in range(4):
        np.testing.assert_allclose(np.asarray(warped[d]), feat, atol=1e-5)


def test_homo_warp_pure_translation_shift():
    """proj = [I | t] with t = (tx*d, 0, 0) shifts sampling by tx pixels at depth d."""
    feat = np.arange(10 * 12, dtype=np.float32).reshape(10, 12, 1)
    d = 4.0
    tx_pix = 2.0
    proj = np.concatenate([np.eye(3), np.array([[tx_pix * d], [0], [0]])], 1)
    warped, _ = homo_warp(jnp.asarray(feat), jnp.asarray(proj.astype(np.float32)),
                          jnp.asarray([d], dtype=np.float32))
    # sampled at x+2 → interior columns shift left by 2
    np.testing.assert_allclose(np.asarray(warped[0, :, :-2, 0]), feat[:, 2:, 0],
                               atol=1e-4)


def test_homo_warp_padded_extent_matches_torch_grid_sample():
    """Padded ref extent samples out-of-bounds with zeros (utils.py:61-74 semantics)."""
    rng = np.random.default_rng(4)
    feat = rng.normal(size=(6, 8, 2)).astype(np.float32)
    proj = np.concatenate([np.eye(3), np.zeros((3, 1))], 1).astype(np.float32)
    warped, grid = homo_warp(jnp.asarray(feat), jnp.asarray(proj),
                             jnp.asarray([3.0], dtype=np.float32), pad=2)
    assert warped.shape == (1, 10, 12, 2)
    # interior equals original
    np.testing.assert_allclose(np.asarray(warped[0, 2:-2, 2:-2]), feat, atol=1e-5)
    # pad corners sample fully outside → exactly zero
    assert np.all(np.asarray(warped[0, 0, 0]) == 0)


def test_resize_bilinear_align_corners_matches_torch():
    rng = np.random.default_rng(5)
    img = rng.normal(size=(5, 7, 3)).astype(np.float32)
    ours = np.asarray(resize_bilinear_align_corners(jnp.asarray(img), (10, 14)))
    t = torch.from_numpy(img).permute(2, 0, 1)[None]
    ref = F.interpolate(t, size=(10, 14), mode="bilinear",
                        align_corners=True)[0].permute(1, 2, 0).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)
