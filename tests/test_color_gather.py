"""y-banded Pallas color gather vs the grid_sample_2d border oracle."""
import numpy as np
import jax
import jax.numpy as jnp

from zest_tpu.ops.grid_sample import grid_sample_2d
from zest_tpu.kernels.color_gather import gather_colors_banded, _precompute


def _oracle(img, xy):
    H, W, _ = img.shape
    grid = xy / jnp.array([(W - 1) * 0.5, (H - 1) * 0.5], jnp.float32) - 1.0
    return grid_sample_2d(img, grid[None], padding_mode="border")[0]


def test_banded_rows_match_oracle():
    """Contiguous row-chunk points (eval layout) — kernel path engages."""
    rng = np.random.default_rng(0)
    H, W, C = 48, 64, 3
    img = jnp.asarray(rng.normal(size=(H, W, C)).astype(np.float32))
    # 3 chunks of 128 points, each near one image row (+ sub-row jitter, some
    # slightly out of bounds to exercise border clamping)
    xs = rng.uniform(-1.5, W + 0.5, size=(3, 128))
    ys = (np.array([5.0, 22.0, 40.0])[:, None]
          + rng.uniform(-2.0, 2.0, size=(3, 128)))
    xy = jnp.asarray(np.stack([xs, ys], -1).reshape(-1, 2).astype(np.float32))
    _, _, ok = _precompute(xy, H, W, 16)
    assert bool(ok)
    out = gather_colors_banded(img, xy, band=16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_oracle(img, xy)),
                               rtol=1e-5, atol=1e-5)


def test_unbanded_falls_back_exactly():
    """Random-pixel points (train layout) — exact XLA fallback."""
    rng = np.random.default_rng(1)
    H, W, C = 32, 40, 3
    img = jnp.asarray(rng.normal(size=(H, W, C)).astype(np.float32))
    xy = jnp.asarray(np.stack([rng.uniform(0, W - 1, 300),
                               rng.uniform(0, H - 1, 300)], -1)
                     .astype(np.float32))
    _, _, ok = _precompute(xy, H, W, 16)
    assert not bool(ok)
    out = gather_colors_banded(img, xy, band=16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_oracle(img, xy)),
                               rtol=1e-6, atol=1e-6)


def test_partial_chunk_edge_padding():
    """N not a multiple of 128: edge-replicated pad must not break the band."""
    rng = np.random.default_rng(2)
    H, W, C = 40, 56, 3
    img = jnp.asarray(rng.normal(size=(H, W, C)).astype(np.float32))
    xs = rng.uniform(0, W - 1, size=200)
    ys = 30.0 + rng.uniform(-1, 1, size=200)
    xy = jnp.asarray(np.stack([xs, ys], -1).astype(np.float32))
    _, _, ok = _precompute(xy, H, W, 16)
    assert bool(ok)
    out = gather_colors_banded(img, xy, band=16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_oracle(img, xy)),
                               rtol=1e-5, atol=1e-5)


def test_image_gradients_flow():
    rng = np.random.default_rng(3)
    H, W, C = 24, 32, 3
    img = jnp.asarray(rng.normal(size=(H, W, C)).astype(np.float32))
    xs = rng.uniform(0, W - 1, size=128)
    ys = 10.0 + rng.uniform(-1, 1, size=128)
    xy = jnp.asarray(np.stack([xs, ys], -1).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(128, C)).astype(np.float32))
    gi_ref = jax.grad(lambda im: jnp.vdot(_oracle(im, xy), g))(img)
    gi = jax.grad(lambda im: jnp.vdot(gather_colors_banded(im, xy, band=16),
                                      g))(img)
    np.testing.assert_allclose(np.asarray(gi), np.asarray(gi_ref),
                               rtol=1e-5, atol=1e-5)


def test_grouped_banded_matches_oracle():
    """group=4: 4x128 points share one grid step + band (eval fast path)."""
    rng = np.random.default_rng(4)
    H, W, C = 64, 72, 3
    img = jnp.asarray(rng.normal(size=(H, W, C)).astype(np.float32))
    # 2 blocks of 512 points, each block's rows within a ~6-row band
    xs = rng.uniform(-1.0, W + 1.0, size=(2, 512))
    ys = (np.array([12.0, 45.0])[:, None]
          + rng.uniform(-3.0, 3.0, size=(2, 512)))
    xy = jnp.asarray(np.stack([xs, ys], -1).reshape(-1, 2).astype(np.float32))
    _, _, ok = _precompute(xy, H, W, 16, group=4)
    assert bool(ok)
    out = gather_colors_banded(img, xy, band=16, group=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_oracle(img, xy)),
                               rtol=1e-5, atol=1e-5)
    # group=1 result identical on the same points (band holds per-128 too)
    out1 = gather_colors_banded(img, xy, band=16, group=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out1),
                               rtol=1e-6, atol=1e-6)


def test_grouped_band_violation_falls_back():
    """Per-128 bands hold but the 4-group union does not -> exact fallback."""
    rng = np.random.default_rng(5)
    H, W, C = 96, 64, 3
    img = jnp.asarray(rng.normal(size=(H, W, C)).astype(np.float32))
    # 4 consecutive 128-pt groups at rows 5, 30, 60, 85: each group banded,
    # union spans ~80 rows
    xs = rng.uniform(0, W - 1, size=(4, 128))
    ys = (np.array([5.0, 30.0, 60.0, 85.0])[:, None]
          + rng.uniform(-1.0, 1.0, size=(4, 128)))
    xy = jnp.asarray(np.stack([xs, ys], -1).reshape(-1, 2).astype(np.float32))
    _, _, ok1 = _precompute(xy, H, W, 16, group=1)
    _, _, ok4 = _precompute(xy, H, W, 16, group=4)
    assert bool(ok1) and not bool(ok4)
    out = gather_colors_banded(img, xy, band=16, group=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_oracle(img, xy)),
                               rtol=1e-5, atol=1e-5)


def test_grouped_partial_block_edge_padding():
    """N not a multiple of group*128: edge pad fills the last block."""
    rng = np.random.default_rng(6)
    H, W, C = 40, 56, 3
    img = jnp.asarray(rng.normal(size=(H, W, C)).astype(np.float32))
    xs = rng.uniform(0, W - 1, size=300)
    ys = 20.0 + rng.uniform(-2, 2, size=300)
    xy = jnp.asarray(np.stack([xs, ys], -1).astype(np.float32))
    _, _, ok = _precompute(xy, H, W, 16, group=4)
    assert bool(ok)
    out = gather_colors_banded(img, xy, band=16, group=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_oracle(img, xy)),
                               rtol=1e-5, atol=1e-5)
