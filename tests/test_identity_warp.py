"""Identity-warp fast path matches the gather-based warp exactly."""
import numpy as np
import jax.numpy as jnp

from zest_tpu.ops.homography import homo_warp, identity_warp, in_bounds_mask
from zest_tpu.models.mvsnet import build_cost_volume


def test_identity_warp_matches_gather_path():
    rng = np.random.default_rng(0)
    feat = jnp.asarray(rng.normal(size=(12, 16, 5)).astype(np.float32))
    eye = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], 1)
    depths = jnp.linspace(2.0, 6.0, 3)
    for pad in (0, 2):
        ref_w, grid = homo_warp(feat, eye, depths, pad=pad)
        ref_m = in_bounds_mask(grid)
        fast_w, fast_m = identity_warp(feat, 3, pad=pad)
        np.testing.assert_allclose(np.asarray(fast_w), np.asarray(ref_w), atol=1e-5)
        np.testing.assert_allclose(np.asarray(fast_m), np.asarray(ref_m), atol=1e-6)


def test_cost_volume_identity_flag_matches():
    rng = np.random.default_rng(1)
    V, h, w, C = 4, 8, 12, 6
    feats = jnp.asarray(rng.normal(size=(V, h, w, C)).astype(np.float32))
    imgs = jnp.asarray(rng.uniform(size=(V, h * 4, w * 4, 3)).astype(np.float32))
    eye = np.concatenate([np.eye(3), np.zeros((3, 1))], 1).astype(np.float32)
    proj = jnp.asarray(np.broadcast_to(eye, (V, 3, 4)))
    depths = jnp.linspace(2.0, 6.0, 2)
    a = build_cost_volume(imgs, feats, proj, depths, pad=2,
                          identity_src_warp=False)
    b = build_cost_volume(imgs, feats, proj, depths, pad=2,
                          identity_src_warp=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
