"""MVS encoder: cost-volume semantics + shapes."""
import numpy as np
import jax
import jax.numpy as jnp

from zest_tpu.models.mvsnet import (MVSEncoder, build_cost_volume,
                                    depth_plane_values)


def test_depth_plane_values_linear():
    d = depth_plane_values(2.0, 6.0, 5)
    np.testing.assert_allclose(np.asarray(d), [2, 3, 4, 5, 6], atol=1e-6)


def test_cost_volume_identity_projection_variance_zero():
    """All views identical + identity projections ⇒ variance volume ≈ 0."""
    rng = np.random.default_rng(0)
    V, h, w, C = 3, 8, 8, 4
    feat = rng.normal(size=(h, w, C)).astype(np.float32)
    feats = jnp.asarray(np.broadcast_to(feat, (V, h, w, C)))
    imgs = jnp.asarray(rng.uniform(size=(V, h * 4, w * 4, 3)).astype(np.float32))
    eye = np.concatenate([np.eye(3), np.zeros((3, 1))], 1).astype(np.float32)
    proj = jnp.asarray(np.broadcast_to(eye, (V, 3, 4)))
    depths = jnp.linspace(2.0, 6.0, 4)

    cost = build_cost_volume(imgs, feats, proj, depths, pad=0)
    assert cost.shape == (4, h, w, 9 + C)
    # interior only: the strict in-bounds mask (grid strictly inside (-1,1),
    # networks.py:1121-1123) excludes border pixels from the view count, so border
    # variance is biased — identical to the reference
    variance = np.asarray(cost[:, 1:-1, 1:-1, 9:])
    np.testing.assert_allclose(variance, 0.0, atol=1e-5)


def test_cost_volume_channel_layout():
    """Channels: [ref_rgb(3), warp1_rgb(3), warp2_rgb(3), variance(C)] with the
    reference's clobber quirk (sources ≥2 contribute only via variance)."""
    rng = np.random.default_rng(1)
    V, h, w, C = 5, 8, 8, 4
    feats = jnp.asarray(rng.normal(size=(V, h, w, C)).astype(np.float32))
    imgs = jnp.asarray(rng.uniform(size=(V, h * 4, w * 4, 3)).astype(np.float32))
    eye = np.concatenate([np.eye(3), np.zeros((3, 1))], 1).astype(np.float32)
    proj = jnp.asarray(np.broadcast_to(eye, (V, 3, 4)))
    depths = jnp.linspace(2.0, 6.0, 2)

    cost = build_cost_volume(imgs, feats, proj, depths, pad=0)
    assert cost.shape == (2, h, w, 9 + C)

    # antialias=False matches torch F.interpolate(bilinear) (test_parity_oracle)
    imgs_small = jax.image.resize(imgs, (V, h, w, 3), method="linear",
                                  antialias=False)
    # identity warp: warped src1/src2 == their downsampled images
    np.testing.assert_allclose(np.asarray(cost[0, ..., 0:3]),
                               np.asarray(imgs_small[0]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(cost[0, ..., 3:6]),
                               np.asarray(imgs_small[1]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(cost[0, ..., 6:9]),
                               np.asarray(imgs_small[2]), atol=1e-4)
    # variance equals the biased variance over all V views (interior pixels;
    # borders are excluded from the count mask — see test above)
    f = np.asarray(feats)
    var = f.var(axis=0)
    np.testing.assert_allclose(np.asarray(cost[0, 1:-1, 1:-1, 9:]),
                               var[1:-1, 1:-1], atol=1e-4)


def test_mvs_encoder_shapes_with_pad():
    rng = jax.random.PRNGKey(0)
    V, H, W = 3, 32, 64
    pad = 4
    imgs = jax.random.uniform(rng, (V, H, W, 3))
    eye = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], 1)
    proj = jnp.broadcast_to(eye, (V, 3, 4))
    enc = MVSEncoder(n_planes=16)
    params = enc.init(rng, imgs, proj, jnp.array([2.0, 6.0]), pad=pad)
    vol, feats, dvals = enc.apply(params, imgs, proj, jnp.array([2.0, 6.0]),
                                  pad=pad)
    assert vol.shape == (16, H // 4 + 2 * pad, W // 4 + 2 * pad, 8)
    assert feats.shape == (V, H // 4, W // 4, 32)
    assert dvals.shape == (16,)
    assert np.all(np.isfinite(np.asarray(vol)))
