"""Compositing / geometry / embedding unit tests vs closed forms."""
import numpy as np
import jax
import jax.numpy as jnp

from zest_tpu import geometry
from zest_tpu.models.embedding import positional_encoding, embedding_out_channels
from zest_tpu.render import raw2alpha, raw2outputs, raw2outputs_blending


def test_embedding_layout_and_channels():
    x = jnp.array([[0.5, -0.25, 1.0]])
    out = positional_encoding(x, 3)
    assert out.shape == (1, embedding_out_channels(3, 3)) == (1, 21)
    # layout: [x, sin(1x), cos(1x), sin(2x), cos(2x), sin(4x), cos(4x)]
    np.testing.assert_allclose(out[0, :3], x[0], atol=1e-6)
    np.testing.assert_allclose(out[0, 3:6], np.sin(np.asarray(x[0])), atol=1e-6)
    np.testing.assert_allclose(out[0, 6:9], np.cos(np.asarray(x[0])), atol=1e-6)
    np.testing.assert_allclose(out[0, 9:12], np.sin(2 * np.asarray(x[0])), atol=1e-6)


def test_raw2alpha_single_opaque_sample():
    """One very dense sample: alpha→1, all weight on it, rest ~0."""
    sigma = jnp.zeros((1, 5)).at[0, 2].set(1e6)
    dists = jnp.ones((1, 5))
    alpha, weights = raw2alpha(sigma, dists)
    np.testing.assert_allclose(np.asarray(alpha[0, 2]), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(weights[0, 2]), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(weights[0, 3:]), 0.0, atol=1e-5)


def test_raw2alpha_transmittance_closed_form():
    rng = np.random.default_rng(0)
    sigma = jnp.asarray(rng.uniform(0, 2, (3, 8)).astype(np.float32))
    dists = jnp.asarray(rng.uniform(0.1, 0.5, (3, 8)).astype(np.float32))
    alpha, weights = raw2alpha(sigma, dists)
    a = np.asarray(alpha)
    T = np.cumprod(np.concatenate([np.ones((3, 1)), 1 - a + 1e-10], -1), -1)[:, :-1]
    np.testing.assert_allclose(np.asarray(weights), a * T, rtol=1e-5)


def test_raw2outputs_opaque_surface_color():
    """Opaque sample at depth z renders its (sigmoided) color and depth z."""
    S = 6
    raw = np.zeros((2, S, 4), np.float32)
    raw[:, 3, 3] = 1e6           # opaque at sample 3
    raw[:, 3, :3] = [10.0, -10.0, 0.0]  # sigmoid → (1, 0, 0.5)
    z_vals = np.broadcast_to(np.linspace(2, 6, S, dtype=np.float32), (2, S))
    dists = np.ones((2, S), np.float32)
    rgb, disp, acc, w, depth, alpha = raw2outputs(jnp.asarray(raw),
                                                  jnp.asarray(z_vals),
                                                  jnp.asarray(dists))
    np.testing.assert_allclose(np.asarray(rgb[0]), [1.0, 0.0, 0.5], atol=1e-4)
    np.testing.assert_allclose(np.asarray(depth[0]), z_vals[0, 3], atol=1e-3)
    np.testing.assert_allclose(np.asarray(acc[0]), 1.0, atol=1e-4)


def test_blending_reduces_to_static_when_blendw_zero():
    """blend_w = 0 ⇒ blended render == pure static render."""
    rng = np.random.default_rng(1)
    R, S = 4, 16
    raw_dy = jnp.asarray(rng.normal(size=(R, S, 4)).astype(np.float32))
    raw_rig = jnp.asarray(rng.normal(size=(R, S, 4)).astype(np.float32))
    z_vals = jnp.broadcast_to(jnp.linspace(2, 6, S), (R, S))
    dists = jnp.ones((R, S))
    blend_w = jnp.zeros((R, S))

    rgb_b, depth_b, rgb_fg, depth_fg, w_fg, w_dy = raw2outputs_blending(
        raw_dy, raw_rig, blend_w, z_vals, dists)
    rgb_s, _, _, w_s, depth_s, _ = raw2outputs(raw_rig, z_vals, dists)
    np.testing.assert_allclose(np.asarray(rgb_b), np.asarray(rgb_s), atol=1e-5)
    assert np.allclose(np.asarray(w_dy), 0.0)


def test_blending_two_field_transmittance():
    """blend_w = 1 ⇒ blended == pure dynamic."""
    rng = np.random.default_rng(2)
    R, S = 3, 12
    raw_dy = jnp.asarray(rng.normal(size=(R, S, 4)).astype(np.float32))
    raw_rig = jnp.asarray(rng.normal(size=(R, S, 4)).astype(np.float32))
    z_vals = jnp.broadcast_to(jnp.linspace(2, 6, S), (R, S))
    dists = jnp.ones((R, S))
    blend_w = jnp.ones((R, S))
    rgb_b, *_ = raw2outputs_blending(raw_dy, raw_rig, blend_w, z_vals, dists)
    rgb_d, *_ = raw2outputs(raw_dy, z_vals, dists)
    np.testing.assert_allclose(np.asarray(rgb_b), np.asarray(rgb_d), atol=1e-5)


def test_ndc_euclidean_roundtrip():
    """world → ref-view NDC → Euclidean recovers camera-space points for an identity
    reference camera (NDC z formula and the forward-facing convention)."""
    H, W, f = 240.0, 320.0, 300.0
    intr = jnp.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1.0]])
    w2c = jnp.eye(4)
    inv_scale = jnp.array([W - 1, H - 1])
    pts = jnp.array([[[0.3, -0.2, 4.0], [1.0, 0.5, 3.0]]])  # [1, 2, 3] camera space
    ndc = geometry.world_to_ndc(pts, w2c, intr, inv_scale, near=2.0, far=6.0)
    assert ndc.shape == (1, 2, 3)
    # z: (4-2)/(6-2) = 0.5
    np.testing.assert_allclose(np.asarray(ndc[0, 0, 2]), 0.5, atol=1e-6)
    # x pixel: f*0.3/4 + W/2 normalized by W-1
    np.testing.assert_allclose(np.asarray(ndc[0, 0, 0]),
                               (f * 0.3 / 4.0 + W / 2) / (W - 1), atol=1e-6)


def test_ndc_pad_correction():
    H, W = 240.0, 320.0
    intr = jnp.array([[300.0, 0, W / 2], [0, 300.0, H / 2], [0, 0, 1.0]])
    inv_scale = jnp.array([W - 1, H - 1])
    pts = jnp.array([[[0.0, 0.0, 4.0]]])
    pad = 24
    ndc0 = geometry.world_to_ndc(pts, jnp.eye(4), intr, inv_scale, 2.0, 6.0, pad=0)
    ndc_p = geometry.world_to_ndc(pts, jnp.eye(4), intr, inv_scale, 2.0, 6.0, pad=pad)
    w_feat = (W - 1 + 1) / 4.0
    h_feat = (H - 1 + 1) / 4.0
    exp_x = ndc0[0, 0, 0] * w_feat / (w_feat + 2 * pad) + pad / (w_feat + 2 * pad)
    exp_y = ndc0[0, 0, 1] * h_feat / (h_feat + 2 * pad) + pad / (h_feat + 2 * pad)
    np.testing.assert_allclose(np.asarray(ndc_p[0, 0, 0]), np.asarray(exp_x), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ndc_p[0, 0, 1]), np.asarray(exp_y), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ndc_p[0, 0, 2]), np.asarray(ndc0[0, 0, 2]),
                               atol=1e-6)


def test_ndc_to_euclidean_formula():
    ndc = jnp.array([[0.2, -0.1, 0.5]])
    out = geometry.ndc_to_euclidean(ndc, 240, 320, 300.0)
    z_e = 2.0 / (0.5 - 1.0)
    np.testing.assert_allclose(np.asarray(out[0, 2]), z_e, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[0, 0]), -0.2 * z_e * 320 / 600, atol=1e-6)


def test_depth2dist_last_infinite():
    z = jnp.array([[1.0, 2.0, 4.0]])
    cos = jnp.array([[2.0]])
    d = geometry.depth2dist(z, cos)
    np.testing.assert_allclose(np.asarray(d[0, :2]), [2.0, 4.0])
    assert np.asarray(d[0, 2]) > 1e9
