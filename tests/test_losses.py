"""Loss terms vs naive NumPy implementations / closed forms."""
import numpy as np
import jax.numpy as jnp

from zest_tpu import losses


def test_distortion_loss_vs_naive_double_loop():
    rng = np.random.default_rng(0)
    R, S = 3, 9
    w = rng.uniform(0, 0.3, (R, S)).astype(np.float32)
    t = np.sort(rng.uniform(0, 1, S)).astype(np.float32)

    ours = float(losses.distortion_loss(jnp.asarray(w), jnp.asarray(t)))

    t_mids = 0.5 * (t[:-1] + t[1:])
    total = 0.0
    for r in range(R):
        pair = 0.0
        for i in range(S - 1):
            for j in range(S - 1):
                pair += w[r, i] * w[r, j] * abs(t_mids[i] - t_mids[j])
        indiv = (1 / 3) * np.sum(w[r, :-1] ** 2 * (t[1:] - t[:-1]))
        total += 0.5 * pair + indiv
    np.testing.assert_allclose(ours, total, rtol=1e-4)


def test_masked_losses_normalization():
    pred = jnp.asarray([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]])
    gt = jnp.zeros((2, 3))
    mask = jnp.asarray([[1.0], [0.0]])
    # MSE over masked row only, normalized by 3 mask entries
    exp = (1 + 4 + 9) / 3
    np.testing.assert_allclose(float(losses.mse_masked(pred, gt, mask)), exp, rtol=1e-6)
    exp_mae = (1 + 2 + 3) / 3
    np.testing.assert_allclose(float(losses.mae_masked(pred, gt, mask)), exp_mae,
                               rtol=1e-6)


def test_masked_loss_all_zero_mask_is_finite():
    pred = jnp.ones((4, 3))
    gt = jnp.zeros((4, 3))
    mask = jnp.zeros((4, 1))
    assert float(losses.mse_masked(pred, gt, mask)) == 0.0


def test_depth_loss_scale_shift_invariant():
    rng = np.random.default_rng(1)
    d = rng.normal(size=(100,)).astype(np.float32)
    a = jnp.asarray(d)
    b = jnp.asarray(3.0 * d + 7.0)  # affine transform of the same depth
    assert float(losses.compute_depth_loss(a, b)) < 1e-10


def test_sf_smooth_loss_zero_for_constant_flow():
    """Identical constant offset in Euclidean space → zero spatial smoothness."""
    rng = np.random.default_rng(2)
    pts1 = rng.uniform(-0.5, 0.5, (2, 8, 20, 3)).astype(np.float32)
    pts1[..., 2] = np.clip(pts1[..., 2], -0.5, 0.5)
    p1 = jnp.asarray(pts1)
    # zero scene flow: same points
    val = float(losses.compute_sf_smooth_loss(p1, p1, 240, 320, 300.0))
    assert val < 1e-8


def test_lke_loss_zero_for_linear_motion():
    """Piece-wise linear trajectory (post−ref == ref−prev in Euclid) → 0 kinetic loss.

    Constructed directly in Euclidean-consistent NDC by inverting the NDC transform."""
    from zest_tpu.geometry import ndc_to_euclidean
    rng = np.random.default_rng(3)
    ref = rng.uniform(-0.4, 0.4, (1, 6, 10, 3)).astype(np.float32)
    H, W, f = 240, 320, 300.0
    e_ref = np.asarray(ndc_to_euclidean(jnp.asarray(ref), H, W, f))
    delta = np.array([0.01, -0.02, 0.03], np.float32)

    def euclid_to_ndc(e):
        z = 2.0 / e[..., 2:3] + 1.0
        x = -e[..., 0:1] / e[..., 2:3] * (2 * f) / W
        y = -e[..., 1:2] / e[..., 2:3] * (2 * f) / H
        return np.concatenate([x, y, z], -1)

    post = euclid_to_ndc(e_ref + delta)
    prev = euclid_to_ndc(e_ref - delta)
    val = float(losses.compute_sf_lke_loss(jnp.asarray(ref), jnp.asarray(post),
                                           jnp.asarray(prev), H, W, f))
    assert val < 1e-8


def test_entropy_loss_zero_at_binary_weights():
    w = jnp.asarray([0.0, 1.0, 1.0, 0.0])
    assert abs(float(losses.entropy_loss_fn(w))) < 1e-6


def test_tv_and_disparity_smoothness_shapes():
    img = jnp.asarray(np.random.default_rng(4).uniform(size=(2, 8, 8, 3)),
                      dtype=jnp.float32)
    disp = jnp.asarray(np.random.default_rng(5).uniform(size=(2, 8, 8, 1)),
                       dtype=jnp.float32)
    assert np.isfinite(float(losses.get_disparity_smoothness(disp, img)))
    assert np.isfinite(float(losses.total_variation_loss(disp[..., 0])))
