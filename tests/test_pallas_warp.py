"""Pallas banded-matmul plane-sweep kernel vs the XLA oracle (interpret mode on
CPU; the same kernel compiles to MXU matmuls on TPU — verified exact there)."""
import numpy as np
import jax.numpy as jnp

from zest_tpu.ops.homography import homo_warp
from zest_tpu.kernels.plane_sweep import homo_warp_fast, required_band, \
    homography_grid


def _proj():
    p = np.array([[1, 0.01, 0.5, 0.3],
                  [0.02, 1, -0.3, 0.2],
                  [1e-4, 0, 1, 0.01]], np.float32)
    return jnp.asarray(p)


def test_pallas_warp_matches_xla_projective():
    rng = np.random.default_rng(0)
    feat = jnp.asarray(rng.normal(size=(8, 128, 3)).astype(np.float32))
    dv = jnp.linspace(2.0, 6.0, 3)
    ref, _ = homo_warp(feat, _proj(), dv, pad=2)
    out, _ = homo_warp_fast(feat, _proj(), dv, pad=2, band=8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pallas_warp_identity_and_shifts():
    rng = np.random.default_rng(1)
    feat = jnp.asarray(rng.normal(size=(8, 128, 5)).astype(np.float32))
    dv = jnp.linspace(2.0, 6.0, 2)
    eye = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], 1)
    shift = jnp.asarray(np.array([[1, 0, 0, 6.0], [0, 1, 0, 4.0],
                                  [0, 0, 1, 0]], np.float32))
    for proj, band in ((eye, 4), (shift, 6)):
        ref, _ = homo_warp(feat, proj, dv, pad=0)
        out, _ = homo_warp_fast(feat, proj, dv, pad=0, band=band)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pallas_warp_gradient_is_exact_adjoint():
    import jax
    rng = np.random.default_rng(2)
    feat = jnp.asarray(rng.normal(size=(8, 128, 3)).astype(np.float32))
    dv = jnp.linspace(2.0, 6.0, 2)
    proj = _proj()
    g = jnp.asarray(rng.normal(size=(2, 12, 132, 3)).astype(np.float32))
    gx = jax.grad(lambda f: jnp.vdot(homo_warp(f, proj, dv, pad=2)[0], g))(feat)
    gp = jax.grad(lambda f: jnp.vdot(
        homo_warp_fast(f, proj, dv, pad=2, band=8)[0], g))(feat)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx), atol=1e-4)


def test_pallas_warp_grouped_chunks_match():
    """group>1 (wider chunks per matmul) is exact given a group-aware band:
    values AND adjoint must match the group=1 kernel/XLA oracle."""
    import jax
    rng = np.random.default_rng(7)
    feat = jnp.asarray(rng.normal(size=(16, 128, 3)).astype(np.float32))
    dv = jnp.linspace(2.0, 6.0, 3)
    proj = _proj()
    ref, _ = homo_warp(feat, proj, dv, pad=2)
    for group in (2, 4):
        grid = homography_grid(proj, dv, (16, 128), pad=2)
        band = int(required_band(grid, 16, 128, gp=group * 128))
        out, _ = homo_warp_fast(feat, proj, dv, pad=2, band=band, group=group)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    g = jnp.asarray(rng.normal(size=ref.shape).astype(np.float32))
    gx = jax.grad(lambda f: jnp.vdot(homo_warp(f, proj, dv, pad=2)[0], g))(feat)
    gp_ = jax.grad(lambda f: jnp.vdot(
        homo_warp_fast(f, proj, dv, pad=2, band=16, group=4)[0], g))(feat)
    np.testing.assert_allclose(np.asarray(gp_), np.asarray(gx), atol=1e-4)


def test_band_bound_host_covers_grouped_required_band():
    """The host bound with group=G must dominate the traced required_band at
    chunk width G·128 (the preflight feeds grouped kernels)."""
    from zest_tpu.kernels.plane_sweep import warp_band_bound_host
    dv = jnp.linspace(2.0, 6.0, 3)
    for group in (1, 2, 4):
        grid = homography_grid(_proj(), dv, (32, 128), pad=4)
        req = int(required_band(grid, 32, 128, gp=group * 128))
        bound = warp_band_bound_host(np.asarray(_proj()), 2.0, 6.0, 32, 128,
                                     pad=4, group=group)
        assert bound >= req, (group, bound, req)


def test_grouped_band_bound_flagship_geometry():
    """Flagship feature geometry (72x128 features, pad=24 -> 120x176 padded
    output, chunks WRAP the 176-px rows): the synthetic dataset's host bound
    with group=4 must cover the traced required_band, and the grouped kernel
    must match the XLA oracle at that band."""
    from zest_tpu.data.synthetic import SyntheticDataset
    from zest_tpu.kernels.plane_sweep import warp_band_bound_host
    ds = SyntheticDataset(img_h=288, img_w=512, num_frames=6, num_keyframes=2,
                          use_mvs=True, use_mvs_dy=True)
    bound = int(ds.warp_band_bound(pad=24, group=4))
    ref_inv = np.linalg.inv(ds._proj_mat(np.linalg.inv(ds._pose(ds.key_frames[0]))))
    rel = jnp.asarray((ds._proj_mat(np.linalg.inv(ds._pose(3))) @ ref_inv)[:3])
    dv = jnp.linspace(2.0, 6.0, 2)
    grid = homography_grid(rel, dv, (72, 128), pad=24)
    req = int(required_band(grid, 72, 128, gp=4 * 128))
    assert bound >= req, (bound, req)

    rng = np.random.default_rng(11)
    feat = jnp.asarray(rng.normal(size=(72, 128, 2)).astype(np.float32))
    ref, _ = homo_warp(feat, rel, dv, pad=24)
    out, _ = homo_warp_fast(feat, rel, dv, pad=24, band=bound, group=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_required_band_is_sufficient():
    dv = jnp.linspace(2.0, 6.0, 3)
    grid = homography_grid(_proj(), dv, (8, 128), pad=2)
    band = int(required_band(grid, 8, 128))
    assert 1 <= band <= 8
    rng = np.random.default_rng(3)
    feat = jnp.asarray(rng.normal(size=(8, 128, 3)).astype(np.float32))
    ref, _ = homo_warp(feat, _proj(), dv, pad=2)
    out, _ = homo_warp_fast(feat, _proj(), dv, pad=2, band=band)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_fallback_for_nonstandard_width():
    """w != 128 silently uses the XLA path (same results by construction)."""
    rng = np.random.default_rng(4)
    feat = jnp.asarray(rng.normal(size=(8, 64, 3)).astype(np.float32))
    dv = jnp.linspace(2.0, 6.0, 2)
    ref, _ = homo_warp(feat, _proj(), dv, pad=0)
    out, _ = homo_warp_fast(feat, _proj(), dv, pad=0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
