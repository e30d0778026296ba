"""Pallas z-banded trilinear sampling kernel vs the XLA grid_sample_3d oracle
(interpret mode on CPU; same kernel compiles to MXU matmuls on TPU)."""
import numpy as np
import jax
import jax.numpy as jnp

from zest_tpu.ops.grid_sample import grid_sample_3d
from zest_tpu.kernels.trilinear import sample_volume_zbanded, _precompute


def _banded_ndc(rng, R, S, D, jitter=True):
    """NDC points mimicking sampling.build_rays: random x/y, linspace+jitter z."""
    xy = rng.uniform(-0.05, 1.05, size=(R, S, 2))     # incl. slight OOB
    z = np.broadcast_to(np.linspace(0.0, 1.0, S), (R, S)).copy()
    if jitter and S > 1:
        half = 0.5 / (S - 1)
        z += rng.uniform(-half, half, size=(R, S))
        z = np.clip(z, 0.0, 1.0)
    return jnp.asarray(np.concatenate([xy, z[..., None]], -1,
                                      dtype=np.float32))


def test_trilinear_kernel_matches_oracle():
    rng = np.random.default_rng(0)
    D, Hv, Wv, C = 16, 12, 20, 8
    vol = jnp.asarray(rng.normal(size=(D, Hv, Wv, C)).astype(np.float32))
    ndc = _banded_ndc(rng, R=37, S=16, D=D)           # R not a chunk multiple
    ref = grid_sample_3d(vol, ndc * 2.0 - 1.0, padding_mode="zeros")
    out = sample_volume_zbanded(vol, ndc, band=3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_trilinear_kernel_odd_channels_and_unequal_SD():
    """C not a lane-friendly number; S != D (z-band scales by (D-1)/(S-1))."""
    rng = np.random.default_rng(1)
    D, Hv, Wv, C = 32, 9, 13, 5
    vol = jnp.asarray(rng.normal(size=(D, Hv, Wv, C)).astype(np.float32))
    ndc = _banded_ndc(rng, R=20, S=8, D=D)
    ref = grid_sample_3d(vol, ndc * 2.0 - 1.0, padding_mode="zeros")
    # scale (D-1)/(S-1) = 31/7 ≈ 4.43 → band ceil+2 = 7
    out = sample_volume_zbanded(vol, ndc, band=7)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_trilinear_kernel_gradient_matches_oracle():
    rng = np.random.default_rng(2)
    D, Hv, Wv, C = 16, 10, 16, 8
    vol = jnp.asarray(rng.normal(size=(D, Hv, Wv, C)).astype(np.float32))
    ndc = _banded_ndc(rng, R=140, S=16, D=D)
    g = jnp.asarray(rng.normal(size=(140, 16, C)).astype(np.float32))

    gx = jax.grad(lambda v: jnp.vdot(
        grid_sample_3d(v, ndc * 2.0 - 1.0, padding_mode="zeros"), g))(vol)
    gp = jax.grad(lambda v: jnp.vdot(
        sample_volume_zbanded(v, ndc, band=3), g))(vol)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                               rtol=1e-4, atol=1e-4)


def test_trilinear_out_of_band_falls_back_exactly():
    """Points violating the z-band (e.g. scene-flow-warped z) must take the XLA
    fallback branch — results stay exact, never silently banded."""
    rng = np.random.default_rng(3)
    D, Hv, Wv, C = 16, 8, 12, 4
    vol = jnp.asarray(rng.normal(size=(D, Hv, Wv, C)).astype(np.float32))
    ndc = jnp.asarray(rng.uniform(0, 1, size=(25, 6, 3)).astype(np.float32))
    # fully random z: spans the whole volume per sample → ok=False
    _, _, _, _, _, ok = _precompute(ndc, D, Hv, Wv, 3)
    assert not bool(ok)
    ref = grid_sample_3d(vol, ndc * 2.0 - 1.0, padding_mode="zeros")
    out = sample_volume_zbanded(vol, ndc, band=3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_trilinear_eval_grid_points():
    """Unjittered (eval) z — exact linspace — is banded by construction."""
    rng = np.random.default_rng(4)
    D, Hv, Wv, C = 16, 8, 12, 8
    vol = jnp.asarray(rng.normal(size=(D, Hv, Wv, C)).astype(np.float32))
    ndc = _banded_ndc(rng, R=64, S=16, D=D, jitter=False)
    _, _, _, _, _, ok = _precompute(ndc, D, Hv, Wv, 3)
    assert bool(ok)
    ref = grid_sample_3d(vol, ndc * 2.0 - 1.0, padding_mode="zeros")
    out = sample_volume_zbanded(vol, ndc, band=3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_trilinear_kernel_in_full_forward():
    """forward_train with the kernel enabled matches the XLA path exactly
    (f32, CPU interpret) — including the dynamic volume's unwarped pass."""
    from zest_tpu.config import ZestConfig
    from zest_tpu.data.synthetic import SyntheticDataset
    from zest_tpu.system import ZestSystem, phase_for_step

    def run(use_kernel):
        cfg = ZestConfig(train_sceneflow=True, use_mvs=True, use_mvs_dy=True,
                         pad=4, num_keyframes=3, netdepth=4, netwidth=32,
                         multires=4, multires_views=2, N_samples=8,
                         batch_size=16, num_extra_samples=0,
                         use_motion_mask=False, decay_iteration=1,
                         with_chain_loss=False, pts_embedder=True,
                         dir_embedder=True, use_viewdirs=True, num_epochs=2,
                         use_pallas_trilinear=use_kernel)
        ds = SyntheticDataset(img_h=32, img_w=64, num_frames=9,
                              num_keyframes=3, use_mvs=True, use_mvs_dy=True)
        batch = {k: jnp.asarray(v) for k, v in ds[3].items()}
        system = ZestSystem(cfg)
        params = system.init_params(jax.random.PRNGKey(0), batch)
        ret, _, _ = system.forward_train(params, batch, jax.random.PRNGKey(1),
                                         phase_for_step(cfg, 0),
                                         jnp.asarray(0))
        return ret

    a = run(False)
    b = run(True)
    for k in ("rgb_map", "rgb_map_ref", "depth_map_ref"):
        np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                                   rtol=2e-5, atol=2e-5, err_msg=k)


def test_trilinear_diff_matches_oracle_fwd_and_grads():
    """sample_volume_zbanded_diff: fwd + d/d vol + d/d ndc vs XLA autodiff."""
    from zest_tpu.kernels.trilinear import sample_volume_zbanded_diff
    rng = np.random.default_rng(5)
    D, Hv, Wv, C = 16, 10, 16, 8
    vol = jnp.asarray(rng.normal(size=(D, Hv, Wv, C)).astype(np.float32))
    base = _banded_ndc(rng, R=70, S=16, D=D)
    # small flow-like perturbation keeps sites in a wider band
    flow = jnp.asarray(rng.normal(scale=0.01, size=(70, 16, 3))
                       .astype(np.float32))
    ndc = jnp.clip(base + flow, 0.0, 1.0)
    g = jnp.asarray(rng.normal(size=(70, 16, C)).astype(np.float32))

    out_ref = grid_sample_3d(vol, ndc * 2.0 - 1.0, padding_mode="zeros")
    out = sample_volume_zbanded_diff(vol, ndc, band=6)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               rtol=1e-5, atol=1e-5)

    def loss_ref(v, n):
        return jnp.vdot(grid_sample_3d(v, n * 2.0 - 1.0,
                                       padding_mode="zeros"), g)

    def loss_kern(v, n):
        return jnp.vdot(sample_volume_zbanded_diff(v, n, band=6), g)

    gv_ref, gn_ref = jax.grad(loss_ref, argnums=(0, 1))(vol, ndc)
    gv, gn = jax.grad(loss_kern, argnums=(0, 1))(vol, ndc)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(gv_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gn), np.asarray(gn_ref),
                               rtol=1e-4, atol=2e-4)


def test_trilinear_diff_out_of_band_fallback_grads():
    """Band violation → XLA branch, grads still flow (and match the oracle)."""
    from zest_tpu.kernels.trilinear import sample_volume_zbanded_diff
    rng = np.random.default_rng(6)
    D, Hv, Wv, C = 16, 8, 12, 4
    vol = jnp.asarray(rng.normal(size=(D, Hv, Wv, C)).astype(np.float32))
    ndc = jnp.asarray(rng.uniform(0, 1, size=(20, 6, 3)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(20, 6, C)).astype(np.float32))

    gv_ref, gn_ref = jax.grad(
        lambda v, n: jnp.vdot(grid_sample_3d(v, n * 2.0 - 1.0,
                                             padding_mode="zeros"), g),
        argnums=(0, 1))(vol, ndc)
    gv, gn = jax.grad(
        lambda v, n: jnp.vdot(sample_volume_zbanded_diff(v, n, band=3), g),
        argnums=(0, 1))(vol, ndc)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(gv_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gn), np.asarray(gn_ref),
                               rtol=1e-5, atol=1e-5)


def test_trilinear_diff_hoisted_paired_matches():
    """Caller-hoisted paired build (prepare_warped_paired, shared across two
    sample calls — flags.HOIST_WARPED_PAIRED path): values and grads match
    the per-call-build form, including d/d vol THROUGH the hoisted build."""
    from zest_tpu.kernels.trilinear import (prepare_warped_paired,
                                            sample_volume_zbanded_diff)
    rng = np.random.default_rng(7)
    D, Hv, Wv, C = 16, 8, 12, 4
    vol = jnp.asarray(rng.normal(size=(D, Hv, Wv, C)).astype(np.float32))
    ndc_a = jnp.asarray(rng.uniform(0, 1, size=(20, 6, 3)).astype(np.float32))
    ndc_b = jnp.asarray(rng.uniform(0, 1, size=(10, 6, 3)).astype(np.float32))
    g_a = jnp.asarray(rng.normal(size=(20, 6, C)).astype(np.float32))
    g_b = jnp.asarray(rng.normal(size=(10, 6, C)).astype(np.float32))

    def loss(v, na, nb, hoist):
        p = prepare_warped_paired(v, approx=False) if hoist else None
        out_a = sample_volume_zbanded_diff(v, na, band=3, paired=p)
        out_b = sample_volume_zbanded_diff(v, nb, band=3, paired=p)
        return jnp.vdot(out_a, g_a) + jnp.vdot(out_b, g_b)

    va, ga = jax.value_and_grad(loss, argnums=(0, 1, 2))(vol, ndc_a, ndc_b,
                                                         False)
    vb, gb = jax.value_and_grad(loss, argnums=(0, 1, 2))(vol, ndc_a, ndc_b,
                                                         True)
    np.testing.assert_allclose(float(va), float(vb), rtol=1e-6)
    for x, y, nm in zip(ga, gb, ("d_vol", "d_ndc_a", "d_ndc_b")):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-5, atol=1e-5, err_msg=nm)


def test_hoist_flag_full_forward_matches():
    """forward_train under flags.HOIST_WARPED_PAIRED matches the default
    per-call-build trace (f32 CPU; warped t±1 + chain passes engaged)."""
    from zest_tpu import flags
    from zest_tpu.config import ZestConfig
    from zest_tpu.data.synthetic import SyntheticDataset
    from zest_tpu.system import ZestSystem, phase_for_step

    def run(hoist):
        old = flags.HOIST_WARPED_PAIRED
        flags.HOIST_WARPED_PAIRED = hoist
        try:
            cfg = ZestConfig(train_sceneflow=True, use_mvs=True,
                             use_mvs_dy=True, pad=4, num_keyframes=3,
                             netdepth=4, netwidth=32, multires=4,
                             multires_views=2, N_samples=8, batch_size=16,
                             num_extra_samples=0, use_motion_mask=False,
                             decay_iteration=1, with_chain_loss=True,
                             pts_embedder=True, dir_embedder=True,
                             use_viewdirs=True, num_epochs=2)
            ds = SyntheticDataset(img_h=32, img_w=64, num_frames=9,
                                  num_keyframes=3, use_mvs=True,
                                  use_mvs_dy=True)
            batch = {k: jnp.asarray(v) for k, v in ds[3].items()}
            system = ZestSystem(cfg)
            params = system.init_params(jax.random.PRNGKey(0), batch)
            # step 2001 > decay·1000·2 → chain_5frames on: BOTH warped sample
            # calls (t±1 stacked + t±2 chain) consume the shared build
            ret, _, _ = system.forward_train(params, batch,
                                             jax.random.PRNGKey(1),
                                             phase_for_step(cfg, 2001),
                                             jnp.asarray(2001))
            return ret
        finally:
            flags.HOIST_WARPED_PAIRED = old

    a = run(False)
    b = run(True)
    for k in ("rgb_map", "rgb_map_ref", "rgb_map_prev_dy", "rgb_map_pp_dy"):
        np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                                   rtol=2e-5, atol=2e-5, err_msg=k)
