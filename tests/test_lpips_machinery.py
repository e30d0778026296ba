"""LPIPS machinery end-to-end with synthetic weights (real torch-converted
weights are unobtainable in this zero-egress image — the machinery is exercised
fully so that dropping in a converted .npz lights up metric parity)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zest_tpu.models.lpips import load_lpips, make_random_lpips_npz


def test_lpips_distance_properties(tmp_path):
    path = tmp_path / "lpips.npz"
    make_random_lpips_npz(path, seed=0)
    fn = load_lpips(path)
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.uniform(0, 1, (32, 48, 3)).astype(np.float32))
    b = jnp.asarray(rng.uniform(0, 1, (32, 48, 3)).astype(np.float32))
    d_ab = float(fn(a, b))
    d_aa = float(fn(a, a))
    assert np.isfinite(d_ab) and d_ab > 0
    assert abs(d_aa) < 1e-6


def test_run_test_reports_lpips(tmp_path):
    from zest_tpu.config import ZestConfig
    from zest_tpu.data.synthetic import SyntheticDataset
    from zest_tpu.train_loop import run_test

    wpath = tmp_path / "lpips.npz"
    make_random_lpips_npz(wpath, seed=0)
    cfg = ZestConfig(expname="lp", dataset_name="synthetic",
                     save_dir=str(tmp_path), train_sceneflow=True,
                     use_mvs=False, use_mvs_dy=False, pad=0, netdepth=4,
                     netwidth=32, multires=4, multires_views=2, N_samples=8,
                     batch_size=32, num_extra_samples=0, use_motion_mask=False,
                     decay_iteration=1, with_chain_loss=False,
                     pts_embedder=True, dir_embedder=True, use_viewdirs=True,
                     num_epochs=1, chunk=256, img_h=48, img_w=64,
                     lpips_weights=str(wpath))
    ds = SyntheticDataset(img_h=48, img_w=64, num_frames=4, num_keyframes=3,
                          use_mvs=False, use_mvs_dy=False)
    out = run_test(cfg, datasets={"test": ds}, quiet=True)
    assert "val_LPIPS" in out and np.isfinite(out["val_LPIPS"])
    assert "LPIPS" in (tmp_path / "lp" / "test_metrics.txt").read_text()


def test_maybe_lpips_errors_loudly_on_bad_file(tmp_path):
    from zest_tpu.config import ZestConfig
    from zest_tpu.train_loop import _maybe_lpips

    bad = tmp_path / "corrupt.npz"
    bad.write_bytes(b"not an npz")
    cfg = ZestConfig(lpips_weights=str(bad))
    with pytest.raises(RuntimeError, match="lpips"):
        _maybe_lpips(cfg)


def test_gan_perceptual_loss_with_weights(tmp_path):
    from zest_tpu.config import ZestConfig
    from zest_tpu.data.synthetic import SyntheticDataset
    from zest_tpu.system import ZestSystem, phase_for_step
    from zest_tpu.system_gan import GanSystem

    wpath = tmp_path / "lpips.npz"
    make_random_lpips_npz(wpath, seed=0)
    cfg = ZestConfig(train_sceneflow=False, use_mvs=False, use_mvs_dy=False,
                     pad=0, netdepth=4, netwidth=32, multires=4,
                     multires_views=2, N_samples=8, batch_size=1024,
                     patch_size=32, gan_type="pixel", gan_loss="lsgan",
                     with_perceptual_loss=True, lambda_perc=0.5,
                     lpips_weights=str(wpath), pts_embedder=True,
                     dir_embedder=True, use_viewdirs=True, num_epochs=4)
    ds = SyntheticDataset(img_h=48, img_w=64, num_frames=4, num_keyframes=3,
                          use_mvs=False, use_mvs_dy=False)
    batch = {k: jnp.asarray(v) for k, v in ds[1].items()}
    gan = GanSystem(ZestSystem(cfg))
    assert gan._lpips is not None
    state = gan.init(jax.random.PRNGKey(0), batch, steps_per_epoch=4)
    step_fn = gan.make_train_step(gan.system.make_optimizer(4),
                                  gan.make_disc_optimizer(4))
    state2, logs = step_fn(state, batch, jax.random.PRNGKey(1),
                           phase_for_step(cfg, 0))
    assert np.isfinite(float(logs["G_loss"]))
    assert int(state2.step) == 1
