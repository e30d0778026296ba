"""Round-2 fixes: use_color_volume, GAN CLI wiring, acc_grad, eval time codes,
ndc inverse, MetricLogger key union, shard_rays warning, LLFF depth injection."""
import warnings

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zest_tpu.config import ZestConfig
from zest_tpu.data.synthetic import SyntheticDataset
from zest_tpu.system import ZestSystem, TrainState, phase_for_step
from zest_tpu import geometry


def test_ndc_to_world_roundtrip():
    """ndc_to_world must be the exact inverse of world_to_ndc incl. pad."""
    key = jax.random.PRNGKey(0)
    pts = jax.random.uniform(key, (4, 5, 3), minval=-1.0, maxval=1.0) \
        + jnp.array([0.0, 0.0, 3.0])
    w2c = jnp.eye(4).at[:3, 3].set(jnp.array([0.1, -0.2, 0.3]))
    intr = jnp.array([[100.0, 0, 32.0], [0, 100.0, 24.0], [0, 0, 1.0]])
    inv_scale = jnp.array([63.0, 47.0])
    for pad in (0, 4):
        ndc = geometry.world_to_ndc(pts, w2c, intr, inv_scale, near=1.0,
                                    far=6.0, pad=pad)
        back = geometry.ndc_to_world(ndc, w2c, intr, inv_scale, near=1.0,
                                     far=6.0, pad=pad)
        np.testing.assert_allclose(np.asarray(back), np.asarray(pts),
                                   rtol=1e-4, atol=1e-4)


def _mvs_cfg(**kw):
    base = dict(train_sceneflow=False, use_mvs=True, use_mvs_dy=False, pad=4,
                num_keyframes=3, netdepth=4, netwidth=32, multires=4,
                multires_views=2, N_samples=8, batch_size=16,
                num_extra_samples=0, use_motion_mask=False,
                pts_embedder=True, dir_embedder=True, use_viewdirs=True,
                num_epochs=4)
    base.update(kw)
    return ZestConfig(**base)


def _mvs_batch():
    ds = SyntheticDataset(img_h=32, img_w=64, num_frames=9, num_keyframes=3,
                          use_mvs=True, use_mvs_dy=False)
    return {k: jnp.asarray(v) for k, v in ds[3].items()}


def test_use_color_volume_changes_behavior():
    """--use_color_volume: colors baked into the volume, one trilinear gather
    (ref opt.py:50, renderer.py:63-69). Same feature width, different sampling."""
    batch = _mvs_batch()
    cfg_off = _mvs_cfg(use_color_volume=False)
    cfg_on = _mvs_cfg(use_color_volume=True)

    sys_off = ZestSystem(cfg_off)
    params = sys_off.init_params(jax.random.PRNGKey(0), batch)
    ret_off, rays_off, _ = sys_off.forward_train(params, batch,
                                                 jax.random.PRNGKey(1),
                                                 phase_for_step(cfg_off, 0),
                                                 jnp.asarray(0))
    sys_on = ZestSystem(cfg_on)
    ret_on, rays_on, _ = sys_on.forward_train(params, batch,
                                              jax.random.PRNGKey(1),
                                              phase_for_step(cfg_on, 0),
                                              jnp.asarray(0))
    a, b = np.asarray(ret_off["rgb_map"]), np.asarray(ret_on["rgb_map"])
    assert np.all(np.isfinite(a)) and np.all(np.isfinite(b))
    # same conditioning width (the MLP accepts both paths unchanged) ...
    assert ret_off["input_feat"].shape == ret_on["input_feat"].shape
    # ... but a different sampling scheme: outputs must differ
    assert not np.allclose(a, b)
    # voxel-interpolated colors approximate exact per-point colors
    fa = np.asarray(ret_off["input_feat"])
    fb = np.asarray(ret_on["input_feat"])
    assert np.abs(fa - fb).mean() < 0.15


def test_metric_logger_key_union(tmp_path):
    """val_* columns logged after the header froze must not be dropped."""
    from zest_tpu.train_loop import MetricLogger
    lg = MetricLogger(tmp_path)
    lg.log(1, {"train_loss": 0.5})
    lg.log(2, {"val_loss": 0.25, "val_PSNR": 30.0})
    lg.close()
    text = (tmp_path / "metrics.csv").read_text()
    header = text.splitlines()[0]
    assert "val_PSNR" in header and "train_loss" in header
    assert "30.0" in text


def test_run_training_gan_path(tmp_path):
    """gan_type set → run_training builds the GAN system; D_loss is logged
    (reference dispatches the 3-optimizer branch on gan_type, train.py:640-741)."""
    from zest_tpu.train_loop import run_training
    from zest_tpu.system_gan import GanTrainState

    cfg = ZestConfig(expname="gan_toy", dataset_name="synthetic",
                     save_dir=str(tmp_path), train_sceneflow=False,
                     use_mvs=False, use_mvs_dy=False, pad=0, netdepth=4,
                     netwidth=32, multires=4, multires_views=2, N_samples=8,
                     batch_size=256, patch_size=16, gan_type="pixel",
                     gan_loss="lsgan", pts_embedder=True, dir_embedder=True,
                     use_viewdirs=True, num_epochs=1, N_vis=1, chunk=256,
                     log_every=1, img_h=24, img_w=32, seed_everything=0)
    ds = SyntheticDataset(img_h=24, img_w=32, num_frames=4, num_keyframes=3,
                          use_mvs=False, use_mvs_dy=False)
    state, system = run_training(cfg, max_steps=2,
                                 datasets={"train": ds, "val": None},
                                 quiet=True)
    assert isinstance(state, GanTrainState)
    assert int(state.step) == 2
    text = (tmp_path / "gan_toy" / "metrics.csv").read_text()
    assert "D_loss" in text and "G_loss" in text


def test_acc_grad_accumulates(tmp_path):
    """acc_grad=2 → params move only every second micro-step (optax.MultiSteps;
    reference accumulate_grad_batches, train.py:1333)."""
    import optax
    cfg = ZestConfig(train_sceneflow=True, use_mvs=False, use_mvs_dy=False,
                     pad=0, netdepth=4, netwidth=32, multires=4,
                     multires_views=2, N_samples=8, batch_size=16,
                     num_extra_samples=0, use_motion_mask=False,
                     decay_iteration=1, with_chain_loss=False, acc_grad=2,
                     pts_embedder=True, dir_embedder=True, use_viewdirs=True,
                     num_epochs=2)
    ds = SyntheticDataset(img_h=24, img_w=32, num_frames=4, num_keyframes=3,
                          use_mvs=False, use_mvs_dy=False)
    batch = {k: jnp.asarray(v) for k, v in ds[1].items()}
    system = ZestSystem(cfg)
    params = system.init_params(jax.random.PRNGKey(0), batch)
    opt = optax.MultiSteps(system.make_optimizer(2), cfg.acc_grad)
    state = TrainState(params, opt.init(params), jnp.asarray(0))
    step = system.make_train_step(opt)

    def delta(a, b):
        return sum(float(jnp.abs(x - y).sum()) for x, y in
                   zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)))

    state1, _ = step(state, batch, jax.random.PRNGKey(1),
                     phase_for_step(cfg, 0))
    assert delta(params, state1.params) == 0.0  # accumulated, not applied

    state2, _ = step(state1, batch, jax.random.PRNGKey(2),
                     phase_for_step(cfg, 1))
    assert delta(state1.params, state2.params) > 0  # applied after acc_grad steps


def test_eval_step_time_codes():
    """train_video eval must feed the time codes (ref forward_val passes them,
    networks.py:688) — round-1 bug: Dense shape mismatch at first validation."""
    cfg = ZestConfig(train_sceneflow=False, use_mvs=False, use_mvs_dy=False,
                     pad=0, netdepth=4, netwidth=32, multires=4,
                     multires_views=2, N_samples=8, batch_size=16, chunk=128,
                     train_video=True, time_code_dim=16, pts_embedder=True,
                     dir_embedder=True, use_viewdirs=True, num_epochs=4)
    ds = SyntheticDataset(img_h=24, img_w=32, num_frames=4, num_keyframes=3,
                          use_mvs=False, use_mvs_dy=False)
    batch = {k: jnp.asarray(v) for k, v in ds[1].items()}
    batch["keyframe_id"] = jnp.asarray(1, jnp.int32)
    system = ZestSystem(cfg)
    params = system.init_params(jax.random.PRNGKey(0), batch)
    maps = system.make_eval_step()(params, batch)
    assert maps["rgb_map"].shape == (24, 32, 3)
    assert np.all(np.isfinite(np.asarray(maps["rgb_map"])))


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_shard_rays_warns_on_indivisible():
    from zest_tpu.parallel import make_mesh
    from zest_tpu.parallel.mesh import shard_rays
    mesh = make_mesh(8)
    x = jnp.zeros((12, 3))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = shard_rays(x, mesh)
    assert out is x
    assert any("REPLICATED" in str(wi.message) for wi in w)


def test_host_band_bound_covers_required_band():
    """warp_band_bound_host must dominate required_band incl. pad>0 (round-1
    bug: x-spread used LANES-1 instead of the padded row width Wp-1)."""
    from zest_tpu.kernels.plane_sweep import (homography_grid, required_band,
                                              warp_band_bound_host)
    proj = np.array([[1, 0.01, 0.5, 0.3],
                     [0.08, 1, -0.3, 0.2],
                     [1e-4, 2e-4, 1, 0.01]], np.float32)
    dv = jnp.linspace(2.0, 6.0, 8)
    for pad in (0, 2, 6, 24):
        grid = homography_grid(jnp.asarray(proj), dv, (32, 128), pad=pad)
        req = int(required_band(grid, 32, 128))
        bound = warp_band_bound_host(proj, 2.0, 6.0, 32, 128, pad=pad)
        assert bound >= req, (pad, bound, req)


def _write_pfm(path, arr):
    with open(path, "wb") as f:
        f.write(b"Pf\n")
        f.write(f"{arr.shape[1]} {arr.shape[0]}\n".encode())
        f.write(b"-1.0\n")
        np.flipud(arr).astype("<f4").tofile(f)


def _make_llff_scene(tmp_path, n_views=8, seed=0):
    from PIL import Image
    scene = tmp_path / "scene0"
    (scene / "images_4").mkdir(parents=True)
    rng = np.random.default_rng(seed)
    for i in range(n_views):
        Image.fromarray(rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)) \
            .save(scene / "images_4" / f"im{i:02d}.png")
    pb = np.zeros((n_views, 17), np.float32)
    for i in range(n_views):
        c2w = np.eye(3, 4, dtype=np.float32)
        c2w[:, 3] = rng.normal(0, 0.1, 3)
        raw = np.stack([-c2w[:, 1], c2w[:, 0], c2w[:, 2], c2w[:, 3],
                        np.array([640.0, 960.0, 500.0])], 1)
        pb[i, :15] = raw.reshape(-1)
        pb[i, 15:] = [2.0, 10.0]
    np.save(scene / "poses_bounds.npy", pb)
    return scene


def test_llff_depth_injection(tmp_path):
    """depth_path set → random unrelated PFM depths reach sample['depths']
    (adversarial depth for the depth discriminator, ref data/llff.py:368-372)."""
    from zest_tpu.data.llff import LLFFDataset

    _make_llff_scene(tmp_path)
    rng = np.random.default_rng(0)

    depth_dir = tmp_path / "dtu_depths"
    depth_dir.mkdir()
    _write_pfm(depth_dir / "d0.pfm", rng.uniform(1.0, 5.0, (800, 800))
               .astype(np.float32))

    ds = LLFFDataset(tmp_path, split="train", downSample=0.1, scene="scene0",
                     depth_path=depth_dir, seed=0)
    sample = ds[0]
    assert sample["depths"].shape == (64, 96)
    assert np.abs(sample["depths"]).max() > 0  # injected, not zeros

    ds0 = LLFFDataset(tmp_path, split="train", downSample=0.1, scene="scene0",
                      depth_path=None, seed=0)
    assert np.abs(ds0[0]["depths"]).max() == 0


def test_llff_spiral_render_path(tmp_path):
    """render_spiral --render_path spiral drives the (reference-dead) LLFF
    spiral pose generator end-to-end (render_paths.run_llff_spiral)."""
    from zest_tpu.render_paths import run_llff_spiral

    _make_llff_scene(tmp_path)
    cfg = ZestConfig(expname="spiral", dataset_name="llff",
                     datadir=str(tmp_path), save_dir=str(tmp_path / "out"),
                     finetune_scene="scene0", train_sceneflow=False,
                     use_mvs=False, use_mvs_dy=False, pad=0, netdepth=4,
                     netwidth=32, multires=4, multires_views=2, N_samples=4,
                     batch_size=16, chunk=512, eval_chunk=1024,
                     imgScale_test=0.1, pts_embedder=True, dir_embedder=True,
                     use_viewdirs=True, num_epochs=1)
    out_dir = run_llff_spiral(cfg, n_poses=2, quiet=True)
    assert (out_dir / "rgb_000.png").exists()
    assert (out_dir / "depth_001.png").exists()
