"""End-to-end system tests on the synthetic dataset: step runs, loss is finite,
overfit drives loss down (pure-NSFF config), volumes path compiles (tiny shapes)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zest_tpu.config import ZestConfig
from zest_tpu.data.synthetic import SyntheticDataset
from zest_tpu.system import ZestSystem, TrainState, phase_for_step


def to_device(sample):
    return {k: jnp.asarray(v) for k, v in sample.items()}


def tiny_sf_cfg(**kw):
    """Pure-NSFF overfit config (configs_overfit/config_kid-running.txt shape):
    train_sceneflow on, volumes off, pad 0."""
    base = dict(train_sceneflow=True, use_mvs=False, use_mvs_dy=False, pad=0,
                netdepth=8, netwidth=32, multires=4, multires_views=2,
                N_samples=16, batch_size=32, num_extra_samples=8,
                use_motion_mask=True, decay_iteration=1, with_chain_loss=True,
                pts_embedder=True, dir_embedder=True, use_viewdirs=True,
                num_epochs=10, raw_noise_std=0.0, lrate=5e-4)
    base.update(kw)
    return ZestConfig(**base)


@pytest.fixture(scope="module")
def sf_setup():
    cfg = tiny_sf_cfg()
    ds = SyntheticDataset(img_h=24, img_w=32, num_frames=8, num_keyframes=3,
                          use_mvs=False, use_mvs_dy=False)
    batch = to_device(ds[3])
    sys = ZestSystem(cfg)
    params = sys.init_params(jax.random.PRNGKey(0), batch)
    opt = sys.make_optimizer(steps_per_epoch=8)
    state = TrainState(params, opt.init(params), jnp.asarray(0))
    step_fn = sys.make_train_step(opt)
    return cfg, ds, sys, state, step_fn


def test_train_step_runs_and_is_finite(sf_setup):
    cfg, ds, sys, state, step_fn = sf_setup
    batch = to_device(ds[3])
    phase = phase_for_step(cfg, 0)
    state2, logs = step_fn(state, batch, jax.random.PRNGKey(1), phase)
    assert int(state2.step) == 1
    for k, v in logs.items():
        assert np.isfinite(float(v)), f"non-finite {k}"
    # params actually changed somewhere (heads behind a dead ReLU may have zero
    # grad at init — the reference behaves identically)
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(state.params),
                        jax.tree_util.tree_leaves(state2.params)))
    assert changed


def test_overfit_loss_decreases(sf_setup):
    cfg, ds, sys, state, step_fn = sf_setup
    batch = to_device(ds[3])
    phase = phase_for_step(cfg, 0)
    rng = jax.random.PRNGKey(2)
    first_loss = None
    for i in range(60):
        rng, k = jax.random.split(rng)
        state, logs = step_fn(state, batch, k, phase)
        if first_loss is None:
            first_loss = float(logs["train_loss"])
    last_loss = float(logs["train_loss"])
    assert last_loss < first_loss * 0.9, (first_loss, last_loss)
    assert float(logs["train_PSNR"]) > 0


def test_phase_flip_recompile(sf_setup):
    """chain_5frames phase changes the graph but still runs (one retrace)."""
    cfg, ds, sys, state, step_fn = sf_setup
    batch = to_device(ds[3])
    phase = phase_for_step(cfg, cfg.decay_iteration * 1000 * 2 + 1)
    assert phase.chain_5frames and not phase.extra_samples
    state2, logs = step_fn(state, batch, jax.random.PRNGKey(3), phase)
    assert np.isfinite(float(logs["train_loss"]))


def test_eval_step_full_image(sf_setup):
    cfg, ds, sys, state, step_fn = sf_setup
    batch = to_device(ds[3])
    eval_fn = sys.make_eval_step()
    maps = eval_fn(state.params, batch)
    H, W = 24, 32
    assert maps["rgb_map_ref"].shape == (H, W, 3)
    assert maps["depth_map_ref"].shape == (H, W)
    assert np.all(np.isfinite(np.asarray(maps["rgb_map_ref"])))


def test_eval_path_step_matches_per_pose(sf_setup):
    """Pose-batched path eval (make_eval_path_step) must reproduce the
    per-pose eval_step maps exactly: same volumes, same rays, the target
    camera substituted in the last slot (render_paths pose batching)."""
    cfg, ds, sys, state, step_fn = sf_setup
    batch = to_device(ds[3])
    other = to_device(ds[5])
    # two target poses: the batch's own and frame 5's target camera
    path_c2ws = jnp.stack([batch["c2ws"][-1], other["c2ws"][-1]])
    path_w2cs = jnp.stack([batch["w2cs"][-1], other["w2cs"][-1]])

    path_fn = sys.make_eval_path_step()
    maps_p = path_fn(state.params, batch, path_c2ws, path_w2cs)

    eval_fn = sys.make_eval_step()
    for i in range(2):
        b = dict(batch)
        b["c2ws"] = batch["c2ws"].at[-1].set(path_c2ws[i])
        b["w2cs"] = batch["w2cs"].at[-1].set(path_w2cs[i])
        maps_i = eval_fn(state.params, b)
        for k in maps_i:
            np.testing.assert_allclose(np.asarray(maps_p[k][i]),
                                       np.asarray(maps_i[k]),
                                       rtol=1e-5, atol=1e-5, err_msg=k)


def test_full_zest_with_volumes_step():
    """Full ZeST config (both encoding volumes) on tiny shapes — one step."""
    # feature space is H/4 x W/4; CostRegNet needs (h+2p, w+2p) divisible by 8.
    # num_frames=9 so the keyframe interval rule yields exactly 3 keyframes.
    cfg = tiny_sf_cfg(use_mvs=True, use_mvs_dy=True, pad=4, num_keyframes=3)
    ds = SyntheticDataset(img_h=32, img_w=64, num_frames=9, num_keyframes=3,
                          use_mvs=True, use_mvs_dy=True)
    batch = to_device(ds[3])
    sys = ZestSystem(cfg)
    params = sys.init_params(jax.random.PRNGKey(0), batch)
    opt = sys.make_optimizer(steps_per_epoch=8)
    state = TrainState(params, opt.init(params), jnp.asarray(0))
    step_fn = sys.make_train_step(opt)
    state2, logs = step_fn(state, batch, jax.random.PRNGKey(1),
                           phase_for_step(cfg, 0))
    for k, v in logs.items():
        assert np.isfinite(float(v)), f"non-finite {k}"
