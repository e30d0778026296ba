"""Aux subsystems: time codes, CNN introspection, prefetch pipeline."""
import numpy as np
import jax
import jax.numpy as jnp

from zest_tpu.config import ZestConfig
from zest_tpu.data.synthetic import SyntheticDataset
from zest_tpu.system import ZestSystem, TrainState, phase_for_step


def test_time_codes_training_path():
    """train_video: learnable latent codes concatenated to the point embedding
    with 10x lr (train.py:92-99, 271-272)."""
    cfg = ZestConfig(train_sceneflow=False, use_mvs=False, use_mvs_dy=False,
                     pad=0, netdepth=4, netwidth=32, multires=4,
                     multires_views=2, N_samples=8, batch_size=16,
                     train_video=True, time_code_dim=16, pts_embedder=True,
                     dir_embedder=True, use_viewdirs=True, num_epochs=4)
    ds = SyntheticDataset(img_h=24, img_w=32, num_frames=4, num_keyframes=3,
                          use_mvs=False, use_mvs_dy=False)
    batch = {k: jnp.asarray(v) for k, v in ds[1].items()}
    batch["keyframe_id"] = jnp.asarray(1, jnp.int32)
    system = ZestSystem(cfg)
    params = system.init_params(jax.random.PRNGKey(0), batch)
    assert params["time_codes"].shape == (40, 16)
    opt = system.make_optimizer(4)
    state = TrainState(params, opt.init(params), jnp.asarray(0))
    step = system.make_train_step(opt)
    state2, logs = step(state, batch, jax.random.PRNGKey(1),
                        phase_for_step(cfg, 0))
    assert np.isfinite(float(logs["train_loss"]))
    # the selected code received gradient; others untouched
    diff = np.abs(np.asarray(state2.params["time_codes"])
                  - np.asarray(params["time_codes"])).sum(-1)
    assert diff[1] > 0
    assert np.allclose(diff[0], 0)


def test_cnn_introspection_dumps(tmp_path):
    from zest_tpu.models.mvsnet import MVSEncoder
    from zest_tpu.utils.introspect import dump_encoder_activations, feat2viz

    enc = MVSEncoder(n_planes=8)
    imgs = jax.random.uniform(jax.random.PRNGKey(0), (3, 32, 64, 3))
    eye = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], 1)
    proj = jnp.broadcast_to(eye, (3, 3, 4))
    params = enc.init(jax.random.PRNGKey(1), imgs, proj, jnp.array([2.0, 6.0]),
                      pad=4)
    captured = dump_encoder_activations(enc, params, imgs, proj,
                                        jnp.array([2.0, 6.0]), 4, tmp_path)
    assert any("feature" in k for k in captured)
    assert any("cost_reg_2" in k for k in captured)
    assert (tmp_path / "cost_vol" / "tensors" / "volume_feat.npy").exists()
    assert len(list((tmp_path / "2cnn_vis" / "feat2viz").glob("*.png"))) > 0

    v = feat2viz(np.random.default_rng(0).normal(size=(1, 8, 8, 6)))
    assert v.shape == (1, 8, 8, 3)
    assert v.min() >= 0 and v.max() <= 1


def test_prefetch_pipeline():
    from zest_tpu.data.pipeline import prefetch_to_device, epoch_order
    ds = SyntheticDataset(img_h=24, img_w=32, num_frames=4, num_keyframes=3,
                          use_mvs=False, use_mvs_dy=False)
    seen = 0
    for batch in prefetch_to_device(ds, epoch_order(len(ds), 2, seed=0)):
        assert batch["images"].shape[-1] == 3
        seen += 1
    assert seen == 8
