"""Multi-chip sharding: 8-virtual-device mesh runs the full train step and matches
the single-device loss (same rng ⇒ identical sampling ⇒ identical loss)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zest_tpu.config import ZestConfig
from zest_tpu.data.synthetic import SyntheticDataset
from zest_tpu.parallel import make_mesh
from zest_tpu.system import ZestSystem, TrainState, phase_for_step


def _setup(mesh, volumes=False):
    cfg = ZestConfig(train_sceneflow=True, use_mvs=volumes, use_mvs_dy=volumes,
                     pad=4 if volumes else 0, num_keyframes=3,
                     netdepth=4, netwidth=32, multires=4, multires_views=2,
                     N_samples=16, batch_size=64, num_extra_samples=0,
                     use_motion_mask=False, decay_iteration=1,
                     with_chain_loss=False, pts_embedder=True, dir_embedder=True,
                     use_viewdirs=True, num_epochs=10)
    if volumes:
        # feature space H/4 x W/4; CostRegNet needs (h+2p, w+2p) divisible by 8
        ds = SyntheticDataset(img_h=32, img_w=64, num_frames=9, num_keyframes=3,
                              use_mvs=True, use_mvs_dy=True)
    else:
        ds = SyntheticDataset(img_h=24, img_w=32, num_frames=8, num_keyframes=3,
                              use_mvs=False, use_mvs_dy=False)
    batch = {k: jnp.asarray(v) for k, v in ds[3].items()}
    system = ZestSystem(cfg)
    system.mesh = mesh
    params = system.init_params(jax.random.PRNGKey(0), batch)
    opt = system.make_optimizer(8)
    state = TrainState(params, opt.init(params), jnp.asarray(0))
    return cfg, system, state, system.make_train_step(opt), batch


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_mesh_step_matches_single_device():
    cfg, sys1, state1, step1, batch = _setup(mesh=None)
    _, logs1 = step1(state1, batch, jax.random.PRNGKey(5), phase_for_step(cfg, 0))

    mesh = make_mesh(8)
    cfg, sys8, state8, step8, batch = _setup(mesh=mesh)
    with mesh:
        _, logs8 = step8(state8, batch, jax.random.PRNGKey(5),
                         phase_for_step(cfg, 0))

    np.testing.assert_allclose(float(logs1["train_loss"]),
                               float(logs8["train_loss"]), rtol=2e-4)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_mesh_step_matches_single_device_volumes():
    """Full static+dynamic encoding-volume path under the 8-device mesh:
    identical loss vs single device (round-1 gap: only the no-volumes path
    had a mesh parity test)."""
    cfg, sys1, state1, step1, batch = _setup(mesh=None, volumes=True)
    _, logs1 = step1(state1, batch, jax.random.PRNGKey(5), phase_for_step(cfg, 0))

    mesh = make_mesh(8)
    cfg, sys8, state8, step8, batch = _setup(mesh=mesh, volumes=True)
    with mesh:
        _, logs8 = step8(state8, batch, jax.random.PRNGKey(5),
                         phase_for_step(cfg, 0))

    np.testing.assert_allclose(float(logs1["train_loss"]),
                               float(logs8["train_loss"]), rtol=2e-4)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_dryrun_multichip_entry():
    import __graft_entry__ as g
    g.dryrun_multichip(8)
