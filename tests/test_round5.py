"""Round-5 regression tests.

Covers the wide-residual combine VJP (flags.WIDE_COMBINE_VJP): it must be
BIT-exact vs the autodiff path — forward, d_vol and d_grid — since it is a
pure residual-layout change (same HIGHEST one-hot matmuls, same bf16 scatter
cast; see ops/grid_sample.py:_take_combine_wide).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zest_tpu import flags
from zest_tpu.ops import grid_sample as gs


@pytest.fixture
def _restore_flag():
    orig = flags.WIDE_COMBINE_VJP
    yield
    flags.WIDE_COMBINE_VJP = orig
    jax.clear_caches()


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_wide_combine_vjp_bit_exact(dtype, _restore_flag):
    rng = np.random.default_rng(7)
    vol = jnp.asarray(rng.normal(size=(6, 5, 7, 8)).astype(np.float32)
                      ).astype(dtype)
    grid = jnp.asarray(
        rng.uniform(-1.05, 1.05, size=(11, 13, 3)).astype(np.float32))
    g_out = jnp.asarray(rng.normal(size=(11, 13, 8)).astype(np.float32))

    def run():
        # under jit: the grid (hence row_idx) must be a TRACER — regression
        # cover for the custom_vjp closed-over-tracer bug (round 5)
        def loss(v, n):
            return jnp.vdot(gs.grid_sample_3d_paired(v, n).astype(jnp.float32),
                            g_out)
        out = jax.jit(gs.grid_sample_3d_paired)(vol, grid)
        gv, gn = jax.jit(jax.grad(loss, argnums=(0, 1)))(vol, grid)
        return out, gv, gn

    flags.WIDE_COMBINE_VJP = False
    jax.clear_caches()
    base = run()
    flags.WIDE_COMBINE_VJP = True
    jax.clear_caches()
    wide = run()
    for name, a, b in zip(("out", "d_vol", "d_grid"), base, wide):
        assert jnp.max(jnp.abs(a.astype(jnp.float32)
                               - b.astype(jnp.float32))) == 0.0, name


def test_wide_combine_vjp_shared_paired_build(_restore_flag):
    """Two sample calls sharing one hoisted paired build must accumulate
    d_vol across calls identically under the wide VJP."""
    rng = np.random.default_rng(3)
    vol = jnp.asarray(rng.normal(size=(5, 6, 7, 8)).astype(np.float32))
    g1 = jnp.asarray(rng.uniform(-1.0, 1.0, size=(9, 3)).astype(np.float32))
    g2 = jnp.asarray(rng.uniform(-1.0, 1.0, size=(9, 3)).astype(np.float32))

    def loss(v):
        flat = gs.paired_volume(v)
        a = gs.grid_sample_3d_paired(v, g1, paired=flat)
        b = gs.grid_sample_3d_paired(v, g2, paired=flat)
        return jnp.sum(a * b)

    flags.WIDE_COMBINE_VJP = False
    jax.clear_caches()
    base = jax.jit(jax.grad(loss))(vol)
    flags.WIDE_COMBINE_VJP = True
    jax.clear_caches()
    wide = jax.jit(jax.grad(loss))(vol)
    assert jnp.max(jnp.abs(base - wide)) == 0.0


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_unet_concat_adjoint_bit_exact(dtype, _restore_flag):
    """flags.UNET_CONCAT_ADJOINT (models/cost_reg.py:_conv3dz2d_concat) is a
    pure adjoint-layout change: forward bitwise equal; grads equal up to
    conv-grad reassociation (bitwise 0.0 on the real chip per
    tools/probe_unet.py; CPU's eigen conv-grad reassociates at ~1e-6 rel)."""
    from zest_tpu.models.cost_reg import CostRegNet

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(1, 16, 24, 32, 41)).astype(np.float32))
    net = CostRegNet(dtype=dtype)
    params = net.init(jax.random.PRNGKey(0), x)

    def run():
        def loss(p, xx):
            return jnp.sum(net.apply(p, xx).astype(jnp.float32) ** 2)
        out = jax.jit(net.apply)(params, x)
        gp, gx = jax.jit(jax.grad(loss, argnums=(0, 1)))(params, x)
        return out, gp, gx

    orig = flags.UNET_CONCAT_ADJOINT
    try:
        flags.UNET_CONCAT_ADJOINT = False
        jax.clear_caches()
        o0, gp0, gx0 = run()
        flags.UNET_CONCAT_ADJOINT = True
        jax.clear_caches()
        o1, gp1, gx1 = run()
    finally:
        flags.UNET_CONCAT_ADJOINT = orig

    assert jnp.max(jnp.abs(o0.astype(jnp.float32)
                           - o1.astype(jnp.float32))) == 0.0

    def rel_close(a, b):
        a = a.astype(jnp.float32)
        b = b.astype(jnp.float32)
        scale = float(jnp.max(jnp.abs(a))) or 1.0
        return float(jnp.max(jnp.abs(a - b))) <= 1e-5 * scale

    assert rel_close(gx0, gx1)
    ok = jax.tree.map(rel_close, gp0, gp1)
    assert all(jax.tree.leaves(ok))


def test_eval_path_blocked_matches_unblocked():
    """Blocked pose dispatch (render_paths.eval_path_blocked) must reproduce
    the single-dispatch path eval exactly, including a padded short final
    block. The blocking exists because a single 60-pose dispatch is a ~150 s
    device execution that crashes the tunnel's TPU worker (BENCH_NOTES
    round 5); semantics must not change."""
    from zest_tpu.config import ZestConfig
    from zest_tpu.data.synthetic import SyntheticDataset
    from zest_tpu.render_paths import eval_path_blocked
    from zest_tpu.system import ZestSystem

    cfg = ZestConfig(train_sceneflow=True, use_mvs=False, use_mvs_dy=False,
                     pad=0, netdepth=8, netwidth=32, multires=4,
                     multires_views=2, N_samples=16, batch_size=32,
                     num_extra_samples=8, use_motion_mask=True,
                     decay_iteration=1, with_chain_loss=True,
                     pts_embedder=True, dir_embedder=True, use_viewdirs=True,
                     num_epochs=10, raw_noise_std=0.0)
    ds = SyntheticDataset(img_h=24, img_w=32, num_frames=8, num_keyframes=3,
                          use_mvs=False, use_mvs_dy=False)
    sample = ds[3]
    batch = {k: jnp.asarray(v) for k, v in sample.items()}
    sys_ = ZestSystem(cfg)
    params = sys_.init_params(jax.random.PRNGKey(0), batch)
    path_fn = sys_.make_eval_path_step()

    # 5 poses: the target camera plus 4 other frames' target cameras
    others = [ds[i] for i in (1, 2, 4, 5)]
    c2ws = jnp.stack([batch["c2ws"][-1]]
                     + [jnp.asarray(o["c2ws"])[-1] for o in others])
    w2cs = jnp.stack([batch["w2cs"][-1]]
                     + [jnp.asarray(o["w2cs"])[-1] for o in others])

    ref = path_fn(params, batch, c2ws, w2cs)
    # block=2 over 5 poses → blocks [2, 2, 1]; last block pads + slices
    got = eval_path_blocked(path_fn, params, batch, c2ws, w2cs, block=2)
    for k in ref:
        np.testing.assert_array_equal(np.asarray(ref[k]), got[k], err_msg=k)


def test_run_wanderpath_end_to_end(tmp_path):
    """Bullet-time CLI path (render_spiral --render_path wander) end-to-end
    on the synthetic dataset: one frame, 4 orbit poses, PNG panels written
    (reference test_step_wanderpath, train.py:1167-1237)."""
    from zest_tpu.config import ZestConfig
    from zest_tpu.render_paths import run_wanderpath

    cfg = ZestConfig(expname="wander", dataset_name="synthetic",
                     datadir=str(tmp_path), save_dir=str(tmp_path / "out"),
                     train_sceneflow=True, use_mvs=False, use_mvs_dy=False,
                     pad=0, netdepth=4, netwidth=32, multires=4,
                     multires_views=2, N_samples=8, batch_size=16, chunk=512,
                     eval_chunk=256, img_h=24, img_w=32, num_keyframes=3,
                     pts_embedder=True, dir_embedder=True, use_viewdirs=True,
                     num_epochs=1)
    run_wanderpath(cfg, frame_range=(3, 3), n_poses=4, quiet=True)
    outs = sorted((tmp_path / "out" / "wander").glob(
        "render_wanderpath_frame*/rgb_map_blend_*.png"))
    assert len(outs) == 4
    douts = sorted((tmp_path / "out" / "wander").glob(
        "render_wanderpath_frame*/depth_map_blend_*.png"))
    assert len(douts) == 4
