"""Full-checkpoint conversion: a complete fake reference state dict converts into
a param tree that the system's own init structure accepts (shapes match), so a
real reference .ckpt can be evaluated directly."""
import numpy as np
import jax
import jax.numpy as jnp

from zest_tpu.config import ZestConfig
from zest_tpu.convert import convert_checkpoint
from zest_tpu.data.synthetic import SyntheticDataset
from zest_tpu.system import ZestSystem


def _fake_linear(sd, prefix, fin, fout, rng):
    sd[prefix + ".weight"] = rng.normal(size=(fout, fin)).astype(np.float32)
    sd[prefix + ".bias"] = rng.normal(size=(fout,)).astype(np.float32)


def _fake_nerf(sd, prefix, in_pts, in_feat, in_views, W, D, rng, static):
    dims = []
    for i in range(D - 1):
        if i == 0:
            dims.append((in_pts, W))
        if i == 4:
            dims.append((W + in_pts, W))
        else:
            dims.append((W, W))
    for i, (fi, fo) in enumerate(dims):
        _fake_linear(sd, f"{prefix}.pts_linears.{i}", fi, fo, rng)
    _fake_linear(sd, f"{prefix}.pts_bias", in_feat, W, rng)
    _fake_linear(sd, f"{prefix}.alpha_linear", W, 1, rng)
    _fake_linear(sd, f"{prefix}.feature_linear", W, W, rng)
    _fake_linear(sd, f"{prefix}.views_linears.0", W + in_views, W // 2, rng)
    _fake_linear(sd, f"{prefix}.rgb_linear", W // 2, 3, rng)
    if static:
        _fake_linear(sd, f"{prefix}.w_linear", W, 1, rng)
    else:
        _fake_linear(sd, f"{prefix}.sf_linear", W, 6, rng)
        _fake_linear(sd, f"{prefix}.prob_linear", W, 2, rng)


def _fake_mvsnet(sd, prefix, rng):
    def conv2d(p, ci, co, k):
        sd[p + ".conv.weight"] = rng.normal(size=(co, ci, k, k)).astype(np.float32)
        sd[p + ".bn.weight"] = rng.normal(size=(co,)).astype(np.float32)
        sd[p + ".bn.bias"] = rng.normal(size=(co,)).astype(np.float32)

    conv2d(f"{prefix}.feature.conv0.0", 3, 8, 3)
    conv2d(f"{prefix}.feature.conv0.1", 8, 8, 3)
    conv2d(f"{prefix}.feature.conv1.0", 8, 16, 5)
    conv2d(f"{prefix}.feature.conv1.1", 16, 16, 3)
    conv2d(f"{prefix}.feature.conv1.2", 16, 16, 3)
    conv2d(f"{prefix}.feature.conv2.0", 16, 32, 5)
    conv2d(f"{prefix}.feature.conv2.1", 32, 32, 3)
    conv2d(f"{prefix}.feature.conv2.2", 32, 32, 3)
    sd[f"{prefix}.feature.toplayer.weight"] = \
        rng.normal(size=(32, 32, 1, 1)).astype(np.float32)
    sd[f"{prefix}.feature.toplayer.bias"] = rng.normal(size=(32,)).astype(np.float32)

    def conv3d(p, ci, co):
        sd[p + ".conv.weight"] = rng.normal(size=(co, ci, 3, 3, 3)).astype(np.float32)
        sd[p + ".bn.weight"] = rng.normal(size=(co,)).astype(np.float32)
        sd[p + ".bn.bias"] = rng.normal(size=(co,)).astype(np.float32)

    for name, ci, co in (("conv0", 41, 8), ("conv1", 8, 16), ("conv2", 16, 16),
                         ("conv3", 16, 32), ("conv4", 32, 32), ("conv5", 32, 64),
                         ("conv6", 64, 64)):
        conv3d(f"{prefix}.cost_reg_2.{name}", ci, co)
    for name, ci, co in (("conv7", 64, 32), ("conv9", 32, 16), ("conv11", 16, 8)):
        sd[f"{prefix}.cost_reg_2.{name}.0.weight"] = \
            rng.normal(size=(ci, co, 3, 3, 3)).astype(np.float32)
        sd[f"{prefix}.cost_reg_2.{name}.1.weight"] = \
            rng.normal(size=(co,)).astype(np.float32)
        sd[f"{prefix}.cost_reg_2.{name}.1.bias"] = \
            rng.normal(size=(co,)).astype(np.float32)


def test_full_checkpoint_structure_matches_init(tmp_path, monkeypatch):
    cfg = ZestConfig(train_sceneflow=True, use_mvs=True, use_mvs_dy=True, pad=4,
                     num_keyframes=3, netdepth=8, netwidth=32, multires=4,
                     multires_views=2, N_samples=8, batch_size=16,
                     pts_embedder=True, dir_embedder=True, use_viewdirs=True)
    rng = np.random.default_rng(0)
    in_pts = 3 * (2 * cfg.multires + 1)
    in_dy = 4 * (2 * cfg.multires + 1)
    in_views = 3 * (2 * cfg.multires_views + 1)
    sd = {}
    _fake_nerf(sd, "nerf_static.nerf", in_pts, cfg.feat_dim, in_views, 32, 8,
               rng, static=True)
    _fake_nerf(sd, "nerf_dynamic.nerf", in_dy, cfg.feat_dim_dy, in_views, 32, 8,
               rng, static=False)
    _fake_mvsnet(sd, "encoding_net", rng)
    _fake_mvsnet(sd, "encoding_net_dy", rng)

    import zest_tpu.convert as cv
    monkeypatch.setattr(cv, "load_torch_state_dict", lambda p: sd)
    converted = cv.convert_checkpoint("fake.ckpt", cfg)

    ds = SyntheticDataset(img_h=32, img_w=64, num_keyframes=3,
                          use_mvs=True, use_mvs_dy=True)
    batch = {k: jnp.asarray(v) for k, v in ds[1].items()}
    system = ZestSystem(cfg)
    ref_params = system.init_params(jax.random.PRNGKey(0), batch)

    flat_ref = {jax.tree_util.keystr(p): jnp.shape(v) for p, v in
                jax.tree_util.tree_flatten_with_path(ref_params)[0]}
    flat_conv = {jax.tree_util.keystr(p): np.shape(v) for p, v in
                 jax.tree_util.tree_flatten_with_path(converted)[0]}
    assert set(flat_ref) == set(flat_conv), set(flat_ref) ^ set(flat_conv)
    for k in flat_ref:
        assert tuple(flat_ref[k]) == tuple(flat_conv[k]), (k, flat_ref[k],
                                                           flat_conv[k])

    # the converted params actually run a forward step
    from zest_tpu.system import phase_for_step
    converted = jax.tree_util.tree_map(jnp.asarray, converted)
    ret, rays, _ = system.forward_train(converted, batch, jax.random.PRNGKey(1),
                                        phase_for_step(cfg, 0), jnp.asarray(0))
    assert np.all(np.isfinite(np.asarray(ret["rgb_map_ref"])))
