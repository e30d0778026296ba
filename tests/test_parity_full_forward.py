"""FULL-MODEL numerics parity vs a torch oracle (VERDICT r2 missing #1).

Extends the encoder-only oracle (test_parity_oracle.py) to the whole forward:
the torch oracle re-expresses the REFERENCE semantics of

- both NeRF MLPs (v0 multiplicative conditioning, networks.py:73-221),
- embeddings (networks.py:29-65),
- prepare_pts / prepare_dynamic_pts conditioning incl. gen_pts_feats =
  index_point_feature + build_color_volume + gen_dir_feature
  (renderer.py:246-318, utils.py:433-505, renderer.py:34-49),
- raw2outputs / raw2outputs_blending two-field compositing
  (renderer.py:91-219),
- the full scene-flow re-render graph with t±1 and t±2 chain passes
  (renderer.py:378-575, `rendering` renderer.py:579-626),

with reference-compatible state-dict names imported through
``convert.convert_nerf`` — so checkpoint conversion is numerically gated for
the ENTIRE renderer, not just the encoder. A stitched test additionally runs
the torch encoder oracle so encoder → renderer is covered end-to-end from one
reference-shaped state dict.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from zest_tpu import render, sampling  # noqa: E402
from zest_tpu.convert import convert_nerf  # noqa: E402
from zest_tpu.models.nerf import NeRFField  # noqa: E402


# --------------------------- torch oracle pieces ---------------------------

def o_embed(x, n_freqs):
    """Reference Embedding (networks.py:29-65): [x, sin(2^k x), cos(2^k x), ...]."""
    out = [x]
    for k in range(n_freqs):
        f = 2.0 ** k
        out += [torch.sin(f * x), torch.cos(f * x)]
    return torch.cat(out, -1)


class ONeRF(tnn.Module):
    """Reference `Renderer` v0 executed topology (networks.py:73-221), with the
    reference's exact parameter names (pts_linears.N, pts_bias, ...)."""

    def __init__(self, D, W, in_pts, in_views, in_feat, skips=(4,),
                 static=True):
        super().__init__()
        self.skips = set(skips)
        self.in_pts, self.in_views, self.in_feat = in_pts, in_views, in_feat
        self.static = static
        self.pts_linears = tnn.ModuleList()
        for i in range(D - 1):
            if i == 0:
                self.pts_linears.append(tnn.Linear(in_pts, W))
            if i in self.skips:
                self.pts_linears.append(tnn.Linear(W + in_pts, W))
            else:
                self.pts_linears.append(tnn.Linear(W, W))
        self.pts_bias = tnn.Linear(in_feat, W)
        self.views_linears = tnn.ModuleList([tnn.Linear(W + in_views, W // 2)])
        self.feature_linear = tnn.Linear(W, W)
        self.alpha_linear = tnn.Linear(W, 1)
        self.rgb_linear = tnn.Linear(W // 2, 3)
        if static:
            self.w_linear = tnn.Linear(W, 1)
        else:
            self.sf_linear = tnn.Linear(W, 6)
            self.prob_linear = tnn.Linear(W, 2)

    def forward(self, x):
        input_pts, input_feats, input_views = torch.split(
            x, [self.in_pts, self.in_feat, self.in_views], dim=-1)
        pts = input_pts
        bias = self.pts_bias(input_feats)
        for i, layer in enumerate(self.pts_linears):
            pts = tF.relu(layer(pts) * bias)
            if i in self.skips:
                pts = torch.cat([input_pts, pts], -1)
        if self.static:
            extra = torch.sigmoid(self.w_linear(pts))
        else:
            extra = torch.cat([torch.tanh(self.sf_linear(pts)),
                               torch.sigmoid(self.prob_linear(pts))], -1)
        alpha = self.alpha_linear(pts)
        feature = self.feature_linear(pts)
        h = torch.cat([feature, input_views], -1)
        for layer in self.views_linears:
            h = tF.relu(layer(h))
        rgb = self.rgb_linear(h)
        return torch.cat([rgb, alpha, extra], -1)


def o_get_ndc_xy(w2c, intr, pts):
    """get_ndc_coordinate xy part (utils.py:232-289, pad=0): world → pixel/(W-1,H-1)."""
    p = pts.reshape(-1, 3) @ w2c[:3, :3].T + w2c[:3, 3]
    pp = p @ intr.T
    return (pp[:, :2] / pp[:, 2:]).reshape(*pts.shape[:-1], 2)


def o_build_color_volume(pts, w2cs, intrs, imgs):
    """build_color_volume with_mask=True (utils.py:461-505). imgs [V,3,H,W]."""
    V, _, H, W = imgs.shape
    inv_scale = torch.tensor([W - 1.0, H - 1.0])
    cols = []
    for v in range(V):
        xy = o_get_ndc_xy(w2cs[v], intrs[v], pts) / inv_scale
        grid = xy * 2.0 - 1.0                                   # [R, S, 2]
        data = tF.grid_sample(imgs[v:v + 1], grid[None], mode="bilinear",
                              padding_mode="border", align_corners=True)
        data = data[0].permute(1, 2, 0)                         # [R, S, 3]
        inb = (grid > -1.0) & (grid < 1.0)
        mask = (inb[..., 0] & inb[..., 1]).float()[..., None]
        cols.append(torch.cat([data, mask], -1))
    return torch.cat(cols, -1)                                  # [R, S, 4V]


def o_index_point_feature(vol, ndc):
    """index_point_feature (utils.py:433-459). vol [C,D,h,w]; ndc [R,S,3] in [0,1]."""
    R, S, _ = ndc.shape
    grid = ndc.reshape(1, 1, R, S, 3) * 2.0 - 1.0
    out = tF.grid_sample(vol[None], grid, mode="bilinear", align_corners=True)
    return out[0, :, 0].permute(1, 2, 0)                        # [R, S, C]


def o_raw2outputs(raw, z_vals, dists):
    rgb = torch.sigmoid(raw[..., :3])
    opacity = tF.relu(raw[..., 3])
    alpha = 1.0 - torch.exp(-opacity * dists)
    T = torch.cumprod(torch.cat([torch.ones(*alpha.shape[:1], 1),
                                 1.0 - alpha + 1e-10], -1), -1)[..., :-1]
    weights = alpha * T
    rgb_map = torch.sum(weights[..., None] * rgb, -2)
    depth_map = torch.sum(weights * z_vals, -1)
    return rgb_map, weights, depth_map


def o_raw2outputs_blending(raw_dy, raw_rigid, blend_w, z_vals, dists):
    rgb_dy = torch.sigmoid(raw_dy[..., :3])
    rgb_rigid = torch.sigmoid(raw_rigid[..., :3])
    op_dy = tF.relu(raw_dy[..., 3])
    op_rig = tF.relu(raw_rigid[..., 3])
    alpha_dy = (1.0 - torch.exp(-op_dy * dists)) * blend_w
    alpha_rig = (1.0 - torch.exp(-op_rig * dists)) * (1.0 - blend_w)
    Ts = torch.cumprod(torch.cat([torch.ones(*alpha_dy.shape[:1], 1),
                                  (1.0 - alpha_dy) * (1.0 - alpha_rig) + 1e-10],
                                 -1), -1)[..., :-1]
    w_dy, w_rig = Ts * alpha_dy, Ts * alpha_rig
    rgb_map = torch.sum(w_dy[..., None] * rgb_dy
                        + w_rig[..., None] * rgb_rigid, -2)
    depth_map = torch.sum((w_dy + w_rig) * z_vals, -1)
    alpha_fg = 1.0 - torch.exp(-op_dy * dists)
    T_fg = torch.cumprod(torch.cat([torch.ones(*alpha_fg.shape[:1], 1),
                                    1.0 - alpha_fg + 1e-10], -1), -1)[..., :-1]
    w_fg = alpha_fg * T_fg
    depth_fg = torch.sum(w_fg * z_vals, -1)
    rgb_fg = torch.sum(w_fg[..., None] * rgb_dy, -2)
    return rgb_map, depth_map, rgb_fg, depth_fg, w_fg, w_dy


def o_rendering(pts, ndc, z_vals, rays_d, st_vol, dy_vol, src_imgs, src_w2cs,
                src_intrs, nb_imgs, nb_w2cs, nb_intrs, nerf_st, nerf_dy,
                multires, multires_views, ref_idx, num_frames, chain_bwd,
                chain_5frames):
    """Reference `rendering` scene-flow path (renderer.py:579-626 + 322-575),
    N=1 batch dim dropped. All inputs torch tensors."""
    cos = torch.norm(rays_d, dim=-1, keepdim=True)              # [R, 1]
    d = z_vals[..., 1:] - z_vals[..., :-1]
    dists = torch.cat([d, torch.full_like(d[..., :1], 1e10)], -1) * cos

    def embed_dirs(w2c_ref):
        dirs = rays_d / cos
        dirs = dirs @ w2c_ref[:3, :3].T                          # gen_dir_feature
        v = o_embed(dirs, multires_views)
        return v[:, None, :].expand(-1, z_vals.shape[1], -1)

    # ---- static (render_static) ----
    pts_emb = o_embed(ndc, multires)
    st_feats = torch.cat([o_index_point_feature(st_vol, ndc),
                          o_build_color_volume(pts, src_w2cs, src_intrs,
                                               src_imgs)], -1)
    x = torch.cat([pts_emb, st_feats, embed_dirs(src_w2cs[0])], -1)
    raw_static = nerf_st(x)
    raw_rgba = raw_static[..., :4]
    blend_w = raw_static[..., 4]
    rgb_map, _, depth_map = o_raw2outputs(raw_rgba, z_vals, dists)
    ret = {"rgb_map": rgb_map, "depth_map": depth_map}

    # ---- dynamic @ t (render_dynamic) ----
    views_dy = embed_dirs(nb_w2cs[0])
    col_dy = o_build_color_volume(pts, nb_w2cs, nb_intrs, nb_imgs)

    def eval_dyn(ndc_xyz, frame_idx):
        t_ch = torch.ones_like(ndc_xyz[..., :1]) * frame_idx
        xyzt = torch.cat([ndc_xyz, t_ch], -1)
        feats = torch.cat([o_index_point_feature(dy_vol, ndc_xyz), col_dy], -1)
        x = torch.cat([o_embed(xyzt, multires), feats, views_dy], -1)
        return xyzt, nerf_dy(x)

    raw_pts_ref, raw_ref_t = eval_dyn(ndc, ref_idx)
    raw_rgba_ref = raw_ref_t[..., :4]
    sf_prev, sf_post = raw_ref_t[..., 4:7], raw_ref_t[..., 7:10]
    prob_prev, prob_post = raw_ref_t[..., 10], raw_ref_t[..., 11]
    (rgb_ref, depth_ref, rgb_ref_dy, depth_ref_dy, w_ref_dy,
     w_ref_dd) = o_raw2outputs_blending(raw_rgba_ref, raw_rgba, blend_w,
                                        z_vals, dists)
    ret.update({"rgb_map_ref": rgb_ref, "depth_map_ref": depth_ref,
                "rgb_map_ref_dy": rgb_ref_dy, "depth_map_ref_dy": depth_ref_dy,
                "weights_map_dd": torch.sum(w_ref_dd, -1),
                "raw_sf_ref2prev": sf_prev, "raw_sf_ref2post": sf_post,
                "raw_prob_ref2prev": prob_prev, "raw_prob_ref2post": prob_post,
                "raw_pts_ref": raw_pts_ref[..., :3]})

    # ---- t-1 / t+1 ----
    dt = 1.0 / num_frames * 2.0
    prev_ndc, post_ndc = ndc + sf_prev, ndc + sf_post
    raw_pts_prev, raw_prev = eval_dyn(prev_ndc, ref_idx - dt)
    raw_pts_post, raw_post = eval_dyn(post_ndc, ref_idx + dt)
    sf_prev2pp = raw_prev[..., 4:7]
    sf_post2pp = raw_post[..., 7:10]
    ret["raw_pts_prev"] = raw_pts_prev[..., :3]
    ret["raw_sf_prev2ref"] = raw_prev[..., 7:10]
    ret["raw_pts_post"] = raw_pts_post[..., :3]
    ret["raw_sf_post2ref"] = raw_post[..., 4:7]
    rgb_prev_dy, w_prev_dy, _ = o_raw2outputs(raw_prev[..., :4], z_vals, dists)
    rgb_post_dy, w_post_dy, _ = o_raw2outputs(raw_post[..., :4], z_vals, dists)
    ret["rgb_map_prev_dy"] = rgb_prev_dy
    ret["rgb_map_post_dy"] = rgb_post_dy
    ret["prob_map_prev"] = torch.sum(w_prev_dy.detach() * (1.0 - prob_prev), -1)
    ret["prob_map_post"] = torch.sum(w_post_dy.detach() * (1.0 - prob_post), -1)

    # ---- t±2 chain ----
    if chain_bwd:
        pp_ndc = prev_ndc + sf_prev2pp
        pp_idx = ref_idx - 2.0 * dt
    else:
        pp_ndc = post_ndc + sf_post2pp
        pp_idx = ref_idx + 2.0 * dt
    ret["raw_pts_pp"] = pp_ndc
    if chain_5frames:
        _, raw_pp = eval_dyn(pp_ndc, pp_idx)
        rgb_pp_dy, _, _ = o_raw2outputs(raw_pp[..., :4], z_vals, dists)
        ret["rgb_map_pp_dy"] = rgb_pp_dy
    return ret


# ------------------------------ shared fixture ------------------------------

MULTIRES, MULTIRES_VIEWS = 4, 2
DEPTH, WIDTH = 4, 32


def _poses(n, seed, H, W):
    """Mildly-perturbed camera ring: w2cs [n,4,4], intrinsics [n,3,3]."""
    rng = np.random.default_rng(seed)
    w2cs, intrs = [], []
    for i in range(n):
        w2c = np.eye(4, dtype=np.float32)
        w2c[:3, 3] = rng.uniform(-0.2, 0.2, 3)
        th = rng.uniform(-0.1, 0.1)
        w2c[0, 0] = w2c[1, 1] = np.cos(th)
        w2c[0, 1], w2c[1, 0] = -np.sin(th), np.sin(th)
        w2cs.append(w2c)
        intr = np.array([[0.6 * W, 0, W / 2], [0, 0.6 * W, H / 2], [0, 0, 1]],
                        np.float32)
        intrs.append(intr)
    return np.stack(w2cs), np.stack(intrs)


def _ray_batch(seed=0, R=24, S=16, H=24, W=32, V=3):
    """Deterministic RayBatch via the framework's own (unit-tested) builder."""
    rng = np.random.default_rng(seed)
    w2cs, intrs = _poses(V + 1, seed, H, W)
    c2ws = np.stack([np.linalg.inv(m) for m in w2cs])
    imgs = rng.uniform(size=(V + 1, H, W, 3)).astype(np.float32)
    depths = rng.uniform(1.0, 5.0, size=(H, W)).astype(np.float32)
    near_fars = np.tile(np.array([2.0, 6.0], np.float32), (V + 1, 1))
    xs = jnp.asarray(rng.integers(0, W, R).astype(np.float32))
    ys = jnp.asarray(rng.integers(0, H, R).astype(np.float32))
    rays = sampling.build_rays(
        jax.random.PRNGKey(0), xs, ys, images=jnp.asarray(imgs),
        depths=jnp.asarray(depths), w2cs=jnp.asarray(w2cs),
        c2ws=jnp.asarray(c2ws), intrinsics=jnp.asarray(intrs),
        near_fars=jnp.asarray(near_fars), n_samples=S, pad=0,
        stratified=False)
    return rays, imgs, w2cs, intrs


def _torch_nerfs(seed, in_pts_st, in_feat_st, in_pts_dy, in_feat_dy, in_views):
    torch.manual_seed(seed)
    nerf_st = ONeRF(DEPTH, WIDTH, in_pts_st, in_views, in_feat_st, skips=(2,),
                    static=True)
    nerf_dy = ONeRF(DEPTH, WIDTH, in_pts_dy, in_views, in_feat_dy, skips=(2,),
                    static=False)
    return nerf_st, nerf_dy


def _jax_field(torch_nerf, in_pts, in_views, in_feat, static):
    field = NeRFField(depth=DEPTH, width=WIDTH, in_ch_pts=in_pts,
                      in_ch_views=in_views, in_ch_feat=in_feat, skips=(2,),
                      net_type="v0", use_viewdirs=True, sceneflow=True,
                      static=static, use_mvs=True)
    sd = {"pre.nerf." + k: v.detach().numpy()
          for k, v in torch_nerf.state_dict().items()}
    return field, convert_nerf(sd, "pre.nerf")


# --------------------------------- the test ---------------------------------

@pytest.mark.parametrize("chain_bwd,chain_5frames",
                         [(True, True), (False, True), (False, False)])
def test_full_forward_matches_torch_oracle(chain_bwd, chain_5frames):
    """The whole scene-flow forward (static + dynamic + t±1 + chain) must match
    the torch re-expression of renderer.py:91-626 through convert_nerf."""
    R, S, H, W, V, V2 = 24, 16, 24, 32, 3, 4
    rays, imgs, w2cs, intrs = _ray_batch(0, R, S, H, W, V)
    rngv = np.random.default_rng(7)
    st_vol = rngv.normal(size=(8, 12, 16, 8)).astype(np.float32)   # [D,h,w,C]
    dy_vol = rngv.normal(size=(8, 12, 16, 8)).astype(np.float32)
    nb_w2cs, nb_intrs = _poses(V2, 11, H, W)
    nb_imgs = rngv.uniform(size=(V2, H, W, 3)).astype(np.float32)

    in_pts_st = 3 * (2 * MULTIRES + 1)
    in_pts_dy = 4 * (2 * MULTIRES + 1)
    in_views = 3 * (2 * MULTIRES_VIEWS + 1)
    in_feat_st = 8 + V * 4
    in_feat_dy = 8 + V2 * 4
    nerf_st, nerf_dy = _torch_nerfs(3, in_pts_st, in_feat_st, in_pts_dy,
                                    in_feat_dy, in_views)

    ref_idx, num_frames = 0.25, 12.0

    # ---- torch oracle ----
    tt = lambda a: torch.from_numpy(np.asarray(a, np.float32))
    with torch.no_grad():
        want = o_rendering(
            tt(rays.pts), tt(rays.ndc), tt(rays.z_vals), tt(rays.rays_d),
            tt(st_vol).permute(3, 0, 1, 2), tt(dy_vol).permute(3, 0, 1, 2),
            tt(imgs[:V]).permute(0, 3, 1, 2), tt(w2cs[:V]), tt(intrs[:V]),
            tt(nb_imgs).permute(0, 3, 1, 2), tt(nb_w2cs), tt(nb_intrs),
            nerf_st, nerf_dy, MULTIRES, MULTIRES_VIEWS, ref_idx, num_frames,
            chain_bwd, chain_5frames)

    # ---- framework ----
    field_st, vars_st = _jax_field(nerf_st, in_pts_st, in_views, in_feat_st,
                                   True)
    field_dy, vars_dy = _jax_field(nerf_dy, in_pts_dy, in_views, in_feat_dy,
                                   False)
    st_vol_j, dy_vol_j = jnp.asarray(st_vol), jnp.asarray(dy_vol)
    src_imgs = jnp.asarray(imgs[:V])
    nb_imgs_j = jnp.asarray(nb_imgs)
    src_w2cs, src_intrs = jnp.asarray(w2cs[:V]), jnp.asarray(intrs[:V])
    nb_w2cs_j, nb_intrs_j = jnp.asarray(nb_w2cs), jnp.asarray(nb_intrs)

    def static_feats(pts_world, ndc):
        vol = render.sample_volume_features(st_vol_j, ndc)
        col = render.build_color_features(pts_world, src_imgs, src_w2cs,
                                          src_intrs)
        return jnp.concatenate([vol, col], -1)

    models = render.RenderModels(
        static_fn=lambda p, f, v: field_st.apply(vars_st, p, f, v),
        dynamic_fn=lambda p, f, v: field_dy.apply(vars_dy, p, f, v),
        static_feats=static_feats,
        dynamic_vol=lambda ndc, banded: render.sample_volume_features(
            dy_vol_j, ndc),
        dynamic_col=lambda pts: render.build_color_features(
            pts, nb_imgs_j, nb_w2cs_j, nb_intrs_j),
        multires=MULTIRES, multires_views=MULTIRES_VIEWS)

    with jax.default_matmul_precision("highest"):
        got = render.render_rays(
            models, rays, im_w2c_ref=src_w2cs[0], nb_w2c_ref=nb_w2cs_j[0],
            scene_flow=True, chain_bwd=jnp.asarray(chain_bwd),
            chain_5frames=chain_5frames, ref_frame_idx=ref_idx,
            num_frames=num_frames, raw_noise_std=0.0, rng=None, val=False)

    keys = ["rgb_map", "depth_map", "rgb_map_ref", "depth_map_ref",
            "rgb_map_ref_dy", "depth_map_ref_dy", "weights_map_dd",
            "raw_sf_ref2prev", "raw_sf_ref2post", "raw_prob_ref2prev",
            "raw_prob_ref2post", "raw_pts_ref", "raw_pts_prev",
            "raw_sf_prev2ref", "raw_pts_post", "raw_sf_post2ref",
            "rgb_map_prev_dy", "rgb_map_post_dy", "prob_map_prev",
            "prob_map_post", "raw_pts_pp"]
    if chain_5frames:
        keys.append("rgb_map_pp_dy")
    for k in keys:
        np.testing.assert_allclose(
            np.asarray(got[k]), want[k].numpy(), rtol=2e-3, atol=2e-4,
            err_msg=f"key {k}")


def test_full_forward_static_only_matches_oracle():
    """scene_flow=False path (MVSNeRF static generator, renderer.py:322-373)."""
    R, S, H, W, V = 24, 16, 24, 32, 3
    rays, imgs, w2cs, intrs = _ray_batch(5, R, S, H, W, V)
    rngv = np.random.default_rng(13)
    st_vol = rngv.normal(size=(8, 12, 16, 8)).astype(np.float32)

    in_pts = 3 * (2 * MULTIRES + 1)
    in_views = 3 * (2 * MULTIRES_VIEWS + 1)
    in_feat = 8 + V * 4
    nerf_st, _ = _torch_nerfs(21, in_pts, in_feat, in_pts + 1, in_feat,
                              in_views)

    tt = lambda a: torch.from_numpy(np.asarray(a, np.float32))
    with torch.no_grad():
        cos = torch.norm(tt(rays.rays_d), dim=-1, keepdim=True)
        zv = tt(rays.z_vals)
        d = zv[..., 1:] - zv[..., :-1]
        dists = torch.cat([d, torch.full_like(d[..., :1], 1e10)], -1) * cos
        pts_emb = o_embed(tt(rays.ndc), MULTIRES)
        st_feats = torch.cat(
            [o_index_point_feature(tt(st_vol).permute(3, 0, 1, 2), tt(rays.ndc)),
             o_build_color_volume(tt(rays.pts), tt(w2cs[:V]), tt(intrs[:V]),
                                  tt(imgs[:V]).permute(0, 3, 1, 2))], -1)
        dirs = (tt(rays.rays_d) / cos) @ tt(w2cs[0])[:3, :3].T
        views = o_embed(dirs, MULTIRES_VIEWS)[:, None, :].expand(-1, S, -1)
        raw = nerf_st(torch.cat([pts_emb, st_feats, views], -1))
        rgb_want, _, depth_want = o_raw2outputs(raw[..., :4], zv, dists)

    field_st, vars_st = _jax_field(nerf_st, in_pts, in_views, in_feat, True)
    st_vol_j = jnp.asarray(st_vol)
    src_imgs, src_w2cs, src_intrs = (jnp.asarray(imgs[:V]),
                                     jnp.asarray(w2cs[:V]),
                                     jnp.asarray(intrs[:V]))

    def static_feats(pts_world, ndc):
        vol = render.sample_volume_features(st_vol_j, ndc)
        col = render.build_color_features(pts_world, src_imgs, src_w2cs,
                                          src_intrs)
        return jnp.concatenate([vol, col], -1)

    models = render.RenderModels(
        static_fn=lambda p, f, v: field_st.apply(vars_st, p, f, v),
        static_feats=static_feats, multires=MULTIRES,
        multires_views=MULTIRES_VIEWS)
    with jax.default_matmul_precision("highest"):
        got = render.render_rays(models, rays, im_w2c_ref=src_w2cs[0],
                                 scene_flow=False, raw_noise_std=0.0)
    np.testing.assert_allclose(np.asarray(got["rgb_map"]), rgb_want.numpy(),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got["depth_map"]),
                               depth_want.numpy(), rtol=2e-3, atol=2e-4)


def test_encoder_to_renderer_stitched_oracle():
    """End-to-end: torch-encoder volumes + torch renderer vs MVSEncoder volumes
    + render_rays, all weights from ONE reference-shaped state dict — the full
    forward_train surface minus ray building (unit-tested separately)."""
    from tests.test_parity_oracle import (OFeatureNet, OCostRegNet, _o_mvsnet)
    from zest_tpu.convert import convert_mvsnet
    from zest_tpu.models.mvsnet import MVSEncoder

    torch.manual_seed(2)
    R, S, H, W, V = 16, 8, 32, 64, 3
    rays, imgs, w2cs, intrs = _ray_batch(9, R, S, H, W, V)

    fnet, creg = OFeatureNet(), OCostRegNet()
    fnet.train()
    creg.train()
    imgs_t = torch.from_numpy(imgs[:V]).permute(0, 3, 1, 2) * 2.0 - 1.0
    projs = torch.eye(3, 4).repeat(V, 1, 1)
    projs[1, 0, 3], projs[1, 1, 3] = 1.5, -0.75
    projs[2, 0, 3], projs[2, 1, 3] = -2.0, 1.0
    dv = torch.linspace(2.0, 6.0, 8)
    with torch.no_grad():
        vol_want = _o_mvsnet(fnet, creg, imgs_t, projs, dv, pad=0)  # [1,8,D,h,w]

    sd = {}
    for k, v in fnet.state_dict().items():
        sd["encoding_net.feature." + k] = v.numpy()
    for k, v in creg.state_dict().items():
        sd["encoding_net.cost_reg_2." + k] = v.numpy()
    enc_vars = convert_mvsnet(sd, "encoding_net")
    enc = MVSEncoder(n_planes=8)
    vol_got, _, _ = enc.apply(
        enc_vars, jnp.asarray(imgs_t.permute(0, 2, 3, 1).numpy()),
        jnp.asarray(projs.numpy()), jnp.asarray(np.array([2.0, 6.0])), pad=0)

    in_pts = 3 * (2 * MULTIRES + 1)
    in_views = 3 * (2 * MULTIRES_VIEWS + 1)
    in_feat = 8 + V * 4
    nerf_st, _ = _torch_nerfs(33, in_pts, in_feat, in_pts + 1, in_feat,
                              in_views)

    tt = lambda a: torch.from_numpy(np.asarray(a, np.float32))
    with torch.no_grad():
        cos = torch.norm(tt(rays.rays_d), dim=-1, keepdim=True)
        zv = tt(rays.z_vals)
        d = zv[..., 1:] - zv[..., :-1]
        dists = torch.cat([d, torch.full_like(d[..., :1], 1e10)], -1) * cos
        st_feats = torch.cat(
            [o_index_point_feature(vol_want[0], tt(rays.ndc)),
             o_build_color_volume(tt(rays.pts), tt(w2cs[:V]), tt(intrs[:V]),
                                  tt(imgs[:V]).permute(0, 3, 1, 2))], -1)
        dirs = (tt(rays.rays_d) / cos) @ tt(w2cs[0])[:3, :3].T
        views = o_embed(dirs, MULTIRES_VIEWS)[:, None, :].expand(-1, S, -1)
        raw = nerf_st(torch.cat([o_embed(tt(rays.ndc), MULTIRES), st_feats,
                                 views], -1))
        rgb_want, _, depth_want = o_raw2outputs(raw[..., :4], zv, dists)

    field_st, vars_st = _jax_field(nerf_st, in_pts, in_views, in_feat, True)
    src_imgs, src_w2cs, src_intrs = (jnp.asarray(imgs[:V]),
                                     jnp.asarray(w2cs[:V]),
                                     jnp.asarray(intrs[:V]))

    def static_feats(pts_world, ndc):
        vol = render.sample_volume_features(vol_got, ndc)
        col = render.build_color_features(pts_world, src_imgs, src_w2cs,
                                          src_intrs)
        return jnp.concatenate([vol, col], -1)

    models = render.RenderModels(
        static_fn=lambda p, f, v: field_st.apply(vars_st, p, f, v),
        static_feats=static_feats, multires=MULTIRES,
        multires_views=MULTIRES_VIEWS)
    with jax.default_matmul_precision("highest"):
        got = render.render_rays(models, rays, im_w2c_ref=src_w2cs[0],
                                 scene_flow=False, raw_noise_std=0.0)
    # the encoder contributes its own (already-gated) 1e-3-level error budget
    np.testing.assert_allclose(np.asarray(got["rgb_map"]), rgb_want.numpy(),
                               rtol=5e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(got["depth_map"]),
                               depth_want.numpy(), rtol=5e-3, atol=1e-3)
