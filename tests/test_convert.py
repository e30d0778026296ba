"""Checkpoint-converter parity: torch modules with random weights vs converted
flax params produce the same outputs (torch CPU as oracle)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

from zest_tpu.convert import (_conv2d, _conv3d, _deconv3d, convert_nerf)
from zest_tpu.models.nerf import NeRFField
from zest_tpu.models.feature_net import ConvBnReLU
from zest_tpu.models.cost_reg import _UpConvBn


def test_conv2d_block_parity():
    """Conv2d(bias=False) + batch-stat BN + leaky_relu(0.01)."""
    torch.manual_seed(0)
    conv = tnn.Conv2d(3, 8, 3, padding=1, bias=False)
    bn = tnn.BatchNorm2d(8, eps=1e-5, affine=True)
    bn.weight.data.uniform_(0.5, 1.5)
    bn.bias.data.uniform_(-0.5, 0.5)
    bn.train()
    x = torch.randn(2, 3, 10, 12)
    with torch.no_grad():
        ref = tF.leaky_relu(bn(conv(x)), 0.01).numpy()

    blk = ConvBnReLU(8, 3, 1)
    params = {"params": {
        "conv": {"kernel": jnp.asarray(_conv2d(conv.weight.detach().numpy()))},
        "bn": {"scale": jnp.asarray(bn.weight.detach().numpy()),
               "bias": jnp.asarray(bn.bias.detach().numpy())}}}
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    out = blk.apply(params, xj)
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               atol=2e-3)


def test_deconv3d_block_parity():
    """ConvTranspose3d(k3,s2,p1,op1,bias=False) + BN + leaky_relu."""
    torch.manual_seed(1)
    deconv = tnn.ConvTranspose3d(4, 6, 3, stride=2, padding=1, output_padding=1,
                                 bias=False)
    bn = tnn.BatchNorm3d(6)
    bn.weight.data.uniform_(0.5, 1.5)
    bn.bias.data.uniform_(-0.5, 0.5)
    bn.train()
    x = torch.randn(1, 4, 4, 4, 6)[..., :4]  # [1,4,4,4,4]
    x = torch.randn(1, 4, 4, 4, 4)
    with torch.no_grad():
        ref = tF.leaky_relu(bn(deconv(x)), 0.01).numpy()

    blk = _UpConvBn(6)
    params = {"params": {
        "deconv_kernel": jnp.asarray(_deconv3d(deconv.weight.detach().numpy())),
        "bn": {"scale": jnp.asarray(bn.weight.detach().numpy()),
               "bias": jnp.asarray(bn.bias.detach().numpy())}}}
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 4, 1))
    out = blk.apply(params, xj)
    np.testing.assert_allclose(np.asarray(out).transpose(0, 4, 1, 2, 3), ref,
                               atol=2e-3)


def _torch_v0_mlp(in_pts, in_feat, in_views, W=32, D=8, static=True):
    """Compact torch oracle of the reference v0 NeRF forward semantics
    (multiplicative feature bias, skip at 4, sceneflow heads)."""
    torch.manual_seed(2)
    layers = []
    for i in range(D - 1):
        if i == 0:
            layers.append(tnn.Linear(in_pts, W))
        if i == 4:
            layers.append(tnn.Linear(W + in_pts, W))
        else:
            layers.append(tnn.Linear(W, W))
    mods = {
        "pts_linears": tnn.ModuleList(layers),
        "pts_bias": tnn.Linear(in_feat, W),
        "alpha_linear": tnn.Linear(W, 1),
        "feature_linear": tnn.Linear(W, W),
        "views_linears_0": tnn.Linear(W + in_views, W // 2),
        "rgb_linear": tnn.Linear(W // 2, 3),
    }
    if static:
        mods["w_linear"] = tnn.Linear(W, 1)
    else:
        mods["sf_linear"] = tnn.Linear(W, 6)
        mods["prob_linear"] = tnn.Linear(W, 2)
    net = tnn.ModuleDict(mods)

    def forward(pts, feat, views):
        h = pts
        bias = net["pts_bias"](feat)
        for i, l in enumerate(net["pts_linears"]):
            h = torch.relu(l(h) * bias)
            if i == 4:
                h = torch.cat([pts, h], -1)
        extras = []
        if static:
            extras.append(torch.sigmoid(net["w_linear"](h)))
        else:
            extras.append(torch.tanh(net["sf_linear"](h)))
            extras.append(torch.sigmoid(net["prob_linear"](h)))
        alpha = net["alpha_linear"](h)
        f = net["feature_linear"](h)
        hv = torch.relu(net["views_linears_0"](torch.cat([f, views], -1)))
        rgb = net["rgb_linear"](hv)
        return torch.cat([rgb, alpha] + extras, -1)

    return net, forward


def test_nerf_v0_forward_parity():
    in_pts, in_feat, in_views = 21, 12, 9
    net, fwd = _torch_v0_mlp(in_pts, in_feat, in_views, static=False)

    # build a fake state dict with the reference key layout
    sd = {}
    for i, l in enumerate(net["pts_linears"]):
        sd[f"x.pts_linears.{i}.weight"] = l.weight.detach().numpy()
        sd[f"x.pts_linears.{i}.bias"] = l.bias.detach().numpy()
    for name in ("pts_bias", "alpha_linear", "feature_linear", "rgb_linear",
                 "sf_linear", "prob_linear"):
        sd[f"x.{name}.weight"] = net[name].weight.detach().numpy()
        sd[f"x.{name}.bias"] = net[name].bias.detach().numpy()
    sd["x.views_linears.0.weight"] = net["views_linears_0"].weight.detach().numpy()
    sd["x.views_linears.0.bias"] = net["views_linears_0"].bias.detach().numpy()

    params = convert_nerf(sd, "x")
    field = NeRFField(depth=8, width=32, in_ch_pts=in_pts, in_ch_views=in_views,
                      in_ch_feat=in_feat, net_type="v0", sceneflow=True,
                      static=False, use_mvs=True)

    rng = np.random.default_rng(0)
    pts = rng.normal(size=(5, 7, in_pts)).astype(np.float32)
    feat = rng.normal(size=(5, 7, in_feat)).astype(np.float32)
    views = rng.normal(size=(5, 7, in_views)).astype(np.float32)

    with torch.no_grad():
        ref = fwd(torch.from_numpy(pts), torch.from_numpy(feat),
                  torch.from_numpy(views)).numpy()
    out = field.apply(params, jnp.asarray(pts), jnp.asarray(feat),
                      jnp.asarray(views))
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-3)
