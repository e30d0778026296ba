"""Fused NeRF-MLP Pallas kernel vs the Flax NeRFField (interpret mode, CPU).

The kernel pins Precision.HIGHEST in exact (non-approx) mode; the Flax module
uses the jax default, which rounds matmul operands through bf16 even on CPU —
so the comparison runs under jax.default_matmul_precision('highest')."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zest_tpu.models.nerf import NeRFField
from zest_tpu.kernels.fused_mlp import fused_nerf_apply, supports_fused


def _setup(static, sceneflow=True, P=63, F=40, V=27, depth=8, width=256):
    field = NeRFField(depth=depth, width=width, in_ch_pts=P, in_ch_views=V,
                      in_ch_feat=F, net_type="v0", sceneflow=sceneflow,
                      static=static, use_mvs=True)
    rng = np.random.default_rng(0 if static else 1)
    variables = field.init(jax.random.PRNGKey(3),
                           jnp.zeros((1, 1, P)), jnp.zeros((1, 1, F)),
                           jnp.zeros((1, 1, V)))
    R, S = 37, 16   # N = 592, not a tile multiple
    pts = jnp.asarray(rng.normal(size=(R, S, P)).astype(np.float32))
    feats = jnp.asarray(rng.normal(size=(R, S, F)).astype(np.float32))
    views = jnp.asarray(rng.normal(size=(R, S, V)).astype(np.float32))
    return field, variables, pts, feats, views


@pytest.mark.parametrize("static", [True, False])
def test_fused_forward_matches_flax(static):
    field, variables, pts, feats, views = _setup(static)
    assert supports_fused(field)
    with jax.default_matmul_precision("highest"):
        ref = field.apply(variables, pts, feats, views)
        out = fused_nerf_apply(field, variables, pts, feats, views,
                               approx=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("static", [True, False])
def test_fused_grads_match_flax(static):
    field, variables, pts, feats, views = _setup(static, width=64, depth=8,
                                                 P=33, F=24, V=15)
    rng = np.random.default_rng(7)
    out_ch = 4 + (1 if static else 8)
    g = jnp.asarray(rng.normal(size=pts.shape[:2] + (out_ch,))
                    .astype(np.float32))

    with jax.default_matmul_precision("highest"):
        def loss_ref(v, p, f, vw):
            return jnp.vdot(field.apply(v, p, f, vw), g)

        def loss_kern(v, p, f, vw):
            return jnp.vdot(fused_nerf_apply(field, v, p, f, vw,
                                             approx=False), g)

        gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(variables, pts, feats,
                                                      views)
        gk = jax.grad(loss_kern, argnums=(0, 1, 2, 3))(variables, pts, feats,
                                                       views)

    # input grads
    for a, b, name in [(gk[1], gr[1], "d_pts"), (gk[2], gr[2], "d_feats"),
                       (gk[3], gr[3], "d_views")]:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4, err_msg=name)
    # weight grads
    flat_r = jax.tree_util.tree_leaves_with_path(gr[0])
    flat_k = jax.tree_util.tree_leaves_with_path(gk[0])
    assert len(flat_r) == len(flat_k)
    for (pr, ar), (pk, ak) in zip(flat_r, flat_k):
        assert pr == pk
        np.testing.assert_allclose(
            np.asarray(ak), np.asarray(ar), rtol=2e-4, atol=2e-4,
            err_msg=jax.tree_util.keystr(pr))
