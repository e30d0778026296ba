"""Pallas TPU kernel: fused NeRF-MLP evaluation (trunk + heads in VMEM).

The reference evaluates the conditioned NeRF MLP (``/root/reference/
networks.py:73-221``, v0 multiplicative bias) 3-5x per training step over
~142k points; under XLA each Dense is a separate HBM-roundtripping fusion —
profiled at ~171 ms/step on a v5e (BENCH_NOTES round 2), ~13 TFLOP/s effective.

This kernel keeps ALL weights (~0.6M params ≈ 2.4 MB f32) and a tile of point
activations resident in VMEM and runs the whole field — conditioning bias,
8-layer trunk with the skip concat, and the rgb/alpha/sceneflow heads — as one
grid of back-to-back MXU matmuls. The backward kernel recomputes the forward
activations per tile (FLOPs are cheaper than HBM) and accumulates weight
gradients across grid steps into resident output refs.

Skip/view concats are expressed as split matmuls (``[a, b] @ W = a @ W_top +
b @ W_bot``) — no lane-unaligned concatenates inside the kernel.

Precision: trunk/conditioning/view matmuls run 1-pass bf16 with f32
accumulation in ``approx`` mode (the XLA default for f32 dots on TPU rounds
operands through bf16 as well); the alpha/rgb/w/sf/prob HEAD matmuls keep f32
operands at DEFAULT precision, matching what nerf.py's f32 head Dense layers
do on the same backend ("heads stay f32 for stable σ/flow outputs"). Exact
6-pass f32 everywhere in non-approx mode (CPU tests compare against a NumPy
oracle).

Restrictions (checked by ``supports_fused``): net_type v0, use_viewdirs, and
volume-feature conditioning present. Other configurations fall back to the
Flax module — the kernel is purely a fast path with identical semantics.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 256


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# ---------------------------------------------------------------------------
# static configuration + parameter flattening
# ---------------------------------------------------------------------------

class FieldSpec:
    """Static shape/topology info for one NeRFField instantiation."""

    def __init__(self, depth, width, in_ch_pts, in_ch_views, in_ch_feat,
                 skips, sceneflow, static):
        self.depth = depth
        self.width = width
        self.P = in_ch_pts
        self.V = in_ch_views
        self.F = in_ch_feat
        self.skips = tuple(skips)
        self.sceneflow = sceneflow
        self.static = static
        # trunk layer dims — mirrors models.nerf._trunk_layer_dims
        dims = []
        for i in range(depth - 1):
            if i == 0:
                dims.append((in_ch_pts, width))
            if i in self.skips:
                dims.append((width + in_ch_pts, width))
            else:
                dims.append((width, width))
        self.layer_dims = dims
        self.out_ch = 4 + ((1 if static else 8) if sceneflow else 0)
        self.out_pad = _round_up(self.out_ch, 8)

    def key(self):
        return (self.depth, self.width, self.P, self.V, self.F, self.skips,
                self.sceneflow, self.static)


def supports_fused(field) -> bool:
    """True when the NeRFField configuration maps onto this kernel."""
    return (field.net_type == "v0" and field.use_viewdirs
            and (field.use_mvs or False))


_PARAM_ORDER_BASE = ["pts_bias"]


def _param_names(spec: FieldSpec):
    names = ["pts_bias"]
    names += [f"pts_linears_{i}" for i in range(len(spec.layer_dims))]
    if spec.sceneflow:
        names += ["w_linear"] if spec.static else ["sf_linear", "prob_linear"]
    names += ["alpha_linear", "feature_linear", "views_linears_0", "rgb_linear"]
    return names


def flatten_params(variables, spec: FieldSpec):
    """Flax variables → flat list [(kernel, bias[1, out]), ...] in kernel order."""
    p = variables["params"]
    flat = []
    for n in _param_names(spec):
        k = p[n]["kernel"]
        b = p[n]["bias"][None, :]
        flat += [k, b]
    return flat


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

# matmul modes: True = approx trunk (bf16 operands, 1-pass), "head" = f32
# operands at DEFAULT precision — byte-for-byte what the Flax f32 head Dense
# does on the same backend (one bf16 MXU pass on TPU, true f32 under the
# tests' pinned float32 default) without HIGHEST's 6-pass scratch, which
# exceeds the 16 MB scoped-vmem limit in the bwd kernel — False = exact
# 6-pass f32 (non-approx mode).

def _head_mode(approx):
    return "head" if approx else False


def _prep(a, b, mode):
    if mode is True:
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
    prec = (jax.lax.Precision.HIGHEST if mode is False
            else jax.lax.Precision.DEFAULT)
    return a, b, prec


def _mm(a, b, mode):
    a, b, prec = _prep(a, b, mode)
    return jnp.dot(a, b, preferred_element_type=jnp.float32, precision=prec)


def _mm_t(a, b, mode):
    """aᵀ @ b with the same dtype policy (contraction over rows)."""
    a, b, prec = _prep(a, b, mode)
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=prec)


def _mm_bt(a, b, mode):
    """a @ bᵀ (contraction over last dims)."""
    a, b, prec = _prep(a, b, mode)
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=prec)


def _forward_tile(pts, feats, views, wr, spec: FieldSpec, approx,
                  want_intermediates=False):
    """One tile through the field. ``wr`` = dict name → (W, b) VMEM values."""
    bias = _mm(feats, wr["pts_bias"][0], approx) + wr["pts_bias"][1]

    h = pts
    zs, hs = [], []   # z_i (pre-bias product), h_i (post-relu, pre-concat)
    n_layers = len(spec.layer_dims)
    for i in range(n_layers):
        W, b = wr[f"pts_linears_{i}"]
        if i - 1 in spec.skips and i > 0:
            # split matmul for the skip concat [pts, h_prev]
            z = (_mm(pts, W[:spec.P], approx)
                 + _mm(h, W[spec.P:], approx) + b)
        else:
            z = _mm(h, W, approx) + b
        a = z * bias
        hn = jnp.maximum(a, 0.0)
        if want_intermediates:
            zs.append(z)
            hs.append(h)      # input of layer i (pre-concat part, h only)
        h = hn

    # head matmuls (w/sf/prob/alpha/rgb) keep f32 operands even in approx
    # mode, matching nerf.py's precision policy ("heads stay f32 for stable
    # σ/flow outputs"): _head_mode = the Flax f32 head Dense semantics
    hm = _head_mode(approx)
    extras = []
    if spec.sceneflow:
        if spec.static:
            Ww, bw = wr["w_linear"]
            extras.append(jax.nn.sigmoid(_mm(h, Ww, hm) + bw))
        else:
            Ws, bs = wr["sf_linear"]
            Wp, bp = wr["prob_linear"]
            extras.append(jnp.tanh(_mm(h, Ws, hm) + bs))
            extras.append(jax.nn.sigmoid(_mm(h, Wp, hm) + bp))

    Wa, ba = wr["alpha_linear"]
    alpha = _mm(h, Wa, hm) + ba
    Wf, bf = wr["feature_linear"]
    feature = _mm(h, Wf, approx) + bf
    Wv, bv = wr["views_linears_0"]
    zv = (_mm(feature, Wv[:spec.width], approx)
          + _mm(views, Wv[spec.width:], approx) + bv)
    hv = jnp.maximum(zv, 0.0)
    Wr, br = wr["rgb_linear"]
    rgb = _mm(hv, Wr, hm) + br

    out = jnp.concatenate([rgb, alpha] + extras, axis=-1)
    if not want_intermediates:
        return out
    inter = dict(bias=bias, zs=zs, hs=hs, h_last=h, feature=feature, hv=hv,
                 extras=extras)
    return out, inter


def _names_wb(spec):
    return _param_names(spec)


def _fwd_kernel(*refs, spec: FieldSpec, approx, n_wb):
    pts_ref, feats_ref, views_ref = refs[:3]
    w_refs = refs[3:3 + 2 * n_wb]
    out_ref = refs[3 + 2 * n_wb]
    wr = {}
    names = _names_wb(spec)
    for i, n in enumerate(names):
        wr[n] = (w_refs[2 * i][...], w_refs[2 * i + 1][...])
    out = _forward_tile(pts_ref[...], feats_ref[...], views_ref[...], wr,
                        spec, approx)
    pad = spec.out_pad - spec.out_ch
    if pad:
        out = jnp.pad(out, ((0, 0), (0, pad)))
    out_ref[...] = out


def _bwd_kernel(*refs, spec: FieldSpec, approx, n_wb):
    (pts_ref, feats_ref, views_ref, g_ref) = refs[:4]
    w_refs = refs[4:4 + 2 * n_wb]
    # outputs: d_pts, d_feats, d_views, then (dW, db) per param
    d_pts_ref, d_feats_ref, d_views_ref = refs[4 + 2 * n_wb:7 + 2 * n_wb]
    dw_refs = refs[7 + 2 * n_wb:]
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        for r in dw_refs:
            r[...] = jnp.zeros_like(r)

    names = _names_wb(spec)
    wr = {}
    for i, n in enumerate(names):
        wr[n] = (w_refs[2 * i][...], w_refs[2 * i + 1][...])

    pts = pts_ref[...]
    feats = feats_ref[...]
    views = views_ref[...]
    _, it = _forward_tile(pts, feats, views, wr, spec, approx,
                          want_intermediates=True)
    g = g_ref[...][:, :spec.out_ch]

    dW = {}

    def acc(name, dWv, dbv):
        dW[name] = (dWv, dbv)

    # ---- heads (f32-operand mode, matching the forward's head policy) ----
    hm = _head_mode(approx)
    g_rgb = g[:, :3]
    g_alpha = g[:, 3:4]
    col = 4
    d_h = jnp.zeros_like(it["h_last"])
    if spec.sceneflow:
        if spec.static:
            e = it["extras"][0]
            g_w = g[:, col:col + 1] * e * (1.0 - e)
            col += 1
            Ww, _ = wr["w_linear"]
            acc("w_linear", _mm_t(it["h_last"], g_w, hm),
                jnp.sum(g_w, 0, keepdims=True))
            d_h = d_h + _mm_bt(g_w, Ww, hm)
        else:
            e_sf = it["extras"][0]
            g_sf = g[:, col:col + 6] * (1.0 - e_sf * e_sf)
            col += 6
            e_p = it["extras"][1]
            g_p = g[:, col:col + 2] * e_p * (1.0 - e_p)
            col += 2
            Ws, _ = wr["sf_linear"]
            Wp, _ = wr["prob_linear"]
            acc("sf_linear", _mm_t(it["h_last"], g_sf, hm),
                jnp.sum(g_sf, 0, keepdims=True))
            acc("prob_linear", _mm_t(it["h_last"], g_p, hm),
                jnp.sum(g_p, 0, keepdims=True))
            d_h = d_h + _mm_bt(g_sf, Ws, hm) + _mm_bt(g_p, Wp, hm)

    Wr, _ = wr["rgb_linear"]
    acc("rgb_linear", _mm_t(it["hv"], g_rgb, hm),
        jnp.sum(g_rgb, 0, keepdims=True))
    d_hv = _mm_bt(g_rgb, Wr, hm) * (it["hv"] > 0.0)
    Wv, _ = wr["views_linears_0"]
    W = spec.width
    acc("views_linears_0",
        jnp.concatenate([_mm_t(it["feature"], d_hv, approx),
                         _mm_t(views, d_hv, approx)], axis=0),
        jnp.sum(d_hv, 0, keepdims=True))
    d_feature = _mm_bt(d_hv, Wv[:W], approx)
    d_views = _mm_bt(d_hv, Wv[W:], approx)

    Wf, _ = wr["feature_linear"]
    acc("feature_linear", _mm_t(it["h_last"], d_feature, approx),
        jnp.sum(d_feature, 0, keepdims=True))
    d_h = d_h + _mm_bt(d_feature, Wf, approx)

    Wa, _ = wr["alpha_linear"]
    acc("alpha_linear", _mm_t(it["h_last"], g_alpha, hm),
        jnp.sum(g_alpha, 0, keepdims=True))
    d_h = d_h + _mm_bt(g_alpha, Wa, hm)

    # ---- trunk (reverse) ----
    bias = it["bias"]
    d_bias = jnp.zeros_like(bias)
    d_pts = jnp.zeros_like(pts)
    n_layers = len(spec.layer_dims)
    for i in range(n_layers - 1, -1, -1):
        z = it["zs"][i]
        h_in = it["hs"][i]          # layer input (post-concat h part only)
        a_pos = (z * bias) > 0.0
        d_a = d_h * a_pos
        d_bias = d_bias + d_a * z
        d_z = d_a * bias
        W, _ = wr[f"pts_linears_{i}"]
        if i - 1 in spec.skips and i > 0:
            acc(f"pts_linears_{i}",
                jnp.concatenate([_mm_t(pts, d_z, approx),
                                 _mm_t(h_in, d_z, approx)], axis=0),
                jnp.sum(d_z, 0, keepdims=True))
            d_pts = d_pts + _mm_bt(d_z, W[:spec.P], approx)
            d_h = _mm_bt(d_z, W[spec.P:], approx)
        else:
            acc(f"pts_linears_{i}", _mm_t(h_in, d_z, approx),
                jnp.sum(d_z, 0, keepdims=True))
            d_h = _mm_bt(d_z, W, approx)
    # d_h now w.r.t. layer-0 input == pts
    d_pts = d_pts + d_h

    Wb, _ = wr["pts_bias"]
    acc("pts_bias", _mm_t(feats, d_bias, approx),
        jnp.sum(d_bias, 0, keepdims=True))
    d_feats = _mm_bt(d_bias, Wb, approx)

    d_pts_ref[...] = d_pts
    d_feats_ref[...] = d_feats
    d_views_ref[...] = d_views
    for i, n in enumerate(names):
        dWv, dbv = dW[n]
        dw_refs[2 * i][...] = dw_refs[2 * i][...] + dWv
        dw_refs[2 * i + 1][...] = dw_refs[2 * i + 1][...] + dbv


# ---------------------------------------------------------------------------
# pallas_call wrappers + custom VJP
# ---------------------------------------------------------------------------

def _interp() -> bool:
    return jax.default_backend() != "tpu"


def _weight_specs(flat):
    # default-arg binding: comprehension lambdas otherwise all close over the
    # last loop value
    return [pl.BlockSpec(a.shape, lambda t, nd=a.ndim: (0,) * nd) for a in flat]


def _fwd_pallas(pts, feats, views, flat, spec: FieldSpec, approx):
    N = pts.shape[0]
    NT = N // TILE
    n_wb = len(flat) // 2
    kern = functools.partial(_fwd_kernel, spec=spec, approx=approx, n_wb=n_wb)
    return pl.pallas_call(
        kern,
        grid=(NT,),
        in_specs=[
            pl.BlockSpec((TILE, spec.P), lambda t: (t, 0)),
            pl.BlockSpec((TILE, spec.F), lambda t: (t, 0)),
            pl.BlockSpec((TILE, spec.V), lambda t: (t, 0)),
            *_weight_specs(flat),
        ],
        out_specs=pl.BlockSpec((TILE, spec.out_pad), lambda t: (t, 0)),
        out_shape=jax.ShapeDtypeStruct((N, spec.out_pad), jnp.float32),
        interpret=_interp(),
    )(pts, feats, views, *flat)


def _bwd_pallas(pts, feats, views, g, flat, spec: FieldSpec, approx):
    N = pts.shape[0]
    NT = N // TILE
    n_wb = len(flat) // 2
    kern = functools.partial(_bwd_kernel, spec=spec, approx=approx, n_wb=n_wb)
    dw_shapes = [jax.ShapeDtypeStruct(a.shape, jnp.float32) for a in flat]
    dw_specs = _weight_specs(flat)
    outs = pl.pallas_call(
        kern,
        grid=(NT,),
        in_specs=[
            pl.BlockSpec((TILE, spec.P), lambda t: (t, 0)),
            pl.BlockSpec((TILE, spec.F), lambda t: (t, 0)),
            pl.BlockSpec((TILE, spec.V), lambda t: (t, 0)),
            pl.BlockSpec((TILE, spec.out_pad), lambda t: (t, 0)),
            *_weight_specs(flat),
        ],
        out_specs=[
            pl.BlockSpec((TILE, spec.P), lambda t: (t, 0)),
            pl.BlockSpec((TILE, spec.F), lambda t: (t, 0)),
            pl.BlockSpec((TILE, spec.V), lambda t: (t, 0)),
            *dw_specs,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, spec.P), jnp.float32),
            jax.ShapeDtypeStruct((N, spec.F), jnp.float32),
            jax.ShapeDtypeStruct((N, spec.V), jnp.float32),
            *dw_shapes,
        ],
        interpret=_interp(),
    )(pts, feats, views, g, *flat)
    return outs[0], outs[1], outs[2], list(outs[3:])


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _core(spec_key, approx, pts, feats, views, flat):
    spec = _SPECS[spec_key]
    return _fwd_pallas(pts, feats, views, list(flat), spec, approx)


def _core_fwd(spec_key, approx, pts, feats, views, flat):
    out = _core(spec_key, approx, pts, feats, views, flat)
    return out, (pts, feats, views, flat)


def _core_bwd(spec_key, approx, res, g):
    spec = _SPECS[spec_key]
    pts, feats, views, flat = res
    d_pts, d_feats, d_views, d_flat = _bwd_pallas(pts, feats, views, g,
                                                  list(flat), spec, approx)
    return d_pts, d_feats, d_views, tuple(d_flat)


_core.defvjp(_core_fwd, _core_bwd)

_SPECS: dict = {}


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def fused_nerf_apply(field, variables, pts, feats, views, approx: bool):
    """Evaluate a v0 NeRFField with the fused kernel.

    Args:
        field: the models.nerf.NeRFField module (for static topology).
        variables: its Flax params.
        pts/feats/views: [..., P] / [..., F] / [..., V] (same leading dims).
    Returns: [..., out_ch] raw field outputs, exactly like ``field.apply``.
    """
    spec = FieldSpec(field.depth, field.width, field.in_ch_pts,
                     field.in_ch_views, field.in_ch_feat, field.skips,
                     field.sceneflow, field.static)
    _SPECS[spec.key()] = spec
    lead = pts.shape[:-1]
    N = 1
    for d in lead:
        N *= d
    Np = _round_up(max(N, 1), TILE)

    def flat2(x, ch):
        x = x.reshape(N, ch).astype(jnp.float32)
        return jnp.pad(x, ((0, Np - N), (0, 0)))

    pts2 = flat2(pts, spec.P)
    feats2 = flat2(feats, spec.F)
    views2 = flat2(views, spec.V)
    flat = tuple(a.astype(jnp.float32) for a in flatten_params(variables, spec))
    out = _core(spec.key(), approx, pts2, feats2, views2, flat)
    return out[:N, :spec.out_ch].reshape(lead + (spec.out_ch,))
