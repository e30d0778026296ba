"""NeRF radiance fields (static / dynamic scene-flow heads), Flax.

Functional re-design of the reference MLPs (``/root/reference/networks.py:73-353``):

- ``net_type='v0'`` (``Renderer``): per-layer **multiplicative** conditioning on the
  volume feature bias: h = ReLU(FC(h) * FC(feat)). Raw rgb/alpha outputs (activations
  applied downstream in the compositor, renderer.py:134,141).
- ``net_type='v2'`` (``Renderer_linear``): **additive** bias h = ReLU(FC(h) + FC(feat)),
  sigmoid(rgb) / relu(alpha) applied in the head (note the reference then re-applies
  sigmoid/relu in raw2outputs — a quirk we reproduce downstream, not here).

Head layout of the output vector (last axis), matching the reference exactly:
  [rgb(3), alpha(1)] ++ (sceneflow & static → [blend_w(1)])
                     ++ (sceneflow & dynamic → [sf_bwd(3), sf_fwd(3), prob(2)])

Layer topology reproduces the reference constructor loop (networks.py:93-100): for
D=8, skips=(4,): 8 linear layers with the skip concat of the raw input after layer
index 4. The MLP is pointwise over ray samples — all leading dims are batch.
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .init import torch_dense_kernel_init, torch_dense_bias_init


def _dense(features: int, fan_in: int, name: str = None,
           dtype=jnp.float32) -> nn.Dense:
    return nn.Dense(features, kernel_init=torch_dense_kernel_init,
                    bias_init=torch_dense_bias_init(fan_in), name=name,
                    dtype=dtype)


def _trunk_layer_dims(depth: int, width: int, in_ch: int, skips: Sequence[int]):
    """Reproduce the reference layer-list construction (networks.py:93-100).

    Returns a list of (fan_in, fan_out) and the set of layer indices *after* which
    the input skip-concat happens (forward loop: ``if i in skips`` tested on the
    enumerated layer index, networks.py:181-182).
    """
    dims = []
    for i in range(depth - 1):
        if i == 0:
            dims.append((in_ch, width))
        if i in skips:
            dims.append((width + in_ch, width))
        else:
            dims.append((width, width))
    return dims


class NeRFField(nn.Module):
    """NeRF MLP with optional volume-feature conditioning and scene-flow heads."""
    depth: int = 8
    width: int = 256
    in_ch_pts: int = 63
    in_ch_views: int = 27
    in_ch_feat: int = 8
    out_ch: int = 4
    skips: Sequence[int] = (4,)
    net_type: str = "v0"          # 'v0' multiplicative bias | 'v2' additive bias
    use_viewdirs: bool = True
    sceneflow: bool = False
    static: bool = True
    use_mvs: bool = False          # v0: condition on volume features
    dtype: object = jnp.float32    # compute dtype (bf16 under --precision 16;
                                   # heads stay f32 for stable σ/flow outputs)

    @nn.compact
    def __call__(self, pts: jnp.ndarray, feats: Optional[jnp.ndarray] = None,
                 views: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Args:
            pts:   [..., in_ch_pts] embedded points.
            feats: [..., in_ch_feat] conditioning features (required if use_mvs/v2).
            views: [..., in_ch_views] embedded view dirs (required if use_viewdirs).
        Returns: [..., out_dim] raw field outputs (layout in module docstring).
        """
        use_bias_cond = self.use_mvs if self.net_type == "v0" else True
        multiplicative = self.net_type == "v0"
        dt = self.dtype

        bias = None
        if use_bias_cond:
            bias = _dense(self.width, self.in_ch_feat, name="pts_bias",
                          dtype=dt)(feats.astype(dt))

        h = pts.astype(dt)
        pts_in = h
        dims = _trunk_layer_dims(self.depth, self.width, self.in_ch_pts, self.skips)
        for i, (fan_in, fan_out) in enumerate(dims):
            h = _dense(fan_out, fan_in, name=f"pts_linears_{i}", dtype=dt)(h)
            if bias is not None:
                h = h * bias if multiplicative else h + bias
            h = nn.relu(h)
            if i in self.skips:
                h = jnp.concatenate([pts_in, h], axis=-1)
        h = h.astype(jnp.float32)

        extras = []
        if self.sceneflow:
            if self.static:
                # blending weight head (networks.py:118,187)
                extras.append(nn.sigmoid(_dense(1, self.width, name="w_linear")(h)))
            else:
                # scene flow + disocclusion-confidence heads (networks.py:122-123,190-191)
                extras.append(jnp.tanh(_dense(6, self.width, name="sf_linear")(h)))
                extras.append(nn.sigmoid(_dense(2, self.width, name="prob_linear")(h)))

        if self.use_viewdirs:
            alpha = _dense(1, self.width, name="alpha_linear")(h)
            if self.net_type == "v2":
                alpha = nn.relu(alpha)
            feature = _dense(self.width, self.width, name="feature_linear",
                             dtype=dt)(h.astype(dt))
            hv = jnp.concatenate([feature, views.astype(dt)], axis=-1)
            hv = nn.relu(_dense(self.width // 2, self.width + self.in_ch_views,
                                name="views_linears_0", dtype=dt)(hv))
            rgb = _dense(3, self.width // 2, name="rgb_linear")(
                hv.astype(jnp.float32))
            if self.net_type == "v2":
                rgb = nn.sigmoid(rgb)
            out = jnp.concatenate([rgb, alpha], axis=-1)
        else:
            out = _dense(self.out_ch, self.width, name="output_linear")(h)

        if extras:
            out = jnp.concatenate([out] + extras, axis=-1)
        return out

    def forward_alpha(self, pts, feats):
        """σ-only path (networks.py:134-147). Note the reference's forward_alpha
        applies the bias unconditionally (no use_mvs guard) and ReLUs alpha."""
        raise NotImplementedError("alpha-only fast path not exercised by any config; "
                                  "reference reaches it only when view dirs are absent")


def output_dim(sceneflow: bool, static: bool) -> int:
    """Raw output channel count for a field configuration."""
    d = 4
    if sceneflow:
        d += 1 if static else 8
    return d
