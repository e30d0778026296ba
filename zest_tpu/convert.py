"""Reference-checkpoint converter: PyTorch-Lightning ``.ckpt`` → zest-tpu params.

One-way converter so reference checkpoints (``MVSNeRFSystem`` state dicts,
/root/reference/train.py:57-192) can be evaluated in this framework for numerics
parity (SURVEY §7.1 "checkpoint compatibility").

Weight-layout mappings (verified numerically against torch CPU):
- Linear:        torch [out, in]            → Dense kernel [in, out] (transpose)
- Conv2d:        torch [out, in, kh, kw]    → [kh, kw, in, out]  (2,3,1,0)
- Conv3d:        torch [out, in, kd, kh, kw]→ [kd, kh, kw, in, out]  (2,3,4,1,0)
- ConvTranspose3d: torch [in, out, kd, kh, kw] → flip spatial dims then
  (2,3,4,0,1) — our `_UpConvBn` stores the pre-flipped kernel and applies an
  lhs-dilated conv with padding (1,2), exactly torch's (k=3,s=2,p=1,op=1)
- InPlaceABN:    weight/bias → bn scale/bias (running stats unused — the
  reference forces train-mode batch stats everywhere, train.py:868)

Requires torch only at conversion time.
"""
from __future__ import annotations

import re
from typing import Dict

import numpy as np


def load_torch_state_dict(ckpt_path) -> Dict[str, np.ndarray]:
    import torch
    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    return {k: v.detach().numpy() for k, v in sd.items()
            if hasattr(v, "detach")}


def _dense(sd, prefix):
    return {"kernel": sd[prefix + ".weight"].T,
            "bias": sd[prefix + ".bias"]}


def convert_nerf(sd: Dict[str, np.ndarray], prefix: str) -> dict:
    """Convert one ``MVSNeRF`` field (networks.py:73-353). prefix e.g.
    'nerf_static.nerf'."""
    out = {}
    i = 0
    while f"{prefix}.pts_linears.{i}.weight" in sd:
        out[f"pts_linears_{i}"] = _dense(sd, f"{prefix}.pts_linears.{i}")
        i += 1
    for name in ("pts_bias", "alpha_linear", "feature_linear", "rgb_linear",
                 "w_linear", "sf_linear", "prob_linear", "output_linear"):
        if f"{prefix}.{name}.weight" in sd:
            out[name] = _dense(sd, f"{prefix}.{name}")
    if f"{prefix}.views_linears.0.weight" in sd:
        out["views_linears_0"] = _dense(sd, f"{prefix}.views_linears.0")
    return {"params": out}


def _conv2d(w):
    return np.transpose(w, (2, 3, 1, 0))


def _conv3d(w):
    return np.transpose(w, (2, 3, 4, 1, 0))


def _deconv3d(w):
    return np.ascontiguousarray(
        np.transpose(w[:, :, ::-1, ::-1, ::-1], (2, 3, 4, 0, 1)))


def _abn(sd, prefix):
    return {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}


def convert_mvsnet(sd: Dict[str, np.ndarray], prefix: str) -> dict:
    """Convert one ``MVSNet`` encoder (networks.py:1061-1238). prefix e.g.
    'encoding_net'."""
    feat = {}
    for blk, n_layers in (("conv0", 2), ("conv1", 3), ("conv2", 3)):
        for j in range(n_layers):
            tp = f"{prefix}.feature.{blk}.{j}"
            feat[f"{blk}_{j}"] = {
                "conv": {"kernel": _conv2d(sd[tp + ".conv.weight"])},
                "bn": _abn(sd, tp + ".bn"),
            }
    feat["toplayer"] = {"kernel": _conv2d(sd[f"{prefix}.feature.toplayer.weight"]),
                        "bias": sd[f"{prefix}.feature.toplayer.bias"]}

    reg = {}
    for name in ("conv0", "conv1", "conv2", "conv3", "conv4", "conv5", "conv6"):
        tp = f"{prefix}.cost_reg_2.{name}"
        k = _conv3d(sd[tp + ".conv.weight"])
        if name == "conv0":
            # the cost volume is zero-padded 41 → 48 channels for TPU tiling;
            # pad the kernel's input channels to match (inert zeros)
            pad_c = (-k.shape[3]) % 8
            if pad_c:
                k = np.pad(k, ((0, 0),) * 3 + ((0, pad_c), (0, 0)))
        reg[name] = {"conv": {"kernel": k},
                     "bn": _abn(sd, tp + ".bn")}
    for name in ("conv7", "conv9", "conv11"):
        tp = f"{prefix}.cost_reg_2.{name}"
        reg[name] = {"deconv_kernel": _deconv3d(sd[tp + ".0.weight"]),
                     "bn": _abn(sd, tp + ".1")}
    return {"params": {"feature": feat, "cost_reg_2": reg}}


def convert_checkpoint(ckpt_path, cfg) -> dict:
    """Full reference checkpoint → zest-tpu params dict (system.init_params
    structure)."""
    sd = load_torch_state_dict(ckpt_path)
    params = {}
    if cfg.train_sceneflow:
        params["nerf_static"] = convert_nerf(sd, "nerf_static.nerf")
        params["nerf_dynamic"] = convert_nerf(sd, "nerf_dynamic.nerf")
    else:
        params["nerf_static"] = convert_nerf(sd, "nerf_coarse.nerf")
    if any(k.startswith("encoding_net.") for k in sd):
        params["enc_static"] = convert_mvsnet(sd, "encoding_net")
    if any(k.startswith("encoding_net_dy.") for k in sd):
        params["enc_dy"] = convert_mvsnet(sd, "encoding_net_dy")
    if "time_codes" in sd:
        params["time_codes"] = sd["time_codes"]
    return params
