"""LPIPS perceptual metric/loss — AlexNet backbone in Flax.

Equivalent of the reference's ``lpips.LPIPS(net='alex')`` (train.py:86-89), used both
as the perceptual training loss (``--with_perceptual_loss``) and as an eval metric.

Weights: zero-egress environment ⇒ pretrained AlexNet + LPIPS linear weights must be
supplied as a local ``.npz`` (see ``convert_torch_lpips`` below for the layout;
``--lpips_weights path.npz``). Without weights the metric is unavailable (the
framework gates it rather than reporting garbage).

Architecture (matching torchvision AlexNet features + lpips lin layers):
  conv1 3→64 k11 s4 p2 | conv2 64→192 k5 p2 | conv3 192→384 k3 p1
  conv4 384→256 k3 p1  | conv5 256→256 k3 p1, ReLU after each, maxpool 3/2 after
  conv1, conv2, conv5 taps BEFORE pool (relu1..relu5)
  lpips: per-tap channel-unit-normalize, squared diff, 1x1 linear (non-negative),
  spatial mean, sum over taps.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

# (out_ch, kernel, stride, pad) per conv; tap after the ReLU
_ALEX_CFG = [(64, 11, 4, 2), (192, 5, 1, 2), (384, 3, 1, 1),
             (256, 3, 1, 1), (256, 3, 1, 1)]
_POOL_AFTER = {0, 1}  # maxpool(3,2) after relu1 and relu2 (and before relu3 input)

# lpips input normalization (lpips.ScalingLayer)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _maxpool(x, window=3, stride=2):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, window, window, 1), (1, stride, stride, 1),
                                 "VALID")


def alexnet_features(params, x):
    """x: [N, H, W, 3] in [-1, 1] (lpips convention). Returns 5 tap tensors."""
    x = (x - _SHIFT) / _SCALE
    taps = []
    for i, (out_ch, k, s, p) in enumerate(_ALEX_CFG):
        w = params[f"conv{i}_w"]  # [k, k, in, out]
        b = params[f"conv{i}_b"]
        x = jax.lax.conv_general_dilated(
            x, w, (s, s), [(p, p), (p, p)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = x + b
        x = jax.nn.relu(x)
        taps.append(x)
        if i in _POOL_AFTER:
            x = _maxpool(x)
    return taps


def lpips_distance(params, img0, img1):
    """LPIPS distance between [H, W, 3] images in [0, 1] (scaled to [-1,1] as the
    reference does at train.py:629-630)."""
    x0 = (img0 * 2.0 - 1.0)[None]
    x1 = (img1 * 2.0 - 1.0)[None]
    taps0 = alexnet_features(params, x0)
    taps1 = alexnet_features(params, x1)
    for t in taps0:  # static shapes — a too-small image collapses a tap to
        if t.shape[1] == 0 or t.shape[2] == 0:  # size 0 and means go NaN
            raise ValueError(
                f"image {img0.shape[:2]} too small for AlexNet-LPIPS "
                f"(a feature tap has zero spatial size; need ≥ ~32 px)")
    total = 0.0
    for i, (t0, t1) in enumerate(zip(taps0, taps1)):
        n0 = t0 * jax.lax.rsqrt(jnp.sum(t0 ** 2, -1, keepdims=True) + 1e-10)
        n1 = t1 * jax.lax.rsqrt(jnp.sum(t1 ** 2, -1, keepdims=True) + 1e-10)
        d = (n0 - n1) ** 2
        lin = params[f"lin{i}_w"]  # [C] non-negative
        total = total + jnp.mean(jnp.sum(d * lin, -1))
    return total


def load_lpips(path):
    """Load an .npz weight file → callable(img0, img1) -> distance."""
    data = np.load(path)
    params = {k: jnp.asarray(data[k]) for k in data.files}
    return jax.jit(lambda a, b: lpips_distance(params, a, b))


def make_random_lpips_npz(out_path, seed: int = 0):
    """Write a structurally-valid LPIPS .npz with RANDOM weights.

    For exercising the metric/loss machinery (shapes, jit, gradients) in tests
    and zero-egress environments — NOT a perceptual-parity metric. Real numbers
    require ``convert_torch_lpips`` run where torch+lpips downloads exist.
    """
    rng = np.random.default_rng(seed)
    out = {}
    in_ch = 3
    for i, (out_ch, k, _, _) in enumerate(_ALEX_CFG):
        out[f"conv{i}_w"] = rng.normal(
            0, (2.0 / (k * k * in_ch)) ** 0.5,
            (k, k, in_ch, out_ch)).astype(np.float32)
        out[f"conv{i}_b"] = np.zeros(out_ch, np.float32)
        out[f"lin{i}_w"] = rng.uniform(0, 1, out_ch).astype(np.float32)
        in_ch = out_ch
    np.savez(out_path, **out)


def convert_torch_lpips(out_path):
    """Convert torch lpips('alex') weights to our .npz layout (requires the lpips
    package + torch with downloaded weights — run where egress is available)."""
    import lpips as lpips_pkg  # noqa
    import torch  # noqa
    m = lpips_pkg.LPIPS(net="alex")
    out = {}
    convs = [m.net.slice1[0], m.net.slice2[1], m.net.slice3[1],
             m.net.slice4[0], m.net.slice5[0]]
    # torchvision AlexNet slices: recover the 5 conv layers in order
    convs = [mod for slc in (m.net.slice1, m.net.slice2, m.net.slice3,
                             m.net.slice4, m.net.slice5)
             for mod in slc if isinstance(mod, torch.nn.Conv2d)]
    for i, c in enumerate(convs):
        out[f"conv{i}_w"] = c.weight.detach().permute(2, 3, 1, 0).numpy()
        out[f"conv{i}_b"] = c.bias.detach().numpy()
    for i, lin in enumerate(m.lins):
        out[f"lin{i}_w"] = lin.model[-1].weight.detach()[0, :, 0, 0].numpy()
    np.savez(out_path, **out)
