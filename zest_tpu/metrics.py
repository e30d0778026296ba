"""Image quality metrics: PSNR, SSIM (window 5), LPIPS hook.

Matches the reference metric configuration (train.py:40-41,795-797): kornia
``psnr(max_val=1)`` and ``ssim(window_size=5)`` semantics.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def psnr(pred, gt, max_val: float = 1.0):
    """PSNR over the whole tensor (kornia.metrics.psnr semantics)."""
    mse = jnp.mean((pred - gt) ** 2)
    return 10.0 * jnp.log10(max_val ** 2 / mse)


def _ssim_window(window_size: int, sigma: float = 1.5):
    """Gaussian window (kornia uses a gaussian kernel for ssim)."""
    half = window_size // 2
    coords = jnp.arange(window_size, dtype=jnp.float32) - half
    g = jnp.exp(-(coords ** 2) / (2 * sigma ** 2))
    g = g / g.sum()
    return jnp.outer(g, g)


def ssim(pred, gt, window_size: int = 5, max_val: float = 1.0):
    """Mean SSIM map over an image pair — kornia.metrics.ssim semantics.

    kornia's default is ``padding='same'`` with reflect-padded filter2d, so the
    SSIM map is full-size and border pixels see reflected context (NOT a valid
    crop — round-2 used VALID, which averaged over a 2-px-smaller map and
    diverged from the reference metric at borders). Pinned by a torch-oracle
    golden test (tests/test_round3.py).

    Args: pred/gt [H, W, C] in [0, max_val].
    Returns the scalar mean (the reference calls ``ssim(...).mean()``,
    train.py:796).
    """
    C1 = (0.01 * max_val) ** 2
    C2 = (0.03 * max_val) ** 2
    win = _ssim_window(window_size)[:, :, None, None]  # [k,k,1,1]
    half = window_size // 2

    def conv(x):
        # depthwise reflect-padded SAME conv per channel (kornia filter2d
        # border_type='reflect'): x [H,W,C] -> [H,W,C]
        x = jnp.pad(x, ((half, half), (half, half), (0, 0)), mode="reflect")
        x = jnp.moveaxis(x, -1, 0)[:, None]  # [C,1,H+2h,W+2h]
        k = jnp.moveaxis(win, (0, 1, 2, 3), (2, 3, 1, 0))  # [1,1,k,k]
        y = jax.lax.conv_general_dilated(x, k, (1, 1), "VALID")
        return jnp.moveaxis(y[:, 0], 0, -1)

    mu_p = conv(pred)
    mu_g = conv(gt)
    mu_pp = mu_p * mu_p
    mu_gg = mu_g * mu_g
    mu_pg = mu_p * mu_g
    sigma_pp = conv(pred * pred) - mu_pp
    sigma_gg = conv(gt * gt) - mu_gg
    sigma_pg = conv(pred * gt) - mu_pg

    num = (2 * mu_pg + C1) * (2 * sigma_pg + C2)
    den = (mu_pp + mu_gg + C1) * (sigma_pp + sigma_gg + C2)
    return jnp.mean(num / den)
