"""GAN discriminator suite — Flax re-designs of the reference architectures.

Mirrors ``/root/reference/networks.py:711-929``:
- ``BasicDiscriminator``  — MLP 512→256→1 (+sigmoid for naive GAN)
- ``NLayerDiscriminator`` — pix2pix PatchGAN with optional intermediate feature taps
- ``PixelDiscriminator``  — 1×1 PatchGAN
- ``GRAFDiscriminator``   — spectral-norm conv stack (imsize ∈ {32, 64, 128}),
  optional random horizontal flip

Inputs are ray-batch patches [N_patches·P·P, 3] reshaped to [N, P, P, 3]
(channels-last; the reference reshapes from [N, batch, ch]).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .init import torch_dense_kernel_init, torch_dense_bias_init, \
    torch_conv_kernel_init


class BasicDiscriminator(nn.Module):
    """networks.py:711-730."""
    in_dim: int
    use_sigmoid: bool = True  # gan_loss in (None, 'naive')

    @nn.compact
    def __call__(self, img):
        x = img.reshape(img.shape[0], -1)
        x = nn.Dense(512, kernel_init=torch_dense_kernel_init,
                     bias_init=torch_dense_bias_init(self.in_dim))(x)
        x = nn.leaky_relu(x, 0.2)
        x = nn.Dense(256, kernel_init=torch_dense_kernel_init,
                     bias_init=torch_dense_bias_init(512))(x)
        x = nn.leaky_relu(x, 0.2)
        x = nn.Dense(1, kernel_init=torch_dense_kernel_init,
                     bias_init=torch_dense_bias_init(256))(x)
        if self.use_sigmoid:
            x = nn.sigmoid(x)
        return x


class _InstanceNorm(nn.Module):
    """InstanceNorm2d(affine=False) equivalent: per-sample per-channel spatial norm."""
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):  # [N, H, W, C]
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + self.eps)


class _BatchNorm(nn.Module):
    """BatchNorm2d with batch statistics (affine)."""
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        mean = jnp.mean(x, axis=(0, 1, 2))
        var = jnp.var(x, axis=(0, 1, 2))
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        return (x - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias


class NLayerDiscriminator(nn.Module):
    """pix2pix PatchGAN (networks.py:732-811)."""
    patch_size: int
    input_nc: int = 3
    ndf: int = 64
    n_layers: int = 3
    get_interm_feat: bool = False

    @nn.compact
    def __call__(self, img):
        # img: [N, rays, ch] patch rays → [N, P, P, ch]
        N = img.shape[0]
        x = img.reshape(N, self.patch_size, self.patch_size, self.input_nc)
        feats = []
        x = nn.Conv(self.ndf, (4, 4), strides=2, padding=1,
                    kernel_init=torch_conv_kernel_init)(x)
        x = nn.leaky_relu(x, 0.2)
        feats.append(x)
        nf = 1
        for n in range(1, self.n_layers):
            nf = min(2 ** n, 8)
            x = nn.Conv(self.ndf * nf, (4, 4), strides=2, padding=1,
                        use_bias=False, kernel_init=torch_conv_kernel_init)(x)
            x = _BatchNorm()(x)
            x = nn.leaky_relu(x, 0.2)
            feats.append(x)
        nf = min(2 ** self.n_layers, 8)
        x = nn.Conv(self.ndf * nf, (4, 4), strides=1, padding=1,
                    use_bias=False, kernel_init=torch_conv_kernel_init)(x)
        x = _BatchNorm()(x)
        x = nn.leaky_relu(x, 0.2)
        feats.append(x)
        x = nn.Conv(1, (4, 4), strides=1, padding=1,
                    kernel_init=torch_conv_kernel_init)(x)
        feats.append(x)
        return feats if self.get_interm_feat else feats[-1]


class PixelDiscriminator(nn.Module):
    """1×1 PatchGAN (networks.py:814-843)."""
    patch_size: int
    input_nc: int = 3
    ndf: int = 64

    @nn.compact
    def __call__(self, img):
        x = img.reshape(-1, self.patch_size, self.patch_size, self.input_nc)
        x = nn.Conv(self.ndf, (1, 1), kernel_init=torch_conv_kernel_init)(x)
        x = nn.leaky_relu(x, 0.2)
        x = nn.Conv(self.ndf * 2, (1, 1), use_bias=False,
                    kernel_init=torch_conv_kernel_init)(x)
        x = _BatchNorm()(x)
        x = nn.leaky_relu(x, 0.2)
        x = nn.Conv(1, (1, 1), use_bias=False,
                    kernel_init=torch_conv_kernel_init)(x)
        return x


class SpectralConv(nn.Module):
    """Conv with spectral normalization (power iteration on the flattened kernel),
    the GRAF discriminator's SN(Conv2d)."""
    features: int
    kernel: int = 4
    stride: int = 2
    padding: int = 1

    @nn.compact
    def __call__(self, x, update_stats: bool = True):
        k = self.kernel
        in_ch = x.shape[-1]
        w = self.param("kernel", torch_conv_kernel_init,
                       (k, k, in_ch, self.features))
        w_mat = w.reshape(-1, self.features)
        u = self.variable("spectral", "u",
                          lambda: jax.random.normal(
                              jax.random.PRNGKey(0), (self.features,)))
        u_val = u.value
        # one power iteration per call
        v = w_mat @ u_val
        v = v / (jnp.linalg.norm(v) + 1e-12)
        u_new = w_mat.T @ v
        u_new = u_new / (jnp.linalg.norm(u_new) + 1e-12)
        sigma = v @ (w_mat @ u_new)
        if update_stats and not self.is_initializing():
            u.value = jax.lax.stop_gradient(u_new)
        w_sn = w / jnp.maximum(sigma, 1e-12)
        return jax.lax.conv_general_dilated(
            x, w_sn, (self.stride, self.stride),
            [(self.padding, self.padding)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class GRAFDiscriminator(nn.Module):
    """GRAF patch discriminator (networks.py:845-929)."""
    nc: int = 3
    ndf: int = 64
    imsize: int = 64
    hflip: bool = False

    @nn.compact
    def __call__(self, img, rng=None):
        assert self.imsize in (32, 64, 128)
        x = img[..., :self.nc].reshape(-1, self.imsize, self.imsize, self.nc)
        if self.hflip and rng is not None:
            flipped = x[:, :, ::-1]
            keep = jax.random.randint(rng, (x.shape[0], 1, 1, 1), 0, 2) == 1
            x = jnp.where(keep, x, flipped)

        if self.imsize == 128:
            x = nn.leaky_relu(SpectralConv(self.ndf // 2)(x), 0.2)
            x = SpectralConv(self.ndf)(x)
            x = nn.leaky_relu(_InstanceNorm()(x), 0.2)
            x = SpectralConv(self.ndf * 2)(x)
            x = nn.leaky_relu(_InstanceNorm()(x), 0.2)
        elif self.imsize == 64:
            x = nn.leaky_relu(SpectralConv(self.ndf)(x), 0.2)
            x = SpectralConv(self.ndf * 2)(x)
            x = nn.leaky_relu(_InstanceNorm()(x), 0.2)
        else:
            x = SpectralConv(self.ndf * 2)(x)
            x = nn.leaky_relu(_InstanceNorm()(x), 0.2)

        x = SpectralConv(self.ndf * 4)(x)
        x = nn.leaky_relu(_InstanceNorm()(x), 0.2)
        x = SpectralConv(self.ndf * 8)(x)
        x = nn.leaky_relu(_InstanceNorm()(x), 0.2)
        x = SpectralConv(1, kernel=4, stride=1, padding=0)(x)
        return x


def build_discriminator(cfg):
    """Instantiate by --gan_type (train.py:179-186)."""
    if cfg.gan_type == "basic":
        return BasicDiscriminator(in_dim=cfg.patch_size * cfg.patch_size * 3,
                                  use_sigmoid=cfg.gan_loss in (None, "naive"))
    if cfg.gan_type == "n_layers":
        return NLayerDiscriminator(cfg.patch_size, 3, 64, 3,
                                   get_interm_feat=cfg.getIntermFeat)
    if cfg.gan_type == "pixel":
        return PixelDiscriminator(cfg.patch_size, 3, 64)
    if cfg.gan_type == "graf":
        return GRAFDiscriminator(imsize=cfg.patch_size, nc=3, ndf=64)
    raise ValueError(cfg.gan_type)
