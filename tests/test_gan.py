"""GAN (SVS) path: discriminators forward, one adversarial train step."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zest_tpu.config import ZestConfig
from zest_tpu.data.synthetic import SyntheticDataset
from zest_tpu.models.discriminators import (BasicDiscriminator,
                                            GRAFDiscriminator,
                                            NLayerDiscriminator,
                                            PixelDiscriminator)


def test_basic_discriminator():
    d = BasicDiscriminator(in_dim=16 * 16 * 3, use_sigmoid=True)
    x = jnp.zeros((2, 16 * 16, 3))
    params = d.init(jax.random.PRNGKey(0), x)
    out = d.apply(params, x)
    assert out.shape == (2, 1)
    assert np.all((np.asarray(out) >= 0) & (np.asarray(out) <= 1))


def test_nlayer_discriminator_interm_feats():
    d = NLayerDiscriminator(patch_size=32, input_nc=3, get_interm_feat=True)
    x = jnp.zeros((1, 32 * 32, 3))
    params = d.init(jax.random.PRNGKey(0), x)
    feats = d.apply(params, x)
    assert len(feats) == 5  # 1 + (n_layers-1) + 1 + final
    assert feats[-1].shape[-1] == 1


def test_pixel_discriminator():
    d = PixelDiscriminator(patch_size=16)
    x = jnp.zeros((1, 16 * 16, 3))
    params = d.init(jax.random.PRNGKey(0), x)
    out = d.apply(params, x)
    assert out.shape == (1, 16, 16, 1)


def test_graf_discriminator_spectral_norm_state():
    d = GRAFDiscriminator(imsize=32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32 * 32, 3))
    variables = d.init(jax.random.PRNGKey(0), x)
    assert "spectral" in variables
    out, new_vars = d.apply(variables, x, jax.random.PRNGKey(2),
                            mutable=["spectral"])
    assert out.shape[0] == 2
    # power-iteration state updated
    u0 = jax.tree_util.tree_leaves(variables["spectral"])[0]
    u1 = jax.tree_util.tree_leaves(new_vars["spectral"])[0]
    assert not np.allclose(np.asarray(u0), np.asarray(u1))


def test_gan_train_step_runs():
    from zest_tpu.system import ZestSystem, phase_for_step
    from zest_tpu.system_gan import GanSystem

    cfg = ZestConfig(train_sceneflow=False, use_mvs=False, use_mvs_dy=False,
                     pad=0, netdepth=4, netwidth=32, multires=4,
                     multires_views=2, N_samples=8, batch_size=1024,
                     patch_size=32, gan_type="graf", gan_loss="lsgan",
                     pts_embedder=True, dir_embedder=True, use_viewdirs=True,
                     num_epochs=10, with_distortion_loss=True,
                     lambda_distortion=0.001)
    ds = SyntheticDataset(img_h=24, img_w=32, num_frames=8, num_keyframes=3,
                          use_mvs=False, use_mvs_dy=False)
    batch = {k: jnp.asarray(v) for k, v in ds[2].items()}

    gan = GanSystem(ZestSystem(cfg))
    state = gan.init(jax.random.PRNGKey(0), batch)
    opt = gan.system.make_optimizer(8)
    d_opt = gan.make_disc_optimizer()
    step_fn = gan.make_train_step(opt, d_opt)
    state2, logs = step_fn(state, batch, jax.random.PRNGKey(1),
                           phase_for_step(cfg, 0))
    assert int(state2.step) == 1
    for k in ("G_loss", "D_loss", "train_PSNR"):
        assert np.isfinite(float(logs[k])), k
