"""Adversarial (SVS) training path: generator + discriminator(s) updates.

Re-design of the reference's PL multi-optimizer GAN branch
(``train.py:640-741``, ``optimizer_idx`` 0/1/2): one jitted step performs the
generator update, the image-discriminator update, and (optionally) the
depth-discriminator update sequentially — same math, no Lightning loop.

Loss conventions preserved:
- gan_loss 'naive' → BCE on sigmoid outputs; 'lsgan' → MSE (train.py:173-176)
- G branch: λ_adv·adv(D(fake),1) + feat-match + λ_rec·MSE + (already-λ-scaled)
  tv/smooth/distortion/perceptual terms added ONCE (train.py:687-694 — unlike the
  non-GAN branch which double-scales, see system.compute_losses)
- D branch: (adv(D(fake.detach),0) + adv(D(real),1)) / 2
"""
from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from .losses import (distortion_loss, get_disparity_smoothness,
                     total_variation_loss)
from .models.discriminators import build_discriminator
from .models.lpips import load_lpips
from .system import Phase, ZestSystem


class GanTrainState(NamedTuple):
    params: Any           # generator (+ encoders) params
    disc_params: Any
    depth_disc_params: Any
    opt_state: Any
    disc_opt_state: Any
    depth_disc_opt_state: Any
    disc_vars: Any        # spectral-norm power-iteration state (GRAF)
    step: jnp.ndarray


def adversarial_loss(cfg, pred, target_ones: bool):
    target = jnp.ones_like(pred) if target_ones else jnp.zeros_like(pred)
    if cfg.gan_loss == "naive":
        p = jnp.clip(pred, 1e-7, 1 - 1e-7)
        return -jnp.mean(target * jnp.log(p) + (1 - target) * jnp.log(1 - p))
    # lsgan (and default)
    return jnp.mean((pred - target) ** 2)


class GanSystem:
    """Wraps ZestSystem with the discriminator stack."""

    def __init__(self, system: ZestSystem):
        self.system = system
        self.cfg = system.cfg
        self.disc = build_discriminator(self.cfg)
        self.depth_disc = None
        if self.cfg.with_depth_loss:
            from .models.discriminators import NLayerDiscriminator
            self.depth_disc = NLayerDiscriminator(self.cfg.patch_size, 1, 64, 3)
        self._lpips = None
        if self.cfg.with_perceptual_loss:
            if not self.cfg.lpips_weights:
                # refuse, don't warn: training without the requested perceptual
                # term silently optimises a different objective — same standard
                # as the _maybe_lpips metric gate (train_loop.py)
                raise RuntimeError(
                    "--with_perceptual_loss set but --lpips_weights missing: "
                    "refusing to silently train without the perceptual term "
                    "(zero-egress env needs a local LPIPS .npz; see "
                    "models/lpips.py)")
            self._lpips = load_lpips(self.cfg.lpips_weights)

    def init(self, rng, batch, steps_per_epoch: int = 1) -> GanTrainState:
        cfg = self.cfg
        k1, k2, k3 = jax.random.split(rng, 3)
        gen_params = self.system.init_params(k1, batch)
        n_rays = cfg.patch_size * cfg.patch_size if cfg.patch_size > 0 \
            else cfg.batch_size
        dummy = jnp.zeros((1, n_rays, 3))
        variables = self.disc.init(k2, dummy)
        disc_params = variables.get("params", {})
        disc_vars = {k: v for k, v in variables.items() if k != "params"}
        depth_params = {}
        if self.depth_disc is not None:
            depth_params = self.depth_disc.init(
                k3, jnp.zeros((1, n_rays, 1)))["params"]

        opt = self.system.make_optimizer(steps_per_epoch)
        d_opt = self.make_disc_optimizer(steps_per_epoch)
        return GanTrainState(
            params=gen_params, disc_params=disc_params,
            depth_disc_params=depth_params,
            opt_state=opt.init(gen_params),
            disc_opt_state=d_opt.init(disc_params),
            depth_disc_opt_state=(d_opt.init(depth_params)
                                  if self.depth_disc else {}),
            disc_vars=disc_vars, step=jnp.asarray(0))

    def make_disc_optimizer(self, steps_per_epoch: int = 1):
        """Adam(lrate_disc) + cosine anneal stepped once per EPOCH
        (CosineAnnealingLR in train.py:282-293 is epoch-granular)."""
        cfg = self.cfg
        eps = 1e-7

        def sched(step):
            ep = jnp.minimum(step // max(steps_per_epoch, 1), cfg.num_epochs)
            return eps + (cfg.lrate_disc - eps) * 0.5 * (
                1 + jnp.cos(jnp.pi * ep / cfg.num_epochs))
        return optax.adam(sched, b1=0.9, b2=0.999)

    def _apply_disc(self, disc_params, disc_vars, x, rng=None):
        variables = {"params": disc_params, **disc_vars}
        kwargs = {}
        if self.cfg.gan_type == "graf":
            out, new_vars = self.disc.apply(variables, x, rng,
                                            mutable=["spectral"])
            return out, new_vars
        out = self.disc.apply(variables, x)
        return out, disc_vars

    # ------------------------------------------------------------------
    def make_train_step(self, optimizer, disc_optimizer):
        cfg = self.cfg
        system = self.system

        @functools.partial(jax.jit, static_argnames=("phase",))
        def train_step(state: GanTrainState, batch, rng, phase: Phase):
            # derive per-step randomness inside the jit (see system.py): the
            # caller passes one constant base key for the whole run
            rng = jax.random.fold_in(rng, state.step)
            k_fwd, k_flip, k_flip2 = jax.random.split(rng, 3)
            logs = {}

            # ---------------- generator update (optimizer_idx == 0) -------------
            def gen_loss_fn(gen_params):
                ret, rays, aux = system.forward_train(gen_params, batch, k_fwd,
                                                      phase, state.step)
                rgb_pred = ret["rgb_map"]
                rgb_gt = rays.color_gt
                depth_pred = ret["depth_map"][..., None]

                # discriminators see per-patch samples: [n_patches, patch², C]
                # (reference configs use batch_size == patch_size², i.e. one
                # patch — this generalizes to several patches per step)
                ppx = cfg.patch_size ** 2 if cfg.patch_size > 0 \
                    else rgb_pred.shape[0]
                fake_in = rgb_pred.reshape(-1, ppx, 3)
                d_fake, _ = self._apply_disc(state.disc_params, state.disc_vars,
                                             fake_in, k_flip)
                if cfg.getIntermFeat:
                    interm_fake = d_fake[:-1]
                    d_fake = d_fake[-1]
                g_fake_loss = cfg.lambda_adv * adversarial_loss(cfg, d_fake, True)

                g_feat_loss = 0.0
                if cfg.getIntermFeat:
                    d_real, _ = self._apply_disc(
                        state.disc_params, state.disc_vars,
                        jax.lax.stop_gradient(rgb_gt).reshape(-1, ppx, 3),
                        k_flip)
                    for ff, fr in zip(interm_fake, d_real[:-1]):
                        g_feat_loss += jnp.mean(jnp.abs(ff - fr))

                g_depth_fake_loss = 0.0
                if self.depth_disc is not None:
                    dd = self.depth_disc.apply({"params": state.depth_disc_params},
                                               depth_pred.reshape(-1, ppx, 1))
                    g_depth_fake_loss = adversarial_loss(cfg, dd, True)

                rec_depth_loss = 0.0
                if cfg.with_depth_loss_rec:
                    # elementwise MSE: depth_pred is [R,1], depth_gt [R]. The
                    # reference's train.py:679 broadcasts [R,1]-[R] to [R,R]
                    # (a torch bug, not a feature) — fixed here, documented.
                    rec_depth_loss = jnp.mean(
                        (depth_pred - rays.depth_gt[..., None]) ** 2)

                g_rec_loss = cfg.lambda_rec * jnp.mean((rgb_pred - rgb_gt) ** 2)

                tv_l = smooth_l = dist_l = perc_l = 0.0
                if cfg.with_depth_loss_reg:
                    patch = depth_pred.reshape(-1, cfg.patch_size, cfg.patch_size)
                    tv_l = cfg.lambda_depth_reg * total_variation_loss(patch)
                if cfg.with_depth_smoothness:
                    dp = depth_pred.reshape(-1, cfg.patch_size, cfg.patch_size, 1)
                    ip = rgb_pred.reshape(-1, cfg.patch_size, cfg.patch_size, 3)
                    smooth_l = cfg.lambda_depth_smooth * \
                        get_disparity_smoothness(dp, ip)
                if cfg.with_distortion_loss:
                    dist_l = cfg.lambda_distortion * \
                        distortion_loss(ret["weights"], rays.t_vals)
                if self._lpips is not None:
                    pp = rgb_pred.reshape(-1, cfg.patch_size, cfg.patch_size, 3)
                    gp = rgb_gt.reshape(-1, cfg.patch_size, cfg.patch_size, 3)
                    perc = 0.0
                    for i in range(pp.shape[0]):
                        perc += self._lpips(pp[i], gp[i])
                    perc_l = cfg.lambda_perc * perc / pp.shape[0]

                total = (g_fake_loss + g_feat_loss + g_depth_fake_loss
                         + rec_depth_loss + g_rec_loss + tv_l + smooth_l
                         + dist_l + perc_l)
                aux_out = {"G_fake_loss": g_fake_loss, "G_rec_loss": g_rec_loss,
                           "G_loss": total,
                           "rgb_pred": jax.lax.stop_gradient(rgb_pred),
                           "rgb_gt": jax.lax.stop_gradient(rgb_gt),
                           "depth_pred": jax.lax.stop_gradient(depth_pred),
                           "depth_gt": jax.lax.stop_gradient(rays.depth_gt)}
                return total, aux_out

            (g_loss, aux), g_grads = jax.value_and_grad(gen_loss_fn, has_aux=True)(
                state.params)
            g_updates, new_opt = optimizer.update(g_grads, state.opt_state,
                                                  state.params)
            new_params = optax.apply_updates(state.params, g_updates)
            logs.update({k: v for k, v in aux.items()
                         if not k.startswith(("rgb", "depth"))})

            # ---------------- discriminator update (optimizer_idx == 1) ---------
            ppx = cfg.patch_size ** 2 if cfg.patch_size > 0 \
                else aux["rgb_pred"].shape[0]
            fake = aux["rgb_pred"].reshape(-1, ppx, 3)
            real = aux["rgb_gt"].reshape(-1, ppx, 3)

            def disc_loss_fn(disc_params):
                d_fake, vars1 = self._apply_disc(disc_params, state.disc_vars,
                                                 fake, k_flip)
                d_real, vars2 = self._apply_disc(disc_params, vars1, real, k_flip2)
                if cfg.getIntermFeat:
                    d_fake, d_real = d_fake[-1], d_real[-1]
                l_fake = adversarial_loss(cfg, d_fake, False)
                l_real = adversarial_loss(cfg, d_real, True)
                return (l_fake + l_real) / 2.0, (l_fake, l_real, vars2)

            (d_loss, (d_fake_l, d_real_l, new_vars)), d_grads = \
                jax.value_and_grad(disc_loss_fn, has_aux=True)(state.disc_params)
            d_updates, new_d_opt = disc_optimizer.update(d_grads,
                                                         state.disc_opt_state,
                                                         state.disc_params)
            new_disc_params = optax.apply_updates(state.disc_params, d_updates)
            logs.update({"D_loss": d_loss, "D_fake_loss": d_fake_l,
                         "D_real_loss": d_real_l})

            # ---------------- depth discriminator (optimizer_idx == 2) ----------
            new_depth_params = state.depth_disc_params
            new_dd_opt = state.depth_disc_opt_state
            if self.depth_disc is not None:
                fake_d = aux["depth_pred"].reshape(-1, ppx, 1)
                real_d = aux["depth_gt"].reshape(-1, ppx, 1)

                def dd_loss_fn(p):
                    df = self.depth_disc.apply({"params": p}, fake_d)
                    dr = self.depth_disc.apply({"params": p}, real_d)
                    return (adversarial_loss(cfg, df, False)
                            + adversarial_loss(cfg, dr, True)) / 2.0

                dd_loss, dd_grads = jax.value_and_grad(dd_loss_fn)(
                    state.depth_disc_params)
                dd_updates, new_dd_opt = disc_optimizer.update(
                    dd_grads, state.depth_disc_opt_state, state.depth_disc_params)
                new_depth_params = optax.apply_updates(state.depth_disc_params,
                                                       dd_updates)
                logs["D_depth_loss"] = dd_loss

            logs["train_loss"] = g_loss
            mse = jnp.mean((aux["rgb_pred"] - aux["rgb_gt"]) ** 2)
            logs["train_PSNR"] = -10.0 * jnp.log10(mse)

            new_state = GanTrainState(
                params=new_params, disc_params=new_disc_params,
                depth_disc_params=new_depth_params, opt_state=new_opt,
                disc_opt_state=new_d_opt, depth_disc_opt_state=new_dd_opt,
                disc_vars=new_vars, step=state.step + 1)
            return new_state, logs

        return train_step
