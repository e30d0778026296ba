"""Ablation timing of the flagship step: encoder fwd / full fwd / full step.

The trace profiler's leaf attribution over-counts (its per-step sum reads ~2x
the honest forced-fetch step time — round-3 finding), so this tool measures
component costs the only way the axon tunnel allows: separate jits, chained
state, one value fetch per timed window (CLAUDE.md timing rules).

Prints per-mode ms/step:
  volumes : static+dynamic MVS encoder forward only
  fwd     : full forward_train (volumes + render + losses), no grad
  step    : full train step (grad + adam)  — the bench.py number
"""
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def main(modes):
    from zest_tpu.config import ZestConfig
    from zest_tpu.data.synthetic import SyntheticDataset
    from zest_tpu.system import ZestSystem, TrainState, phase_for_step

    cfg = ZestConfig(train_sceneflow=True, use_mvs=True, use_mvs_dy=True,
                     pad=24, num_keyframes=8, netdepth=8, netwidth=256,
                     multires=10, multires_views=4, N_samples=128,
                     batch_size=600, num_extra_samples=512,
                     use_motion_mask=True, decay_iteration=30,
                     with_chain_loss=True, pts_embedder=True,
                     dir_embedder=True, use_viewdirs=True, num_epochs=6000,
                     raw_noise_std=1.0, img_h=288, img_w=512, precision=16)
    ds = SyntheticDataset(img_h=288, img_w=512, num_frames=24, num_keyframes=8,
                          use_mvs=True, use_mvs_dy=True)
    batch = {k: jnp.asarray(v) for k, v in ds[3].items()}
    cfg = cfg.replace(warp_band=ds.warp_band_bound(pad=cfg.pad, group=cfg.warp_group))
    system = ZestSystem(cfg)
    params = system.init_params(jax.random.PRNGKey(0), batch)
    opt = system.make_optimizer(steps_per_epoch=24)
    state = TrainState(params, opt.init(params), jnp.asarray(0))
    step_fn = system.make_train_step(opt)
    phase = phase_for_step(cfg, 0)
    rng = jax.random.PRNGKey(1)

    n_steps = 50

    def timed(name, fn, chain0):
        # warmup/compile, then one fetch; chain state across iterations so the
        # tunnel cannot memoize; end with a value fetch (forces the chain)
        chain = fn(chain0)
        jax.tree_util.tree_map(
            lambda x: float(jnp.asarray(x).reshape(-1)[0]),
            jax.tree_util.tree_leaves(chain)[0])
        t0 = time.perf_counter()
        chain = chain0
        for _ in range(n_steps):
            chain = fn(chain)
        float(jnp.asarray(jax.tree_util.tree_leaves(chain)[0]).reshape(-1)[0])
        dt = (time.perf_counter() - t0) / n_steps * 1e3
        print(f"{name:8s} {dt:8.1f} ms/step")

    if "volumes" in modes:
        @jax.jit
        def vol_fn(p):
            sv, dv = system._encode_volumes(p, batch)
            # tiny perturbation chains params so results can't memoize
            eps = (jnp.mean(sv) + jnp.mean(dv)) * 1e-12
            return jax.tree_util.tree_map(lambda a: a + eps.astype(a.dtype), p)
        timed("volumes", vol_fn, params)

    if "fwd" in modes:
        @jax.jit
        def fwd_fn(carry):
            p, k = carry
            k2 = jax.random.fold_in(k, 1)
            ret, rays, aux = system.forward_train(p, batch, k2, phase,
                                                 jnp.asarray(0))
            loss = ret["rgb_map"].sum()
            eps = loss * 1e-12
            return (jax.tree_util.tree_map(
                lambda a: a + eps.astype(a.dtype), p), k2)
        timed("fwd", fwd_fn, (params, rng))

    if "fwd_all" in modes:
        @jax.jit
        def fwd_all_fn(carry):
            p, k = carry
            k2 = jax.random.fold_in(k, 1)
            ret, rays, aux = system.forward_train(p, batch, k2, phase,
                                                  jnp.asarray(0))
            # consume EVERY output so nothing dead-code-eliminates (the t±1
            # scene-flow passes feed only the sf losses)
            tot = sum(jnp.sum(v.astype(jnp.float32)) for v in
                      jax.tree_util.tree_leaves(ret) if v.dtype != jnp.int32)
            eps = tot * 1e-12
            return (jax.tree_util.tree_map(
                lambda a: a + eps.astype(a.dtype), p), k2)
        timed("fwd_all", fwd_all_fn, (params, rng))

    if "step_novolgrad" in modes:
        # stop_gradient after the volumes: backward skips the whole MVS
        # encoder (FeatureNet + plane-sweep warp + variance + U-Net) — the
        # difference vs "step" isolates the encoder backward cost
        orig = system._encode_volumes

        def sg_vols(p, b):
            sv, dv = orig(p, b)
            sg = jax.lax.stop_gradient
            return (sg(sv) if sv is not None else None,
                    sg(dv) if dv is not None else None)

        system._encode_volumes = sg_vols
        step_ng = system.make_train_step(opt)

        def step1ng(st):
            st2, _ = step_ng(st, batch, rng, phase)
            return st2
        # NOTE: restore only AFTER timing — jit traces lazily at first call
        timed("step_novolgrad", step1ng, state)
        system._encode_volumes = orig

    if "step_nocvgrad" in modes:
        # stop_gradient on the raw COST VOLUMES (U-Net inputs): the remaining
        # encoder backward is the two 3D U-Nets only — the difference vs
        # "step_novolgrad" isolates warp+variance+FeatureNet backward
        from zest_tpu.models import mvsnet as _mv
        orig_bcv = _mv.build_cost_volume

        def sg_bcv(*a, **k):
            return jax.lax.stop_gradient(orig_bcv(*a, **k))

        _mv.build_cost_volume = sg_bcv
        step_nc = system.make_train_step(opt)

        def step1nc(st):
            st2, _ = step_nc(st, batch, rng, phase)
            return st2
        timed("step_nocvgrad", step1nc, state)
        _mv.build_cost_volume = orig_bcv

    if "step_fakewarpbwd" in modes:
        # replace the plane-sweep warp's backward with a cheap broadcast
        # cotangent: FeatureNet bwd and the variance-chain bwd still run at
        # full cost (their cotangents are consumed), but the banded adjoint
        # kernel is skipped — the difference vs "step" isolates the warp bwd
        from zest_tpu.kernels import plane_sweep as _ps
        orig_cm = _ps.homo_warp_fast_cm

        def fake_cm(src, *a, **k):
            out, grid = orig_cm(jax.lax.stop_gradient(src), *a, **k)
            out = out + (1e-30 * jnp.mean(src)).astype(out.dtype)
            return out, grid

        _ps.homo_warp_fast_cm = fake_cm
        step_fw = system.make_train_step(opt)

        def step1fw(st):
            st2, _ = step_fw(st, batch, rng, phase)
            return st2
        timed("step_fakewarpbwd", step1fw, state)
        _ps.homo_warp_fast_cm = orig_cm

    if "step_nofeatgrad" in modes:
        # stop_gradient on the 2D FeatureNet outputs. NOTE (measured r4):
        # since the input images carry no gradients, stopping feats makes the
        # whole cost volume parameter-independent, so XLA DCEs the warp
        # adjoint AND the variance backward too — this mode measures the same
        # set as step_nocvgrad (204.1 vs 206.7 ms, within noise) and CANNOT
        # isolate the FeatureNet bwd alone. Kept as a cross-check.
        from zest_tpu.models import mvsnet as _mv2
        orig_bcv2 = _mv2.build_cost_volume

        def sg_feats_bcv(imgs, feats, *a, **k):
            return orig_bcv2(imgs, jax.lax.stop_gradient(feats), *a, **k)

        _mv2.build_cost_volume = sg_feats_bcv
        step_nf = system.make_train_step(opt)

        def step1nf(st):
            st2, _ = step_nf(st, batch, rng, phase)
            return st2
        timed("step_nofeatgrad", step1nf, state)
        _mv2.build_cost_volume = orig_bcv2

    if "step_nofoldgrad" in modes:
        # zero the paired-build adjoint ONLY: the warped-sites backward still
        # runs the octant-weight expand + wide-row scatter (d_flat is
        # computed) but the concat-transpose fold back to [D, H, W, C] and
        # everything d_vol feeds upstream of THIS consumer are skipped — the
        # difference vs "step" isolates the fold; vs "step_nodvolgrad"
        # isolates expand+scatter
        from zest_tpu.ops import grid_sample as _gs
        orig_pv = _gs.paired_volume

        @jax.custom_vjp
        def pv_nofold(vol):
            return orig_pv(vol)

        def pv_nofold_fwd(vol):
            return orig_pv(vol), jax.lax.stop_gradient(vol)

        def pv_nofold_bwd(res, g):
            # consume g so the scatter that produces it is NOT DCE'd
            eps = (jnp.sum(g.astype(jnp.float32)[::1009, :2]) * 1e-30)
            return (jnp.zeros_like(res) + eps.astype(res.dtype),)

        pv_nofold.defvjp(pv_nofold_fwd, pv_nofold_bwd)
        _gs.paired_volume = pv_nofold
        step_nfold = system.make_train_step(opt)

        def step1nfold(st):
            st2, _ = step_nfold(st, batch, rng, phase)
            return st2
        timed("step_nofoldgrad", step1nfold, state)
        _gs.paired_volume = orig_pv

    if "step_nowarpcoordgrad" in modes:
        # stop_gradient on the warped sampler's COORDINATES: d_vol (expand +
        # scatter + fold) still runs, the flow-gradient side (d_ndc through
        # the taps) is dropped — the difference vs "step" isolates the
        # coordinate-gradient cost of the warped sampling
        from zest_tpu.kernels import trilinear as _tri2
        orig_diff2 = _tri2.sample_volume_zbanded_diff

        def sg_coord(vol, ndc, band=6, approx=None, paired=None):
            return orig_diff2(vol, jax.lax.stop_gradient(ndc), band=band,
                              approx=approx, paired=paired)

        _tri2.sample_volume_zbanded_diff = sg_coord
        step_ncg = system.make_train_step(opt)

        def step1ncg(st):
            st2, _ = step_ncg(st, batch, rng, phase)
            return st2
        timed("step_nowarpcoordgrad", step1ncg, state)
        _tri2.sample_volume_zbanded_diff = orig_diff2

    if "step_nomlpgrad" in modes:
        # replace the fused NeRF-MLP backward with a cheap broadcast cotangent:
        # the render/loss backward producing the MLP-output cotangent still
        # runs (g is consumed), the conditioning/volume chain still receives a
        # (tiny) gradient so nothing upstream is DCE'd, and adam still updates
        # every param — the difference vs "step" isolates the MLP backward
        from zest_tpu.kernels import fused_mlp as _fm
        orig_apply = _fm.fused_nerf_apply

        def fake_apply(field, field_params, p, f, v, approx=None):
            @jax.custom_vjp
            def wrapped(fp, p, f, v):
                return orig_apply(field, fp, p, f, v, approx=approx)

            def fwd(fp, p, f, v):
                return orig_apply(field, fp, p, f, v, approx=approx), (fp, p, f, v)

            def bwd(res, g):
                fp, p, f, v = res
                eps = jnp.sum(g.astype(jnp.float32)[::509]) * 1e-30
                z = lambda a: jnp.zeros_like(a) + eps.astype(a.dtype)
                return (jax.tree_util.tree_map(z, fp), z(p), z(f), z(v))

            wrapped.defvjp(fwd, bwd)
            return wrapped(field_params, p, f, v)

        _fm.fused_nerf_apply = fake_apply
        step_nm = system.make_train_step(opt)

        def step1nm(st):
            st2, _ = step_nm(st, batch, rng, phase)
            return st2
        timed("step_nomlpgrad", step1nm, state)
        _fm.fused_nerf_apply = orig_apply

    if "step_sgd" in modes:
        # same step with adam swapped for plain sgd: the difference vs "step"
        # isolates the optimizer update (adam moments over ~1.3M params)
        import optax
        opt_sgd = optax.sgd(1e-10)
        state_sgd = TrainState(params, opt_sgd.init(params), jnp.asarray(0))
        step_sg = system.make_train_step(opt_sgd)

        def step1sg(st):
            st2, _ = step_sg(st, batch, rng, phase)
            return st2
        timed("step_sgd", step1sg, state_sgd)

    if "step_nodvolgrad" in modes:
        # stop_gradient on the VOLUME argument of the flow-warped sampler:
        # backward keeps coordinate (flow) gradients but drops the octo-paired
        # d_vol wide-row scatter — isolates that scatter's backward cost
        from zest_tpu.kernels import trilinear as _tri
        orig_diff = _tri.sample_volume_zbanded_diff

        def sg_diff(vol, ndc, band=6, approx=None, paired=None):
            return orig_diff(jax.lax.stop_gradient(vol), ndc, band=band,
                             approx=approx,
                             paired=(None if paired is None
                                     else jax.lax.stop_gradient(paired)))

        _tri.sample_volume_zbanded_diff = sg_diff
        step_nd = system.make_train_step(opt)

        def step1nd(st):
            st2, _ = step_nd(st, batch, rng, phase)
            return st2
        timed("step_nodvolgrad", step1nd, state)
        _tri.sample_volume_zbanded_diff = orig_diff

    if "step" in modes:
        def step1(st):
            st2, _ = step_fn(st, batch, rng, phase)
            return st2
        timed("step", step1, state)


if __name__ == "__main__":
    main(sys.argv[1:] or ["volumes", "fwd", "step"])
