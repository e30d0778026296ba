"""Trained-flow-regime throughput row (VERDICT r2 next #3).

The probe (tools/probe_trained_flow.py) shows the reference-init tanh scene-
flow heads SATURATE at |sf| = 1 and stay saturated for thousands of steps —
so the random-init bench permanently exercises the XLA fallback, and a
genuinely-converged checkpoint (flows ~ pixels/frame ≈ 1e-2 NDC) is the only
regime where the coordinate-differentiable banded kernel engages. This tool
measures that regime HONESTLY-LABELLED: it scales the dynamic field's
sf_linear head by ``SF_SCALE`` (the multiplicative trunk emits pre-tanh
activations in the hundreds, so 1e-5 lands flows in the ~1e-2..1e-3 NDC range
a converged model produces; nothing else changes), VERIFIES the z-band
predicate flips to the kernel branch, and times the identical train step.
"""
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

SF_SCALE = 1e-5


def main():
    from zest_tpu.config import ZestConfig
    from zest_tpu.data.synthetic import SyntheticDataset
    from zest_tpu.system import ZestSystem, TrainState, phase_for_step
    from zest_tpu.kernels.trilinear import _precompute

    cfg = ZestConfig(train_sceneflow=True, use_mvs=True, use_mvs_dy=True, pad=24,
                     num_keyframes=8, netdepth=8, netwidth=256, multires=10,
                     multires_views=4, N_samples=128, batch_size=600,
                     num_extra_samples=512, use_motion_mask=True,
                     decay_iteration=30, with_chain_loss=True, pts_embedder=True,
                     dir_embedder=True, use_viewdirs=True, num_epochs=6000,
                     raw_noise_std=1.0, img_h=288, img_w=512, precision=16)
    ds = SyntheticDataset(img_h=288, img_w=512, num_frames=24, num_keyframes=8,
                          use_mvs=True, use_mvs_dy=True)
    batch = {k: jnp.asarray(v) for k, v in ds[3].items()}
    cfg = cfg.replace(warp_band=ds.warp_band_bound(pad=cfg.pad, group=cfg.warp_group))

    system = ZestSystem(cfg)
    params = system.init_params(jax.random.PRNGKey(0), batch)
    # simulate converged flows: scale the sf head 100x down (≈1e-2 NDC flows)
    sf = params["nerf_dynamic"]["params"]["sf_linear"]
    sf["kernel"] = sf["kernel"] * SF_SCALE
    sf["bias"] = sf["bias"] * SF_SCALE

    opt = system.make_optimizer(steps_per_epoch=24)
    state = TrainState(params, opt.init(params), jnp.asarray(0))
    step_fn = system.make_train_step(opt)
    phase = phase_for_step(cfg, 0)
    rng = jax.random.PRNGKey(1)
    n_rays = cfg.batch_size + cfg.num_extra_samples

    # verify the branch actually flips before timing
    fwd = jax.jit(lambda p: system.forward_train(p, batch, rng, phase, 0))
    ret, rays, _ = fwd(params)
    D, Hv, Wv = 128, cfg.img_h // 4 + 2 * cfg.pad, cfg.img_w // 4 + 2 * cfg.pad
    prev_ndc = rays.ndc + ret["raw_sf_ref2prev"]
    post_ndc = rays.ndc + ret["raw_sf_ref2post"]
    *_a, ok_prev = _precompute(prev_ndc, D, Hv, Wv, cfg.z_band_warped)
    *_b, ok_post = _precompute(post_ndc, D, Hv, Wv, cfg.z_band_warped)
    print(f"band_ok prev={bool(ok_prev)} post={bool(ok_post)} "
          f"(z_band_warped={cfg.z_band_warped})", flush=True)
    assert bool(ok_prev) and bool(ok_post), \
        "scaled flows must fit the band — kernel branch not engaged"

    state, logs = step_fn(state, batch, rng, phase)
    float(logs["train_loss"])
    n_steps = 10
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, logs = step_fn(state, batch, rng, phase)
    float(logs["train_loss"])
    dt = time.perf_counter() - t0
    rps = n_rays * n_steps / dt
    print(f"trained-regime (sf x{SF_SCALE}, kernel branch): "
          f"{dt / n_steps * 1000:.0f} ms/step, {rps:.0f} rays/s", flush=True)


if __name__ == "__main__":
    main()
