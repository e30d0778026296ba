"""First-principles roofline of the flagship train step vs TPU v5e peaks.

VERDICT r4 next #3: at 2.13x after four rounds of shaving, decide from
hardware limits whether the 10x north star (~50 ms/step) is reachable in the
current formulation, and pick the structural bet.

Method
------
FLOPs per block come from XLA's own HLO cost analysis of the traced graph
(`jax.jit(fn).lower(args).cost_analysis()`), run on the CPU backend where
every kernel fast path traces through its XLA fallback / interpret form, so
the counts cover the whole math. HBM bytes for the dominant arrays are
modeled analytically (the pre-optimization 'bytes accessed' counts every
unfused intermediate and wildly overstates post-fusion traffic).

v5e peaks used: 197 TFLOP/s bf16 MXU, 819 GB/s HBM.

Measured block times come from the round-4 ablation (tools/bench_ablate.py,
BENCH_NOTES.md round-4 section) — pass --measured to annotate.

Run (CPU-only, no tunnel needed):
    PYTHONPATH=/root/repo python tools/roofline.py
"""
import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp

PEAK_FLOPS = 197e12   # v5e bf16
PEAK_HBM = 819e9      # v5e HBM GB/s


def analyze(name, fn, *args):
    lo = jax.jit(fn).lower(*args)
    ca = lo.cost_analysis()
    flops = float(ca.get("flops", 0.0))
    return {"block": name, "gflop": flops / 1e9,
            "t_mxu_ms": flops / PEAK_FLOPS * 1e3}


def main():
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
    cfg = cfg.replace(warp_band=ds.warp_band_bound(pad=cfg.pad,
                                                   group=cfg.warp_group))
    system = ZestSystem(cfg)
    params = system.init_params(jax.random.PRNGKey(0), batch)
    opt = system.make_optimizer(steps_per_epoch=24)
    state = TrainState(params, opt.init(params), jnp.asarray(0))
    step_fn = system.make_train_step(opt)
    phase = phase_for_step(cfg, 0)
    rng = jax.random.PRNGKey(1)

    rows = []

    def vols(p):
        return system._encode_volumes(p, batch)
    rows.append(analyze("volumes fwd (2 MVS encoders)", vols, params))

    def fwd(p):
        ret, rays, aux = system.forward_train(p, batch, rng, phase,
                                              jnp.asarray(0))
        return sum(jnp.sum(v.astype(jnp.float32))
                   for v in jax.tree_util.tree_leaves(ret)
                   if v.dtype != jnp.int32)
    rows.append(analyze("full fwd (volumes+render+losses)", fwd, params))

    def step(st):
        st2, _ = step_fn(st, batch, rng, phase)
        return st2
    rows.append(analyze("full step (fwd+bwd+adam)", step, state))

    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))

    print(json.dumps({"rows": rows, "n_params": int(n_params)}, indent=1))


if __name__ == "__main__":
    sys.exit(main())
