"""Trained-regime quality gate (VERDICT r3 next #7).

Perf rounds must not silently regress training quality while optimizing the
step. This harness trains the FLAGSHIP configuration (full ZeST: both volumes
+ scene flow + all losses, the exact bench.py protocol) on the deterministic
synthetic dynamic scene for N steps on the real chip, then runs the standard
full-image validation (train_loop.validate: the same eval path run_test uses)
and asserts val PSNR crosses a recorded floor. This is an OVERFIT-convergence
gate (the synthetic scene has one split — the reference's configs_overfit
smoke-test semantics, SURVEY §4.4): training samples ~1k random rays/step of
the 147k-pixel images, so full-image PSNR still measures real reconstruction.

The gate floor comes from a recorded real-chip reference run (seed 0; see
the BENCH_NOTES "quality gate" row — update it alongside any legitimate
convergence-affecting change). Step counts whose floor is None report PSNR
without gating.

Usage:
    PYTHONPATH=/root/repo:$PYTHONPATH python tools/quality_gate.py [N_STEPS]
Exits nonzero if the gate fails (wired for future CI; the reference repo's
analogue is its overfit smoke configs, SURVEY.md §4.4).
"""
import json
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# Gate floors by step count (real-chip reference runs; see module docstring).
# A run at an unlisted step count reports PSNR but does not gate.
PSNR_THRESHOLDS = {
    # filled from the first recorded real-chip run (BENCH_NOTES "quality
    # gate" row) minus ~1 dB margin: round-5 run, seed 0, 2000 steps,
    # val_PSNR 29.039 / val_SSIM 0.7895 (2026-08-19, default flags)
    2000: 28.0,
}


def main(n_steps=2000):
    from pathlib import Path
    from zest_tpu.config import ZestConfig
    from zest_tpu.data.synthetic import SyntheticDataset
    from zest_tpu.train_loop import run_training, validate

    cfg = ZestConfig(train_sceneflow=True, use_mvs=True, use_mvs_dy=True,
                     pad=24, num_keyframes=8, netdepth=8, netwidth=256,
                     multires=10, multires_views=4, N_samples=128,
                     batch_size=600, num_extra_samples=512,
                     use_motion_mask=True, decay_iteration=30,
                     with_chain_loss=True, pts_embedder=True,
                     dir_embedder=True, use_viewdirs=True, num_epochs=6000,
                     raw_noise_std=1.0, img_h=288, img_w=512, precision=16,
                     seed_everything=0, steps_per_epoch=1000,
                     save_dir="/tmp/quality_gate", expname="qgate",
                     log_every=200)
    train_ds = SyntheticDataset(img_h=288, img_w=512, num_frames=24,
                                num_keyframes=8, use_mvs=True, use_mvs_dy=True)
    # same scene: overfit-convergence gate (see module docstring)
    val_ds = SyntheticDataset(img_h=288, img_w=512, num_frames=24,
                              num_keyframes=8, use_mvs=True, use_mvs_dy=True)
    cfg = cfg.replace(warp_band=train_ds.warp_band_bound(pad=cfg.pad,
                                                         group=cfg.warp_group))

    t0 = time.perf_counter()
    # no "val" key: skips mid-run validation; we validate once at the end
    state, system = run_training(cfg, max_steps=n_steps,
                                 datasets={"train": train_ds}, quiet=False)
    train_s = time.perf_counter() - t0

    eval_fn = system.make_eval_step()
    out = validate(cfg, system, eval_fn, state.params, val_ds,
                   Path(cfg.save_dir) / cfg.expname, n_steps, max_images=2,
                   tag="qgate")
    psnr = out["val_PSNR"]
    thresh = PSNR_THRESHOLDS.get(n_steps)
    result = {"steps": n_steps, "val_PSNR": round(psnr, 3),
              "val_SSIM": round(out["val_SSIM"], 4),
              "threshold": thresh, "train_s": round(train_s, 1),
              "passed": (thresh is None or psnr >= thresh)}
    print(json.dumps(result), flush=True)
    if thresh is not None and psnr < thresh:
        sys.exit(1)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 2000)
