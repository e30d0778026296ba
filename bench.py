"""Benchmark: full-ZeST training-step ray throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Protocol: the flagship configuration at reference scale — 288x512 NSFF images,
static (8 keyframes) + dynamic (4 neighbours) encoding volumes with pad=24,
batch 600 rays + 512 motion extras, N_samples=128, 3 dynamic MLP passes + chain —
i.e. one full `config_zest_nsff_cross1` training step (forward+backward+adam).
Throughput = rays/sec sustained over timed steps after warmup.

vs_baseline: the reference publishes no numbers (BASELINE.md). Denominator is the
documented estimate of the PyTorch reference on its own hardware (1x 2080Ti-class
GPU): ~2 it/s at 1112 rays/step ≈ 2,200 rays/s (see BENCH_NOTES.md for derivation).

Tunnel-outage hardening (round 4): the axon TPU tunnel occasionally dies; a
process with `.axon_site` on PYTHONPATH then hangs for minutes at jax import /
fails "Unable to initialize backend 'axon'" — EVEN under JAX_PLATFORMS=cpu.
Importing jax before the backend is known-healthy would therefore hang THIS
process too. So: probe `jax.devices()` in a bounded SUBPROCESS first, retrying
on the documented playbook cadence (CLAUDE.md), and only import jax in-process
once a probe succeeds. If the tunnel never recovers within the budget, exit
with a clear one-line diagnostic instead of a raw traceback (a transient
outage must not silently zero a round's perf evidence — VERDICT r3 weak #1).
"""
import json
import os
import subprocess
import sys
import time

REFERENCE_RAYS_PER_SEC = 2200.0  # documented estimate — BENCH_NOTES.md

# Probe budget: 2-min probes (a healthy backend answers in ~5-20 s; an outage
# hangs past any timeout), short sleeps between, ~25 min total — long enough to
# ride out a tunnel restart, bounded so the driver isn't stuck for hours.
PROBE_TIMEOUT_S = 150
PROBE_SLEEP_S = 60
PROBE_BUDGET_S = 1500


def _probe_backend_once() -> tuple[bool, str]:
    """Run `jax.devices()` in a subprocess with a hard timeout."""
    code = "import jax; print([d.platform for d in jax.devices()])"
    try:
        r = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True, text=True, timeout=PROBE_TIMEOUT_S,
            env=os.environ.copy(),
        )
    except subprocess.TimeoutExpired:
        return False, f"probe timed out after {PROBE_TIMEOUT_S}s (tunnel hang)"
    if r.returncode != 0:
        tail = (r.stderr or r.stdout).strip().splitlines()
        return False, tail[-1] if tail else f"probe rc={r.returncode}"
    return True, r.stdout.strip().splitlines()[-1] if r.stdout.strip() else "ok"

def wait_for_backend() -> None:
    """Block until the jax backend initializes in a subprocess, or exit(3)."""
    deadline = time.monotonic() + PROBE_BUDGET_S
    attempt = 0
    while True:
        attempt += 1
        ok, detail = _probe_backend_once()
        if ok:
            if attempt > 1:
                print(f"bench: backend recovered on probe {attempt}: {detail}",
                      file=sys.stderr)
            return
        remaining = deadline - time.monotonic()
        print(f"bench: backend probe {attempt} failed ({detail}); "
              f"{remaining:.0f}s of retry budget left", file=sys.stderr)
        if remaining <= PROBE_SLEEP_S:
            print("bench: ERROR — jax backend unreachable after "
                  f"{PROBE_BUDGET_S}s of probes (axon tunnel down?). "
                  "Refusing to hang at import; see CLAUDE.md outage playbook.",
                  file=sys.stderr)
            sys.exit(3)
        time.sleep(PROBE_SLEEP_S)


def main():
    wait_for_backend()

    import jax
    import jax.numpy as jnp

    # persistent compilation cache: the flagship step (volumes + Pallas kernels
    # + cond fallback branches) takes minutes to compile cold over the tunnel;
    # a pre-warmed cache makes driver/bench reruns start in seconds
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from zest_tpu.config import ZestConfig
    from zest_tpu.data.synthetic import SyntheticDataset
    from zest_tpu.system import ZestSystem, TrainState, phase_for_step

    cfg = ZestConfig(train_sceneflow=True, use_mvs=True, use_mvs_dy=True, pad=24,
                     num_keyframes=8, netdepth=8, netwidth=256, multires=10,
                     multires_views=4, N_samples=128, batch_size=600,
                     num_extra_samples=512, use_motion_mask=True,
                     decay_iteration=30, with_chain_loss=True, pts_embedder=True,
                     dir_embedder=True, use_viewdirs=True, num_epochs=6000,
                     raw_noise_std=1.0, img_h=288, img_w=512,
                     precision=16)  # bf16 encoder compute — the TPU analogue of
                                    # the reference's supported fp16 mode (opt.py:69)
    ds = SyntheticDataset(img_h=288, img_w=512, num_frames=24, num_keyframes=8,
                          use_mvs=True, use_mvs_dy=True)
    batch = {k: jnp.asarray(v) for k, v in ds[3].items()}

    # the exact host-side warp-band preflight, as run by the real NSFF loader
    # at dataset init (data/nsff.py:240) — static kernel band per dataset
    cfg = cfg.replace(warp_band=ds.warp_band_bound(pad=cfg.pad, group=cfg.warp_group))

    system = ZestSystem(cfg)
    params = system.init_params(jax.random.PRNGKey(0), batch)
    opt = system.make_optimizer(steps_per_epoch=24)
    state = TrainState(params, opt.init(params), jnp.asarray(0))
    step_fn = system.make_train_step(opt)
    phase = phase_for_step(cfg, 0)
    rng = jax.random.PRNGKey(1)

    n_rays = cfg.batch_size + cfg.num_extra_samples

    # warmup (compile). NOTE: the axon tunnel DEFERS execution —
    # jax.block_until_ready returns immediately without running anything; only
    # an actual value transfer (float()) forces the computation chain. Timing
    # with block_until_ready reads dispatch rate (~3 ms/step), not step time.
    state, logs = step_fn(state, batch, rng, phase)
    float(logs["train_loss"])

    # 50-step window (round-3 methodology fix): the tunnel's final value fetch
    # costs ~0.5 s of constant round-trip latency; amortized over only 10
    # steps it UNDER-reported sustained throughput by ~12% as steps got
    # faster. 50 steps matches the production fetch cadence (log_every=50).
    n_steps = 50
    t0 = time.perf_counter()
    for i in range(n_steps):
        # per-step key derives from (rng, state.step) on-device — no host
        # key-split dispatch per step (tunnel round trips)
        state, logs = step_fn(state, batch, rng, phase)
    float(logs["train_loss"])   # forces the whole n_steps chain
    dt = time.perf_counter() - t0

    rays_per_sec = n_rays * n_steps / dt
    print(json.dumps({
        "metric": "train_rays_per_sec_full_zest",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s/chip",
        "vs_baseline": round(rays_per_sec / REFERENCE_RAYS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
