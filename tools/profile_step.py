"""Capture a jax.profiler trace of the flagship train step on the real chip and
aggregate leaf-event durations by op 'source' — the round-1 methodology from
BENCH_NOTES.md (the axon tunnel memoizes repeat executions, so naive timing
loops lie; traces do not).

Usage (real TPU, JAX_PLATFORMS=axon preset):
    python tools/profile_step.py [outdir]
Then aggregate:
    python tools/profile_step.py --aggregate <outdir>
"""
import glob
import gzip
import json
import sys
from collections import defaultdict


def capture(outdir):
    import jax
    import jax.numpy as jnp
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
    cfg = cfg.replace(warp_band=ds.warp_band_bound(pad=cfg.pad, group=cfg.warp_group))  # like bench.py
    system = ZestSystem(cfg)
    params = system.init_params(jax.random.PRNGKey(0), batch)
    opt = system.make_optimizer(steps_per_epoch=24)
    state = TrainState(params, opt.init(params), jnp.asarray(0))
    step_fn = system.make_train_step(opt)
    phase = phase_for_step(cfg, 0)
    rng = jax.random.PRNGKey(1)

    state, logs = step_fn(state, batch, rng, phase)   # compile
    # axon tunnel defers execution: block_until_ready is a no-op; only a value
    # transfer forces the chain. Force the warmup BEFORE the trace window so the
    # trace contains exactly the 3 timed steps, and force again inside it.
    float(logs["train_loss"])

    with jax.profiler.trace(outdir):
        for _ in range(3):
            state, logs = step_fn(state, batch, rng, phase)
        float(logs["train_loss"])
    print("trace written to", outdir)


def aggregate(outdir, top=30):
    """Sum leaf-op durations on DEVICE lanes only (pid whose process_name
    mentions the TPU device; thread 'XLA Ops'), grouped by op-name stem +
    source file:line."""
    files = glob.glob(f"{outdir}/**/*.trace.json.gz", recursive=True)
    assert files, f"no trace under {outdir}"
    ev_by_src = defaultdict(float)
    total = 0.0
    for f in files:
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        events = data.get("traceEvents", [])
        pid_name = {}
        tid_name = {}
        for ev in events:
            if ev.get("ph") == "M" and ev.get("name") == "process_name":
                pid_name[ev["pid"]] = ev["args"].get("name", "")
            if ev.get("ph") == "M" and ev.get("name") == "thread_name":
                tid_name[(ev["pid"], ev.get("tid"))] = \
                    ev["args"].get("name", "")
        dev_pids = {p for p, n in pid_name.items()
                    if "TPU" in n or "Device" in n or "/device" in n}
        # collect device-op events per lane, then subtract nested children so
        # composite ops (conditional/while bodies) are not double-counted
        lanes = defaultdict(list)
        for ev in events:
            if ev.get("ph") != "X" or "dur" not in ev:
                continue
            if ev.get("pid") not in dev_pids:
                continue
            tname = tid_name.get((ev.get("pid"), ev.get("tid")), "")
            if "XLA Ops" not in tname and "Ops" not in tname:
                continue
            lanes[(ev["pid"], ev.get("tid"))].append(ev)
        for evs in lanes.values():
            evs.sort(key=lambda e: (e["ts"], -e["dur"]))
            stack = []
            child_time = {}
            for ev in evs:
                me = (ev["ts"], ev["ts"] + ev["dur"])
                while stack and me[0] >= stack[-1][1]:
                    stack.pop()
                if stack:
                    pid = id(stack[-1][2])
                    child_time[pid] = child_time.get(pid, 0.0) + ev["dur"]
                stack.append((me[0], me[1], ev))
            for ev in evs:
                self_dur = ev["dur"] - child_time.get(id(ev), 0.0)
                if self_dur <= 0:
                    continue
                args = ev.get("args") or {}
                src = args.get("source") or ""
                name = ev.get("name", "")
                stem = name.split(".")[0].split("(")[0][:40]
                key = f"{stem} | {src.split('/')[-1][:40]}"
                ev_by_src[key] += self_dur / 1e3   # ms
                total += self_dur / 1e3
    print(f"device leaf-op ms over 3 steps: {total:.1f} ({total/3:.1f}/step)")
    for k, v in sorted(ev_by_src.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{v/3:9.2f} ms  {k}")


if __name__ == "__main__":
    if sys.argv[1:2] == ["--aggregate"]:
        aggregate(sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 30)
    else:
        capture(sys.argv[1] if len(sys.argv) > 1 else "/tmp/zest_trace")
