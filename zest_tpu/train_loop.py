"""Training / evaluation loops — the harness around the jitted steps.

Replaces the reference's PyTorch-Lightning Trainer usage (train.py:1276-1349):
epoch loop, periodic validation every ``check_val_every_n_epoch =
min(N_vis, ceil(num_epochs / N_vis))`` epochs, top-5-by-val-loss + last
checkpointing, auto-resume from ``last``, CSV metric logging, visual dumps.
"""
from __future__ import annotations

import csv
import json
import time
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import metrics
from .checkpoint import CheckpointManager
from .config import ZestConfig
from .data import dataset_dict
from .system import Phase, TrainState, ZestSystem, phase_for_step, unpreprocess
from .utils.visualize import save_image, visualize_depth


def build_datasets(cfg: ZestConfig, splits=("train", "val")):
    """Instantiate datasets with the reference's per-dataset kwargs
    (prepare_data, train.py:194-263)."""
    ds_fn = dataset_dict[cfg.dataset_name]
    out = {}
    for split in splits:
        kwargs = {}
        if cfg.finetune_scene is not None:
            kwargs["scene"] = cfg.finetune_scene
        if cfg.dataset_name == "dtu":
            kwargs["max_len"] = -1 if split != "val" else 10
        if cfg.dataset_name == "llff":
            kwargs["depth_path"] = cfg.depth_path if split == "train" else None
        if cfg.dataset_name == "neural3dvideo":
            # train.py:207 (the reference reads an undefined hparam here — see
            # config.key_frames)
            kwargs["train_key_frames"] = cfg.key_frames
        if cfg.dataset_name in ("nsff", "synthetic"):
            kwargs.update(num_keyframes=cfg.num_keyframes, use_mvs=cfg.use_mvs,
                          use_mvs_dy=cfg.use_mvs_dy, img_h=cfg.img_h,
                          img_w=cfg.img_w, crossval=cfg.crossval,
                          frame_jump=cfg.frame_jump)
        down = cfg.imgScale_train if split == "train" else cfg.imgScale_test
        out[split] = ds_fn(cfg.datadir, config_dir=cfg.configdir, split=split,
                           downSample=down,
                           closest_views=cfg.use_closest_views, **kwargs)
    return out


def to_device(sample):
    return {k: jnp.asarray(v) for k, v in sample.items()}


class WandbAdapter:
    """Optional W&B sink with the reference's resumable-run-id semantics
    (train.py:1297-1314): the run id persists in wandb_id.txt so a resumed
    training continues the same W&B run. Dormant when wandb is not installed
    (this image has no wandb and no egress)."""

    def __init__(self, save_dir: Path, expname: str, project: str = "SVS"):
        import wandb  # raises ImportError when unavailable — caller gates
        id_file = save_dir / "wandb_id.txt"
        if id_file.exists():
            run_id = id_file.read_text().strip()
        else:
            run_id = wandb.util.generate_id()
            save_dir.mkdir(parents=True, exist_ok=True)
            id_file.write_text(run_id)
        self.run = wandb.init(project=project, name=expname, id=run_id,
                              resume="allow")

    def log(self, step: int, scalars: dict):
        self.run.log({k: float(v) for k, v in scalars.items()}, step=step)

    def close(self):
        self.run.finish()


def _maybe_wandb(save_dir: Path, expname: str):
    try:
        return WandbAdapter(save_dir, expname)
    except Exception:
        return None


class MetricLogger:
    """CSV + stdout logging (observability replacement for W&B scalars).

    Distinct rows carry distinct key sets (train scalars vs val metrics); when a
    row introduces new keys the file is rewritten with the expanded header so no
    column is silently dropped (round-1 bug: first-row-frozen fieldnames lost all
    val_* columns).
    """

    def __init__(self, save_dir: Path, expname: str = ""):
        save_dir.mkdir(parents=True, exist_ok=True)
        self.path = save_dir / "metrics.csv"
        self._wandb = _maybe_wandb(save_dir, expname) if expname else None
        self._keys: list = []
        self._rows: list = []
        self._fh = None
        self._writer = None
        if self.path.exists():  # resumed run: keep prior rows
            with open(self.path, newline="") as f:
                reader = csv.DictReader(f)
                self._keys = list(reader.fieldnames or [])
                self._rows = list(reader)

    def _reopen(self):
        if self._fh:
            self._fh.close()
        self._fh = open(self.path, "w", newline="")
        self._writer = csv.DictWriter(self._fh, fieldnames=self._keys,
                                      restval="")
        self._writer.writeheader()
        for row in self._rows:
            self._writer.writerow(row)

    def log(self, step: int, scalars: dict):
        row = {"step": step, **{k: float(v) for k, v in scalars.items()}}
        new = [k for k in row if k not in self._keys]
        self._rows.append(row)
        if new or self._fh is None:
            self._keys += new
            self._reopen()
        else:
            self._writer.writerow(row)
        self._fh.flush()
        if self._wandb is not None:
            self._wandb.log(step, {k: v for k, v in row.items() if k != "step"})

    def close(self):
        if self._fh:
            self._fh.close()
        if self._wandb is not None:
            self._wandb.close()


def validate(cfg, system, eval_fn, params, val_ds, save_dir: Path, step: int,
             max_images: Optional[int] = None, tag="val"):
    """Full-image validation: PSNR/SSIM (+ LPIPS when weights available), PNG dumps.

    Mirrors validation_step_sceneflow / _svs (train.py:762-950).
    """
    img_dir = save_dir / f"{tag}_images"
    img_dir.mkdir(parents=True, exist_ok=True)
    n = len(val_ds) if max_images is None else min(len(val_ds), max_images)
    psnrs, ssims, losses = [], [], []
    lpips_fn = _maybe_lpips(cfg)
    lpips_vals = []
    for i in range(n):
        batch = to_device(val_ds[i])
        maps = eval_fn(params, batch)
        tgt = unpreprocess(batch["images"][-1])
        key = "rgb_map_ref" if cfg.train_sceneflow else "rgb_map"
        pred = jnp.clip(maps[key], 0.0, 1.0)
        losses.append(float(jnp.mean((pred - tgt) ** 2)))
        psnrs.append(float(metrics.psnr(pred, tgt)))
        ssims.append(float(metrics.ssim(pred, tgt, 5)))
        if lpips_fn is not None:
            lpips_vals.append(float(lpips_fn(pred, tgt)))
        if i < 4:  # visual dumps for the first few images
            save_image(img_dir / f"{step:08d}_{i:02d}_rgb.png", np.asarray(pred))
            dkey = "depth_map_ref" if cfg.train_sceneflow else "depth_map"
            save_image(img_dir / f"{step:08d}_{i:02d}_depth.png",
                       visualize_depth(np.asarray(maps[dkey])))
            save_image(img_dir / f"{step:08d}_{i:02d}_err.png",
                       np.abs(np.asarray(pred - tgt)) * 5)
    out = {"val_loss": float(np.mean(losses)), "val_PSNR": float(np.mean(psnrs)),
           "val_SSIM": float(np.mean(ssims))}
    if lpips_vals:
        out["val_LPIPS"] = float(np.mean(lpips_vals))
    return out


def _maybe_lpips(cfg):
    """LPIPS metric when weights are configured. A bad/missing weight file is an
    ERROR (silently dropping the metric hides parity gaps), not a fallback."""
    if not cfg.lpips_weights:
        return None
    from .models.lpips import load_lpips
    try:
        return load_lpips(cfg.lpips_weights)
    except Exception as e:
        raise RuntimeError(
            f"--lpips_weights {cfg.lpips_weights!r} was set but loading failed; "
            f"refusing to silently disable the LPIPS metric") from e


def apply_warp_band_preflight(cfg: ZestConfig, train_ds, verbose=True):
    """Set the Pallas warp-kernel band from the dataset's exact host-side bound
    (kernels/plane_sweep.py). Lowering from the conservative default is a pure
    speedup (kernel cost is linear in the band); raising is a correctness fix.
    A band the user explicitly raised above the default is never LOWERED: the
    plane-sweep kernel has no runtime ok-guard, so an (unlikely) gap in the
    host bound would silently zero out-of-band taps — an explicit larger band
    is a safe, user-chosen margin."""
    if not (cfg.use_pallas_warp and hasattr(train_ds, "warp_band_bound")):
        return cfg
    bound = int(train_ds.warp_band_bound(pad=cfg.pad, group=cfg.warp_group))
    import dataclasses
    default_band = next(f.default for f in dataclasses.fields(type(cfg))
                        if f.name == "warp_band")
    if cfg.warp_band != default_band:
        bound = max(bound, cfg.warp_band)
    if bound != cfg.warp_band:
        if verbose:
            print(f"warp_band preflight: {cfg.warp_band} -> exact bound {bound}")
        cfg = cfg.replace(warp_band=bound)
    return cfg


def run_training(cfg: ZestConfig, max_steps: Optional[int] = None,
                 datasets=None, quiet=False):
    """Full training run. Returns the final TrainState."""
    if cfg.seed_everything >= 0:
        seed = cfg.seed_everything
    else:
        seed = 0
    rng = jax.random.PRNGKey(seed)

    datasets = datasets or build_datasets(cfg)
    train_ds, val_ds = datasets["train"], datasets.get("val")
    steps_per_epoch = cfg.steps_per_epoch or len(train_ds)

    # Pallas warp-kernel preflight: the static band must cover every pose pair
    # in the dataset (kernels/plane_sweep.py). The host-side bound is EXACT, so
    # set the band to it — lowering from the conservative default is a pure
    # speedup (kernel cost is linear in the band), raising is a correctness fix
    cfg = apply_warp_band_preflight(cfg, train_ds, verbose=not quiet)

    if cfg.N_importance > 0:
        import warnings
        # the reference builds nerf_fine for N_importance > 0 but its renderer
        # never consumes it (train.py:143-148) — flag accepted, no-op, loudly
        warnings.warn("N_importance > 0 builds an unused fine network in the "
                      "reference and is a no-op here", stacklevel=2)

    save_dir = Path(cfg.save_dir) / cfg.expname
    ckpt = CheckpointManager(save_dir / "ckpts", cfg)
    logger = MetricLogger(save_dir, cfg.expname)

    system = ZestSystem(cfg)
    batch0 = to_device(train_ds[0])
    rng, k_init = jax.random.split(rng)

    gan = None
    if cfg.gan_type:
        # adversarial (SVS) branch: generator + discriminator(s), 3 optimizers
        # (reference dispatches on gan_type inside training_step, train.py:640-741)
        from .system_gan import GanSystem, GanTrainState
        if cfg.acc_grad > 1:
            import warnings
            warnings.warn("acc_grad > 1 is not supported on the GAN path; "
                          "ignoring it", stacklevel=2)
        gan = GanSystem(system)
        state = gan.init(k_init, batch0, steps_per_epoch)
        optimizer = system.make_optimizer(steps_per_epoch)
        disc_optimizer = gan.make_disc_optimizer(steps_per_epoch)
        state_cls = GanTrainState
    else:
        params = system.init_params(k_init, batch0)
        # gradient accumulation (reference accumulate_grad_batches,
        # train.py:1333): optax.MultiSteps applies the update every acc_grad
        # micro-steps; the cosine schedule sees optimizer steps, so scale the
        # per-epoch step count accordingly
        opt_steps_per_epoch = max(steps_per_epoch // max(cfg.acc_grad, 1), 1)
        optimizer = system.make_optimizer(opt_steps_per_epoch)
        if cfg.acc_grad > 1:
            import optax
            optimizer = optax.MultiSteps(optimizer, cfg.acc_grad)
        state = TrainState(params, optimizer.init(params), jnp.asarray(0))
        state_cls = TrainState

    # auto-resume (train.py:1317-1321)
    if cfg.ckpt:
        state = state_cls(*ckpt_restore_external(cfg.ckpt, state))
    elif ckpt.has_last():
        state = state_cls(*ckpt.restore("last", tuple(state)))
        if not quiet:
            print(f"resumed from {ckpt.dir/'last'} at step {int(state.step)}")

    step_fn = (gan.make_train_step(optimizer, disc_optimizer) if gan is not None
               else system.make_train_step(optimizer))
    eval_fn = system.make_eval_step()

    total_steps = max_steps if max_steps is not None else \
        (cfg.max_train_steps if cfg.max_train_steps > 0
         else cfg.num_epochs * steps_per_epoch)
    check_val_every = max(min(cfg.N_vis, -(-cfg.num_epochs // cfg.N_vis)), 1)

    host_step = int(state.step)
    perm_rng = np.random.default_rng(seed)
    t_last = time.perf_counter()
    while host_step < total_steps:
        epoch = host_step // steps_per_epoch
        order = perm_rng.permutation(len(train_ds))
        # background-thread prefetch: host IO (PNG decode, resize) overlaps the
        # device step instead of stalling it (pipeline.py; reference's
        # DataLoader(num_workers=4), train.py:303-310)
        from .data.pipeline import prefetch_to_device
        for batch in prefetch_to_device(train_ds, iter(order), buffer_size=2):
            if host_step >= total_steps:
                break
            phase = phase_for_step(cfg, host_step)
            # the step folds its counter into this constant base key on-device
            state, logs = step_fn(state, batch, rng, phase)
            host_step += 1
            if host_step % cfg.log_every == 0:
                dt = time.perf_counter() - t_last
                t_last = time.perf_counter()
                sps = cfg.log_every / dt
                logger.log(host_step, {**logs, "steps_per_sec": sps})
                if not quiet:
                    print(f"step {host_step} loss={float(logs['train_loss']):.4f} "
                          f"PSNR={float(logs['train_PSNR']):.2f} ({sps:.2f} it/s)")

        # end of epoch: maybe validate + checkpoint
        if val_ds is not None and (epoch + 1) % check_val_every == 0:
            val_logs = validate(cfg, system, eval_fn, state.params, val_ds,
                                save_dir, host_step, max_images=4)
            logger.log(host_step, val_logs)
            if not quiet:
                print(f"epoch {epoch}: " + " ".join(f"{k}={v:.4f}"
                                                    for k, v in val_logs.items()))
            ckpt.save_topk(tuple(state), val_logs["val_loss"], host_step)
        ckpt.save_last(tuple(state))

    ckpt.save_last(tuple(state))
    logger.close()
    return state, system


def ckpt_restore_external(path, state_like):
    """Restore an explicit checkpoint path (--ckpt flag semantics)."""
    mgr = CheckpointManager(Path(path).parent)
    return mgr.restore(Path(path).name, tuple(state_like))


def run_test(cfg: ZestConfig, datasets=None, quiet=False):
    """Evaluation entry: full-image metrics over the test split →
    test_metrics.txt (test_epoch_end, train.py:1239-1256)."""
    datasets = datasets or build_datasets(cfg, splits=("test",))
    test_ds = datasets["test"]
    save_dir = Path(cfg.save_dir) / cfg.expname
    save_dir.mkdir(parents=True, exist_ok=True)

    # warp-band preflight for standalone eval: the plane-sweep kernel has no
    # runtime band guard, so a test dataset whose exact bound exceeds the
    # configured band would silently zero out-of-band taps (ADVICE r3 #1)
    cfg = apply_warp_band_preflight(cfg, test_ds, verbose=not quiet)

    system = ZestSystem(cfg)
    batch0 = to_device(test_ds[0])
    params = system.init_params(jax.random.PRNGKey(0), batch0)
    if not cfg.ckpt:
        # without --ckpt this evaluates RANDOM INIT and would still write a
        # legitimate-looking test_metrics.txt — be loud about it
        import warnings
        warnings.warn("run_test called without --ckpt: evaluating randomly "
                      "initialised weights, not a trained model", stacklevel=2)
    if cfg.ckpt:
        ckpt_dir = Path(cfg.ckpt).parent
        mgr = CheckpointManager(ckpt_dir)
        optimizer = system.make_optimizer(1)
        state = TrainState(params, optimizer.init(params), jnp.asarray(0))
        state = TrainState(*mgr.restore(Path(cfg.ckpt).name, tuple(state)))
        params = state.params

    if cfg.vis_cnn and system.enc_static is not None:
        # CNN introspection dumps (--vis_cnn, networks.py:1164-1235)
        from .utils.introspect import dump_encoder_activations
        b0 = to_device(test_ds[0])
        dump_encoder_activations(system.enc_static, params["enc_static"],
                                 b0["images"][:-1], b0["proj_mats"][:-1],
                                 b0["near_fars"][0], cfg.pad, cfg.save_test)

    eval_fn = system.make_eval_step()
    out = validate(cfg, system, eval_fn, params, test_ds, save_dir, 0, tag="test")
    metrics_file = save_dir / "test_metrics.txt"
    with open(metrics_file, "w") as f:
        f.write(f"PSNR: {out['val_PSNR']}\n")
        f.write(f"SSIM: {out['val_SSIM']}\n")
        if "val_LPIPS" in out:
            f.write(f"LPIPS: {out['val_LPIPS']}\n")
    if not quiet:
        print(json.dumps(out))
    return out
