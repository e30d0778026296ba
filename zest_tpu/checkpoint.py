"""Checkpoint/resume: orbax-backed, reference-compatible retention semantics.

Equivalent of the reference's PL ModelCheckpoint config (train.py:1289-1295):
monitor val_loss (min), keep top-5 + always a ``last`` checkpoint; training
auto-resumes from ``<save_dir>/<expname>/ckpts/last`` when present
(train.py:1317-1321). Checkpoints carry the config dict so eval entry points can
restore with overrides (test.py:56 ``load_from_checkpoint(strict=False, **kw)``).
"""
from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any, Optional

import numpy as np

from .config import ZestConfig

try:
    import orbax.checkpoint as ocp
    _HAVE_ORBAX = True
except Exception:  # pragma: no cover - orbax is baked into the image
    _HAVE_ORBAX = False


class CheckpointManager:
    """top-k-by-val-loss + last retention over {params, opt_state, step}."""

    def __init__(self, ckpt_dir, cfg: Optional[ZestConfig] = None, top_k: int = 5):
        self.dir = Path(ckpt_dir).absolute()
        self.dir.mkdir(parents=True, exist_ok=True)
        self.top_k = top_k
        if cfg is not None:
            (self.dir / "config.json").write_text(
                json.dumps(dataclasses.asdict(cfg), indent=1))
        self._ckptr = ocp.StandardCheckpointer() if _HAVE_ORBAX else None
        self._scores_path = self.dir / "scores.json"

    # ------------------------------------------------------------------
    def _write(self, name: str, state_dict):
        path = self.dir / name
        if self._ckptr is not None:
            if path.exists():
                import shutil
                shutil.rmtree(path)
            self._ckptr.save(path, state_dict)
            self._ckptr.wait_until_finished()
        else:  # npz fallback
            import jax
            flat, _ = jax.tree_util.tree_flatten_with_path(state_dict)
            arrs = {"/".join(str(k) for k in p): np.asarray(v) for p, v in flat}
            np.savez(str(path) + ".npz", **arrs)

    def save_last(self, state_dict):
        self._write("last", state_dict)

    def save_topk(self, state_dict, val_loss: float, step: int):
        """Save a monitored checkpoint; prune beyond top_k by val_loss (min)."""
        scores = {}
        if self._scores_path.exists():
            scores = json.loads(self._scores_path.read_text())
        name = f"step{step:08d}-val{val_loss:.3f}"
        self._write(name, state_dict)
        scores[name] = val_loss
        ranked = sorted(scores.items(), key=lambda kv: kv[1])
        for name_, _ in ranked[self.top_k:]:
            scores.pop(name_, None)
            victim = self.dir / name_
            if victim.exists():
                import shutil
                shutil.rmtree(victim, ignore_errors=True)
            npz = Path(str(victim) + ".npz")
            if npz.exists():
                npz.unlink()
        self._scores_path.write_text(json.dumps(scores, indent=1))

    # ------------------------------------------------------------------
    def restore(self, name: str, target):
        """Restore a checkpoint into the structure of ``target`` (abstract ok)."""
        path = self.dir / name
        if self._ckptr is not None and path.exists():
            return self._ckptr.restore(path, target)
        npz = Path(str(path) + ".npz")
        if npz.exists():
            import jax
            data = np.load(npz)
            flat, treedef = jax.tree_util.tree_flatten_with_path(target)
            out = [data["/".join(str(k) for k in p)] for p, _ in flat]
            return jax.tree_util.tree_unflatten(treedef, out)
        raise FileNotFoundError(path)

    def has_last(self) -> bool:
        return (self.dir / "last").exists() or (self.dir / "last.npz").exists()

    @staticmethod
    def load_config(ckpt_dir) -> Optional[ZestConfig]:
        p = Path(ckpt_dir) / "config.json"
        if not p.exists():
            return None
        return ZestConfig(**json.loads(p.read_text()))
