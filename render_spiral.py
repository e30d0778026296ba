#!/usr/bin/env python
"""Bullet-time / spiral render entry — same CLI surface as the reference
``render_spiral.py`` (loads --ckpt, renders novel-view paths).
Reference: /root/reference/render_spiral.py:19-62 + train.py:1167-1237.

Path selection via --render_path:
  auto    (default) wanderpath for nsff/synthetic, spiral for llff
  wander  60-pose bullet-time orbit per frame (frames 20-51, data/nsff.py:169)
  spiral  LLFF forward-facing spiral (data/llff.py:99-129)
  spheric LLFF 360 spheric path (data/llff.py:132-170)
"""
from zest_tpu.config import config_parser
from zest_tpu.render_paths import run_llff_spiral, run_wanderpath


def main():
    cfg = config_parser()
    kind = cfg.render_path
    if kind == "auto":
        kind = "spiral" if cfg.dataset_name == "llff" else "wander"
    if kind == "wander":
        run_wanderpath(cfg)
    elif kind == "spiral":
        run_llff_spiral(cfg, spheric=False)
    elif kind == "spheric":
        run_llff_spiral(cfg, spheric=True)
    else:
        raise SystemExit(f"unknown --render_path {kind!r}")


if __name__ == "__main__":
    main()
