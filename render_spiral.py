#!/usr/bin/env python
"""Bullet-time / spiral render entry — same CLI surface as the reference
``render_spiral.py`` (loads --ckpt, renders the 60-pose wander path per frame).
Reference: /root/reference/render_spiral.py:19-62 + train.py:1167-1237.
"""
from zest_tpu.config import config_parser
from zest_tpu.render_paths import run_wanderpath


def main():
    cfg = config_parser()
    run_wanderpath(cfg)


if __name__ == "__main__":
    main()
