#!/usr/bin/env python
"""Evaluation entry point — same CLI surface as the reference ``test.py``.

Loads ``--ckpt``, renders the test split full-image, writes
``<save_dir>/<expname>/test_metrics.txt`` (PSNR/SSIM/LPIPS).
Reference: /root/reference/test.py:33-76.
"""
from zest_tpu.config import config_parser
from zest_tpu.train_loop import run_test


def main():
    cfg = config_parser()
    if cfg.render_wanderpath:
        from zest_tpu.render_paths import run_wanderpath
        run_wanderpath(cfg)
    else:
        run_test(cfg)


if __name__ == "__main__":
    main()
