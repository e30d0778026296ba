#!/usr/bin/env python
"""Training entry point — same CLI surface as the reference ``train.py``.

``python train.py --config configs/config_files/config_zest_nsff_cross1.txt``
Reference: /root/reference/train.py:1276-1349 (main).
"""
from zest_tpu.config import config_parser
from zest_tpu.train_loop import run_training


def main():
    cfg = config_parser()
    run_training(cfg)


if __name__ == "__main__":
    main()
