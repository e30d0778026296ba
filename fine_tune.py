#!/usr/bin/env python
"""Fine-tuning entry point — same CLI surface as the reference ``fine_tune.py``.

Resumes ``last`` or warm-starts from ``--ckpt``; restricts the dataset to
``--finetune_scene`` and disables motion-mask extras (num_extra_samples=0).
Reference: /root/reference/fine_tune.py:21-102.
"""
from zest_tpu.config import config_parser
from zest_tpu.train_loop import run_training


def main():
    cfg = config_parser()
    cfg = cfg.replace(num_extra_samples=0)
    run_training(cfg)


if __name__ == "__main__":
    main()
