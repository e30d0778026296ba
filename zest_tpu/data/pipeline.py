"""Host-side input pipeline: background-thread prefetch with device transfer.

The distributed-input replacement for the reference's DataLoader(num_workers=4)
(train.py:303-310): a worker thread prepares the next sample dicts (disk IO, PIL
resize, normalization) and moves them to device while the TPU is busy with the
current step — the host never blocks training on IO.
"""
from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import jax
import numpy as np


def prefetch_to_device(dataset, order: Iterator[int], buffer_size: int = 2,
                       sharding=None):
    """Yield device-resident sample dicts, loading ahead in a worker thread.

    Args:
        dataset: indexable dataset of numpy sample dicts.
        order: iterator of sample indices (e.g. shuffled epochs).
        buffer_size: prefetch depth.
        sharding: optional jax.sharding.Sharding for device_put.
    """
    q: queue.Queue = queue.Queue(maxsize=buffer_size)
    stop = threading.Event()

    def worker():
        try:
            for idx in order:
                if stop.is_set():
                    return
                sample = dataset[int(idx)]
                arrs = {k: np.asarray(v) for k, v in sample.items()}
                if sharding is not None:
                    dev = {k: jax.device_put(v, sharding) for k, v in arrs.items()}
                else:
                    dev = {k: jax.device_put(v) for k, v in arrs.items()}
                q.put(dev)
        finally:
            q.put(None)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is None:
                return
            yield item
    finally:
        stop.set()


def epoch_order(n: int, epochs: int, seed: int = 0) -> Iterator[int]:
    """Shuffled index stream across epochs (reference: DataLoader(shuffle=True))."""
    rng = np.random.default_rng(seed)
    for _ in range(epochs):
        yield from rng.permutation(n)
