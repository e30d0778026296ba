"""Module-level performance toggles (trace-time, not part of ZestConfig).

These gate kernel fast paths that are numerically identical to their XLA
fallbacks — they exist so a backend regression can be disabled with one line
(or an env var) without touching the config surface that mirrors the
reference CLI.
"""
import os


def _env_bool(name: str, default: bool) -> bool:
    v = os.environ.get(name)
    if v is None:
        return default
    return v.lower() not in ("0", "false", "no", "off")


# DMA-pipelined row gather for the octo-paired warped-sites sampling
# (kernels/dma_gather.py). Identical values/VJP to jnp.take. Default OFF:
# the kernel is interpret-mode-verified but its real-chip Mosaic lowering
# has not been exercised yet (tunnel outage) — enable for the A/B with
# ZEST_DMA_ROW_GATHER=1, flip the default once validated.
DMA_ROW_GATHER = _env_bool("ZEST_DMA_ROW_GATHER", False)
