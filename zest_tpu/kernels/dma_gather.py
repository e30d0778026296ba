"""Pallas TPU kernel: random row gather as pipelined per-row DMAs.

The warped-sites octo-paired sampling (kernels/trilinear.py xla_path,
reference hot path /root/reference/utils.py:433-459) needs one 8C-wide row
per flow-warped point — 427k random rows of a ~2.7M-row table per flagship
step. XLA's row gather retires these at ~120 ns/row (latency/issue-bound;
rows are only 128-256 B, nowhere near bandwidth). This kernel instead has the
scalar core issue one async DMA per row with a bounded in-flight window —
the DMA engines overlap the HBM latency instead of serializing on it.

Correctness is index-exact (a row copy); the backward of a gather is a
row scatter-add, kept on the XLA path (TPU DMA cannot read-modify-write, and
colliding rows make manual RMW unsound) — see ``take_rows``.

Used as a drop-in for ``jnp.take(flat, idx, axis=0)`` on 2D tables whose row
width is a multiple of the minor tile; falls back to jnp.take off-TPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 128      # rows per grid step
NSEM = 16      # in-flight DMA window


def _gather_kernel(idx_ref, tab_ref, out_ref, sems):
    def start(i):
        r = idx_ref[0, 0, i]
        pltpu.make_async_copy(tab_ref.at[pl.ds(r, 1), :],
                              out_ref.at[pl.ds(i, 1), :],
                              sems.at[i % NSEM]).start()

    def wait(i):
        r = idx_ref[0, 0, i]
        pltpu.make_async_copy(tab_ref.at[pl.ds(r, 1), :],
                              out_ref.at[pl.ds(i, 1), :],
                              sems.at[i % NSEM]).wait()

    def prime(i, _):
        start(i)
        return 0

    jax.lax.fori_loop(0, NSEM, prime, 0)

    def rolled(i, _):
        wait(i)

        @pl.when(i + NSEM < BLK)
        def _():
            start(i + NSEM)

        return 0

    jax.lax.fori_loop(0, BLK, rolled, 0)


def _dma_gather_rows(tab, idx):
    """tab [M, CW]; idx [N] int32 (N a multiple of BLK, in-bounds)."""
    nb = idx.shape[0] // BLK
    # (nb, 1, BLK) with block (1, 1, BLK): Mosaic requires a block's last two
    # dims be (8k, 128k) or EQUAL to the array's — (1, BLK) vs a 2D (nb, BLK)
    # layout fails to lower on real TPUs (interpret mode accepts it)
    idx2 = idx.reshape(nb, 1, BLK)
    return pl.pallas_call(
        _gather_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 1, BLK), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((BLK, tab.shape[1]), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb * BLK, tab.shape[1]), tab.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA((NSEM,))],
        interpret=jax.default_backend() != "tpu",
    )(idx2, tab)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def take_rows(tab, idx):
    """``jnp.take(tab, idx, axis=0)`` with a DMA-pipelined forward gather.

    tab: [M, CW] (any dtype DMA understands; CW fixed per call).
    idx: [...] int32, assumed in [0, M).
    Backward: exact row scatter-add (XLA), identical to jnp.take's VJP.
    """
    out, _ = _take_rows_fwd(tab, idx)
    return out


def _take_rows_fwd(tab, idx):
    shape = idx.shape
    flat = idx.reshape(-1).astype(jnp.int32)
    n = flat.shape[0]
    np_ = -(-n // BLK) * BLK
    flat_p = jnp.pad(flat, (0, np_ - n))
    rows = _dma_gather_rows(tab, flat_p)[:n]
    return rows.reshape(shape + (tab.shape[1],)), (idx, tab.shape[0])


def _take_rows_bwd(res, g):
    idx, m = res
    flatg = g.reshape(-1, g.shape[-1])
    d_tab = jnp.zeros((m, g.shape[-1]), g.dtype).at[idx.reshape(-1)].add(flatg)
    return d_tab, None


take_rows.defvjp(_take_rows_fwd, _take_rows_bwd)
