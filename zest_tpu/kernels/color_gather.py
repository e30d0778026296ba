"""Pallas TPU kernel: y-banded bilinear image gather for color features.

``render.build_color_features`` bilinear-samples every source view at every
ray point (reference build_color_volume, /root/reference/utils.py:461-505).
At FULL-IMAGE EVAL this dominates wall-clock: 11 views x 19M points of
unstructured 2-D gathers measured ~6.1 s of the 8.2 s per-image render —
TPUs have no fast gather.

Structure exploited: the eval ray batch is a CONTIGUOUS pixel chunk rendered
at a shared per-sample depth (sampling.sample_pixels_grid), so 128 consecutive
points of one sample index project into a source view along (nearly) one image
row — a narrow static band of ``band`` rows. Like the plane-sweep warp kernel,
the gather then factorizes into an MXU matmul with a horizontal two-hot matrix
plus a vertical two-hot weighted sum:

    per chunk of 128 points:
      mid[(c,b), p] = img[c, rb:rb+B, :].reshape(C·B, W) @ X2[W, p]   (MXU)
      out[c, p]     = Σ_b mid[(c,b), p] · vy[b, p]                    (VPU)

Border-padding semantics (grid_sample_2d(padding_mode="border")) are exact:
indices clamp to the edge and no weight is zeroed.

A runtime ``ok`` predicate checks the band assumption per call and lax.cond's
to the exact XLA path otherwise (always for TRAIN's random-pixel batches —
their per-chunk row spread is unbounded; the XLA path is only ~31 ms there).
The backward (rarely needed — images are batch inputs) delegates to the XLA
formulation's autodiff.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.grid_sample import grid_sample_2d

LANES = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _precompute(xy, H: int, W: int, band: int, group: int = 1):
    """Border-mode tap data from pixel coords [N, 2] (x, y in pixels).

    ``group`` packs that many 128-point groups into ONE grid step sharing a
    single row band (eval's s_major layout: consecutive groups are adjacent
    pixels of the same image rows, so the union span grows by only ~2 rows
    per doubling — measured G=4:9, G=8:11, G=16:13 at flagship geometry).

    Returns ints [NB, 5, group*128] (c0, c1, r0, r1, rb), flts
    [NB, 4, group*128] (wx0..wy1), and the band-validity predicate.
    """
    N = xy.shape[0]
    L = LANES * group
    NC = -(-N // L)
    pad = NC * L - N
    # edge-replicate padding: zero-padded points would sit at pixel (0,0) and
    # drag the last chunk's row band to 0, failing the ok-check spuriously
    xy = jnp.pad(xy, ((0, pad), (0, 0)), mode="edge")

    def taps(v, n):
        v0 = jnp.floor(v)
        f = v - v0
        i0 = jnp.clip(v0, 0, n - 1).astype(jnp.int32)
        i1 = jnp.clip(v0 + 1, 0, n - 1).astype(jnp.int32)
        # border mode: weights NEVER zeroed; clamped taps replicate the edge
        return i0, i1, 1.0 - f, f

    c0, c1, wx0, wx1 = taps(xy[:, 0], W)
    r0, r1, wy0, wy1 = taps(xy[:, 1], H)

    def chunk(a):
        return a.reshape(NC, L)

    r0c, r1c = chunk(r0), chunk(r1)
    # rb aligned DOWN to a sublane multiple: Mosaic requires dynamic-slice row
    # starts provably 8-aligned (see pl.multiple_of in the kernel); costs ≤7
    # rows of band budget
    rb = jnp.clip((jnp.min(r0c, axis=-1) // 8) * 8, 0,
                  max(((H - band) // 8) * 8, 0)).astype(jnp.int32)
    rbb = rb[:, None]
    ok = ~jnp.any((r0c < rbb) | (r1c >= rbb + band))
    ints = jnp.stack([chunk(c0), chunk(c1), r0c, r1c,
                      jnp.broadcast_to(rbb, r0c.shape)], 1).astype(jnp.int32)
    flts = jnp.stack([chunk(wx0), chunk(wx1), chunk(wy0), chunk(wy1)], 1)
    return ints, flts, ok


def _kernel(ints_ref, flts_ref, img_ref, out_ref, *, band, h, w, approx,
            lanes):
    C = img_ref.shape[0]
    rb = pl.multiple_of(ints_ref[0, 4, 0], 8)   # aligned in _precompute
    c0 = ints_ref[0, 0][None]
    c1 = ints_ref[0, 1][None]
    r0 = ints_ref[0, 2][None]
    r1 = ints_ref[0, 3][None]
    wx0 = flts_ref[0, 0][None]
    wx1 = flts_ref[0, 1][None]
    wy0 = flts_ref[0, 2][None]
    wy1 = flts_ref[0, 3][None]

    c_idx = jax.lax.broadcasted_iota(jnp.int32, (w, lanes), 0)
    # border mode can clamp both x taps to the same column — ADD the weights
    X2 = (jnp.where(c_idx == c0, wx0, 0.0)
          + jnp.where(c_idx == c1, wx1, 0.0))
    b_idx = jax.lax.broadcasted_iota(jnp.int32, (band, lanes), 0) + rb
    vy = (jnp.where(b_idx == r0, wy0, 0.0)
          + jnp.where(b_idx == r1, wy1, 0.0))

    if approx:
        dt, prec = jnp.bfloat16, jax.lax.Precision.DEFAULT
    else:
        dt, prec = jnp.float32, jax.lax.Precision.HIGHEST
    rows = img_ref[:, pl.ds(rb, band), :]               # [C, B, w]
    mid = jnp.dot(rows.reshape(C * band, w).astype(dt), X2.astype(dt),
                  preferred_element_type=jnp.float32,
                  precision=prec)                       # [C·B, lanes]
    out_ref[0] = jnp.sum(mid.reshape(C, band, lanes) * vy[None], axis=1)


def _edge_case_note():
    """Clamped-tap double counting: when x (or y) clamps BOTH taps to the same
    index (outside the image), X2/vy ADD the two weights — (1−f) + f = 1 —
    which is exactly the border-replicate value. Interior points have distinct
    taps. No special-casing needed."""


def _gather_pallas(img_cm, ints, flts, band, approx):
    C, h, w = img_cm.shape
    NC, _, L = ints.shape
    kern = functools.partial(_kernel, band=band, h=h, w=w, approx=approx,
                             lanes=L)
    return pl.pallas_call(
        kern,
        grid=(NC,),
        in_specs=[
            pl.BlockSpec((1, 5, L), lambda t: (t, 0, 0)),
            pl.BlockSpec((1, 4, L), lambda t: (t, 0, 0)),
            pl.BlockSpec((C, h, w), lambda t: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, C, L), lambda t: (t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((NC, C, L), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(ints, flts, img_cm)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _core(img, xy, band, approx, group):
    return _core_fwd(img, xy, band, approx, group)[0]


def _xla_ref(img, xy):
    H, W, _ = img.shape
    grid = xy / jnp.array([(W - 1) * 0.5, (H - 1) * 0.5], jnp.float32) - 1.0
    return grid_sample_2d(img, grid[None], padding_mode="border")[0] \
        .astype(jnp.float32)


def _core_fwd(img, xy, band, approx, group):
    H, W, C = img.shape
    N = xy.shape[0]
    ints, flts, _ = _precompute(jax.lax.stop_gradient(xy), H, W, band, group)
    Cp = _round_up(C, 8)
    img_cm = jnp.moveaxis(
        img.astype(jnp.bfloat16 if approx else jnp.float32), -1, 0)
    img_cm = jnp.pad(img_cm, ((0, Cp - C), (0, 0), (0, 0)))
    out = _gather_pallas(img_cm, ints, flts, band, approx)  # [NB, Cp, G·128]
    out = jnp.moveaxis(out, 1, 2).reshape(-1, Cp)[:N, :C]
    return out, (img, xy)


def _core_bwd(band, approx, group, res, g):
    # images are batch inputs — this path is normally DCE'd; delegate to the
    # exact XLA formulation's autodiff when something does want d/d img
    img, xy = res
    _, vjp = jax.vjp(lambda im: _xla_ref(im, xy), img)
    return vjp(g)[0], None


_core.defvjp(lambda i, x, b, a, g: _core_fwd(i, x, b, a, g), _core_bwd)


def gather_colors_banded(img, xy, band: int = 16, approx: bool = False,
                         group: int = 1):
    """Bilinear border-mode image sampling at pixel coords — banded fast path.

    Exactly ``grid_sample_2d(img, xy_normalized, "border")`` when each chunk of
    ``group``*128 consecutive points spans < ``band`` image rows (true for
    eval's contiguous-pixel batches); verified at runtime with an exact XLA
    fallback (taken for training's random-pixel batches). ``group`` > 1 packs
    that many 128-pt groups into one grid step sharing a band — the G=1 kernel
    was per-step issue-bound at eval (~15% MXU); G=4 is FLOP-neutral at
    band=16 with 4x fewer steps (BENCH_NOTES round 5).

    Args: img [H, W, C]; xy [N, 2] pixel coords. Returns [N, C] f32.

    Coordinate-gradient contract: ``xy`` is NON-DIFFERENTIABLE here — it is
    stop_gradient'ed so BOTH the kernel path (whose VJP returns None for xy)
    and the XLA fallback produce identical (zero) coordinate cotangents. Every
    call site passes ray/camera-derived pixel coords, which carry no gradient
    anyway. For flow-warped (differentiable) coordinates use the trilinear
    ``_diff`` kernel pattern instead — do NOT reuse this gather.
    """
    H, W, C = img.shape
    xy = jax.lax.stop_gradient(xy)
    band = min(_round_up(max(band, 1), 8), H)
    *_pre, ok = _precompute(jax.lax.stop_gradient(xy), H, W, band, group)

    def kern_path(operands):
        img, xy = operands
        return _core(img, xy, band, approx, group)

    def xla_path(operands):
        img, xy = operands
        return _xla_ref(img, xy)

    return jax.lax.cond(ok, kern_path, xla_path, (img, xy))
