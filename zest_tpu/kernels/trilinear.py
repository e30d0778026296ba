"""Pallas TPU kernel: z-banded trilinear volume sampling as separable two-hot matmuls.

Replaces the XLA gather/scatter formulation of ``ops.grid_sample.grid_sample_3d``
for the per-ray-point encoding-volume lookup (reference ``index_point_feature``,
/root/reference/utils.py:433-459) — profiled at ~100 ms fwd + ~270 ms bwd-scatter
per step on a v5e (round-1 BENCH_NOTES).

Structure exploited: ray sample points are generated as ``z = linspace(near, far,
S) + in-bin jitter`` (sampling.depth_candidates), and the volume's z axis is the
same linear depth range — so all z taps of sample index ``s`` fall inside a narrow
static band of ``band`` consecutive depth slices starting at a per-``s`` offset
``zb[s]``. x/y taps are unstructured (random pixels), but trilinear interpolation
is separable, which turns the 2D part into MXU matmuls with small "two-hot"
interpolation matrices built in-registers from iota compares:

    per (sample s, chunk of 128 rays, band slice j):
      Y2[y, p]   = wy0(p)·1[y=y0(p)] + wy1(p)·1[y=y1(p)]        (two-hot, VPU)
      Mid_j      = Y2ᵀ @ vol[zb+j]          [128, Wv·C]          (MXU)
      A_j        = Mid_j · Xexp · wz_j                           (VPU)
      out       += A_j @ SelC               [128, C]             (MXU)

with ``Xexp[p, x·C+c] = wx0(p)·1[x=x0(p)] + wx1(p)·1[x=x1(p)]`` and ``SelC`` the
constant lane→channel selector. The backward is the exact adjoint (two transposed
matmuls per slice) accumulating a per-``s`` banded mini-volume flushed once per
``s``; an XLA epilogue segment-adds the S mini-volumes into d_vol — no scatter.

Correctness contract: any z tap outside [zb[s], zb[s]+band) is dropped by
construction. The wrapper therefore computes an ``ok`` predicate in the (fused,
cheap) XLA tap precompute and ``lax.cond``s to the exact XLA path whenever the
band assumption is violated — the kernel can never silently produce wrong values.

Coordinates are treated as non-differentiable (``stop_gradient``) — correct for
the UNWARPED sample sites this kernel is for (rays.ndc has no learnable inputs).
Scene-flow-warped sites (t±1, chain) need d/d-coords and stay on the XLA path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.grid_sample import grid_sample_3d

LANES = 128


# ---------------------------------------------------------------------------
# tap precomputation (XLA, fused elementwise)
# ---------------------------------------------------------------------------

def _precompute(ndc, D: int, Hv: int, Wv: int, band: int, derivs: bool = False):
    """Per-(sample, chunk) tap data from [R, S, 3] NDC coords in [0, 1].

    Returns:
        ints_l [S, NC, 2, 128] int32  (y0, y1)           — lanes layout
        flts_l [S, NC, 2, 128] f32    (wy0, wy1)
        ints_s [S, NC, 128, 4] int32  (x0, x1, z0, z1)   — sublanes layout
        flts_s [S, NC, 128, 4] f32    (wx0, wx1, wz0, wz1)
        zb     [S] int32              band start slice per sample index
        ok     [] bool                every nonzero-weight z tap is in-band
    and, when ``derivs``:
        dflts_l [S, NC, 2, 128] f32   (dwy0, dwy1)/d ndc_y  (scaled by Hv−1)
        dflts_s [S, NC, 128, 4] f32   (dwx0, dwx1, dwz0, dwz1)/d ndc_{x,z}
    """
    R, S, _ = ndc.shape
    NC = -(-R // LANES)
    Rp = NC * LANES
    p = jnp.moveaxis(ndc, 0, 1)                       # [S, R, 3]
    # pad rays to the chunk multiple with far-out-of-bounds points → all-zero
    # weights (grid_sample "zeros" semantics) → they contribute nothing
    p = jnp.pad(p, ((0, 0), (0, Rp - R), (0, 0)), constant_values=-10.0)

    def taps(v, n, scale):
        v0 = jnp.floor(v)
        f = v - v0
        m0 = (v0 >= 0) & (v0 <= n - 1)
        m1 = (v0 + 1 >= 0) & (v0 + 1 <= n - 1)
        w0 = jnp.where(m0, 1.0 - f, 0.0)
        w1 = jnp.where(m1, f, 0.0)
        i0 = jnp.clip(v0, 0, n - 1).astype(jnp.int32)
        i1 = jnp.clip(v0 + 1, 0, n - 1).astype(jnp.int32)
        # d w / d ndc-coordinate (where() grads as XLA autodiff would give them)
        dw0 = jnp.where(m0, -scale, 0.0)
        dw1 = jnp.where(m1, scale, 0.0)
        return i0, i1, w0, w1, dw0, dw1

    ix0, ix1, wx0, wx1, dwx0, dwx1 = taps(p[..., 0] * (Wv - 1), Wv, Wv - 1.0)
    iy0, iy1, wy0, wy1, dwy0, dwy1 = taps(p[..., 1] * (Hv - 1), Hv, Hv - 1.0)
    iz0, iz1, wz0, wz1, dwz0, dwz1 = taps(p[..., 2] * (D - 1), D, D - 1.0)

    lowz = jnp.minimum(jnp.where(wz0 > 0, iz0, D), jnp.where(wz1 > 0, iz1, D))
    zb = jnp.clip(jnp.min(lowz, axis=1), 0, max(D - band, 0)).astype(jnp.int32)
    zbb = zb[:, None]
    viol = (((wz0 > 0) & ((iz0 < zbb) | (iz0 >= zbb + band)))
            | ((wz1 > 0) & ((iz1 < zbb) | (iz1 >= zbb + band))))
    ok = ~jnp.any(viol)

    def lanes(*a):
        return jnp.stack([v.reshape(S, NC, LANES) for v in a], axis=2)

    def subl(*a):
        return jnp.stack([v.reshape(S, NC, LANES) for v in a], axis=-1)

    base = (lanes(iy0, iy1), lanes(wy0, wy1),
            subl(ix0, ix1, iz0, iz1), subl(wx0, wx1, wz0, wz1), zb, ok)
    if not derivs:
        return base
    return base + (lanes(dwy0, dwy1), subl(dwx0, dwx1, dwz0, dwz1))


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _two_hots(ints_l, flts_l, ints_s, flts_s, zbs, band, Hv, Wv, C):
    """Shared per-(s, chunk) interpolation factors.

    Returns Y2 [Hv, 128], Xexp [128, Wv·C], wz columns ([128, 1] per slice).
    """
    iy0 = ints_l[0, 0, 0][None, :]
    iy1 = ints_l[0, 0, 1][None, :]
    wy0 = flts_l[0, 0, 0][None, :]
    wy1 = flts_l[0, 0, 1][None, :]
    y_iota = jax.lax.broadcasted_iota(jnp.int32, (Hv, LANES), 0)
    Y2 = (jnp.where(y_iota == iy0, wy0, 0.0)
          + jnp.where(y_iota == iy1, wy1, 0.0))

    ix0 = ints_s[0, 0, :, 0][:, None]
    ix1 = ints_s[0, 0, :, 1][:, None]
    wx0 = flts_s[0, 0, :, 0][:, None]
    wx1 = flts_s[0, 0, :, 1][:, None]
    x_of_lane = jax.lax.broadcasted_iota(jnp.int32, (LANES, Wv * C), 1) // C
    Xexp = (jnp.where(x_of_lane == ix0, wx0, 0.0)
            + jnp.where(x_of_lane == ix1, wx1, 0.0))

    iz0 = ints_s[0, 0, :, 2][:, None]
    iz1 = ints_s[0, 0, :, 3][:, None]
    wz0 = flts_s[0, 0, :, 2][:, None]
    wz1 = flts_s[0, 0, :, 3][:, None]
    wz_cols = [jnp.where(iz0 - zbs == j, wz0, 0.0)
               + jnp.where(iz1 - zbs == j, wz1, 0.0) for j in range(band)]
    return Y2, Xexp, wz_cols


def _selc(Wv: int, C: int):
    """Constant lane→channel selector [Wv·C, C]."""
    lane_c = jax.lax.broadcasted_iota(jnp.int32, (Wv * C, C), 0) % C
    chan = jax.lax.broadcasted_iota(jnp.int32, (Wv * C, C), 1)
    return (lane_c == chan).astype(jnp.float32)


def _mm_dtype_prec(approx: bool):
    """MXU operand dtype/precision: 1-pass bf16 when the volume is bf16
    upstream (no information to preserve), 6-pass exact f32 otherwise."""
    if approx:
        return jnp.bfloat16, jax.lax.Precision.DEFAULT
    return jnp.float32, jax.lax.Precision.HIGHEST


def _fwd_kernel(zb_ref, *refs, band, Hv, Wv, C, approx):
    slice_refs = refs[:band]
    ints_l, flts_l, ints_s, flts_s = refs[band:band + 4]
    out_ref = refs[band + 4]
    s = pl.program_id(0)
    dt, prec = _mm_dtype_prec(approx)
    Y2, Xexp, wz_cols = _two_hots(ints_l[...], flts_l[...], ints_s[...],
                                  flts_s[...], zb_ref[s], band, Hv, Wv, C)
    Y2 = Y2.astype(dt)
    selc = _selc(Wv, C).astype(dt)
    acc = jnp.zeros((LANES, C), jnp.float32)
    for j in range(band):
        mid = jax.lax.dot_general(
            Y2, slice_refs[j][0].astype(dt), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec)                              # [128, Wv·C]
        a = mid * Xexp * wz_cols[j]
        acc = acc + jnp.dot(a.astype(dt), selc, preferred_element_type=jnp.float32,
                            precision=prec)
    out_ref[0, 0] = acc


def _bwd_kernel(zb_ref, *refs, band, Hv, Wv, C, approx):
    g_ref, ints_l, flts_l, ints_s, flts_s = refs[:5]
    out_ref = refs[5]
    s = pl.program_id(0)
    c = pl.program_id(1)
    dt, prec = _mm_dtype_prec(approx)

    @pl.when(c == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    Y2, Xexp, wz_cols = _two_hots(ints_l[...], flts_l[...], ints_s[...],
                                  flts_s[...], zb_ref[s], band, Hv, Wv, C)
    selc_t = _selc(Wv, C).T.astype(dt)                   # [C, Wv·C]
    g = g_ref[0, 0].astype(dt)                           # [128, C]
    d_a = jnp.dot(g, selc_t, preferred_element_type=jnp.float32,
                  precision=prec)                        # [128, Wv·C]
    for j in range(band):
        d_mid = d_a * Xexp * wz_cols[j]
        d_slice = jax.lax.dot_general(
            Y2.astype(dt), d_mid.astype(dt), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec)                              # [Hv, Wv·C]
        cur = out_ref[0, :, j * Wv * C:(j + 1) * Wv * C]
        out_ref[0, :, j * Wv * C:(j + 1) * Wv * C] = cur + d_slice


def _coords_kernel(zb_ref, *refs, band, Hv, Wv, C, approx):
    """d loss/d ndc for one (sample, chunk): three banded contractions.

    d out/d x swaps Xexp for its derivative two-hot (applied AFTER the shared
    Y2ᵀ@vol matmul); d/d z swaps the wz column; only d/d y needs a second
    matmul (dY2ᵀ@vol). Output rows: (dx, dy, dz, 0…) [LANES, 8].
    """
    slice_refs = refs[:band]
    (g_ref, ints_l, flts_l, dflts_l, ints_s, flts_s, dflts_s) = \
        refs[band:band + 7]
    out_ref = refs[band + 7]
    s = pl.program_id(0)
    dt, prec = _mm_dtype_prec(approx)
    Y2, Xexp, wz_cols = _two_hots(ints_l[...], flts_l[...], ints_s[...],
                                  flts_s[...], zb_ref[s], band, Hv, Wv, C)
    dY2, dXexp, dwz_cols = _two_hots(ints_l[...], dflts_l[...], ints_s[...],
                                     dflts_s[...], zb_ref[s], band, Hv, Wv, C)
    selc_t = _selc(Wv, C).T.astype(dt)
    g = g_ref[0, 0].astype(dt)                           # [128, C]
    G = jnp.dot(g, selc_t, preferred_element_type=jnp.float32,
                precision=prec)                          # [128, Wv·C]
    dx = jnp.zeros((LANES, 1), jnp.float32)
    dy = jnp.zeros((LANES, 1), jnp.float32)
    dz = jnp.zeros((LANES, 1), jnp.float32)
    for j in range(band):
        mid = jax.lax.dot_general(
            Y2.astype(dt), slice_refs[j][0].astype(dt), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        dmid = jax.lax.dot_general(
            dY2.astype(dt), slice_refs[j][0].astype(dt), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        t1 = mid * G
        dx = dx + jnp.sum(t1 * dXexp, axis=1, keepdims=True) * wz_cols[j]
        dz = dz + jnp.sum(t1 * Xexp, axis=1, keepdims=True) * dwz_cols[j]
        dy = dy + jnp.sum(dmid * G * Xexp, axis=1, keepdims=True) * wz_cols[j]
    out_ref[0, 0] = jnp.concatenate(
        [dx, dy, dz, jnp.zeros((LANES, 5), jnp.float32)], axis=1)


# ---------------------------------------------------------------------------
# pallas_call wrappers + custom VJP
# ---------------------------------------------------------------------------

def _interp() -> bool:
    return jax.default_backend() != "tpu"


def _fwd_pallas(volR, ints_l, flts_l, ints_s, flts_s, zb, dims):
    D, Hv, Wv, C, band, S, NC, approx = dims[:8]
    kern = functools.partial(_fwd_kernel, band=band, Hv=Hv, Wv=Wv, C=C,
                             approx=approx)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(S, NC),
        in_specs=[
            *[pl.BlockSpec((1, Hv, Wv * C),
                           functools.partial(
                               lambda s, c, zb_ref, j=j: (zb_ref[s] + j, 0, 0)))
              for j in range(band)],
            pl.BlockSpec((1, 1, 2, LANES), lambda s, c, zb_ref: (s, c, 0, 0)),
            pl.BlockSpec((1, 1, 2, LANES), lambda s, c, zb_ref: (s, c, 0, 0)),
            pl.BlockSpec((1, 1, LANES, 4), lambda s, c, zb_ref: (s, c, 0, 0)),
            pl.BlockSpec((1, 1, LANES, 4), lambda s, c, zb_ref: (s, c, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, LANES, C),
                               lambda s, c, zb_ref: (s, c, 0, 0)),
    )
    return pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((S, NC, LANES, C), jnp.float32),
        interpret=_interp(),
    )(zb, *([volR] * band), ints_l, flts_l, ints_s, flts_s)


def _bwd_pallas(g, ints_l, flts_l, ints_s, flts_s, zb, dims):
    D, Hv, Wv, C, band, S, NC, approx = dims[:8]
    kern = functools.partial(_bwd_kernel, band=band, Hv=Hv, Wv=Wv, C=C,
                             approx=approx)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(S, NC),
        in_specs=[
            pl.BlockSpec((1, 1, LANES, C), lambda s, c, zb_ref: (s, c, 0, 0)),
            pl.BlockSpec((1, 1, 2, LANES), lambda s, c, zb_ref: (s, c, 0, 0)),
            pl.BlockSpec((1, 1, 2, LANES), lambda s, c, zb_ref: (s, c, 0, 0)),
            pl.BlockSpec((1, 1, LANES, 4), lambda s, c, zb_ref: (s, c, 0, 0)),
            pl.BlockSpec((1, 1, LANES, 4), lambda s, c, zb_ref: (s, c, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, Hv, band * Wv * C),
                               lambda s, c, zb_ref: (s, 0, 0)),
    )
    mini = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((S, Hv, band * Wv * C), jnp.float32),
        interpret=_interp(),
    )(zb, g, ints_l, flts_l, ints_s, flts_s)
    # segment-add the per-sample banded mini-volumes into d_vol as a ONE-HOT
    # MATMUL over the tiny (D x S·band) index structure. The round-2 form
    # (`at[idx].add`) lowered to a ~1000-iteration serial while/dynamic-update-
    # slice chain on TPU (~50 ms/step in the round-3 profile); the one-hot
    # contraction is ~44 GFLOP of MXU work instead.
    mini = mini.reshape(S, Hv, band, Wv * C).transpose(0, 2, 1, 3)
    idx = (zb[:, None] + jnp.arange(band)[None, :]).reshape(-1)  # [S·band]
    onehot = (jnp.arange(D)[:, None] == idx[None, :])
    mini2 = mini.reshape(S * band, Hv * Wv * C)
    if approx:
        # bf16 mini rounding matches the bf16 d_vol the caller casts to anyway
        d = jnp.dot(onehot.astype(jnp.bfloat16), mini2.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
    else:
        d = jnp.dot(onehot.astype(jnp.float32), mini2,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    return d.reshape(D, Hv, Wv * C)


def _coords_pallas(g, volR, ints_l, flts_l, dflts_l, ints_s, flts_s, dflts_s,
                   zb, dims):
    """d loss/d (scaled, padded) coords: [S, NC, LANES, 3]."""
    D, Hv, Wv, C, band, S, NC, approx = dims[:8]
    kern = functools.partial(_coords_kernel, band=band, Hv=Hv, Wv=Wv, C=C,
                             approx=approx)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(S, NC),
        in_specs=[
            *[pl.BlockSpec((1, Hv, Wv * C),
                           functools.partial(
                               lambda s, c, zb_ref, j=j: (zb_ref[s] + j, 0, 0)))
              for j in range(band)],
            pl.BlockSpec((1, 1, LANES, C), lambda s, c, zb_ref: (s, c, 0, 0)),
            pl.BlockSpec((1, 1, 2, LANES), lambda s, c, zb_ref: (s, c, 0, 0)),
            pl.BlockSpec((1, 1, 2, LANES), lambda s, c, zb_ref: (s, c, 0, 0)),
            pl.BlockSpec((1, 1, 2, LANES), lambda s, c, zb_ref: (s, c, 0, 0)),
            pl.BlockSpec((1, 1, LANES, 4), lambda s, c, zb_ref: (s, c, 0, 0)),
            pl.BlockSpec((1, 1, LANES, 4), lambda s, c, zb_ref: (s, c, 0, 0)),
            pl.BlockSpec((1, 1, LANES, 4), lambda s, c, zb_ref: (s, c, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, LANES, 8),
                               lambda s, c, zb_ref: (s, c, 0, 0)),
    )
    out = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((S, NC, LANES, 8), jnp.float32),
        interpret=_interp(),
    )(zb, *([volR] * band), g, ints_l, flts_l, dflts_l, ints_s, flts_s, dflts_s)
    return out[..., :3]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _core(dims, volR, ints_l, flts_l, ints_s, flts_s, zb):
    return _fwd_pallas(volR, ints_l, flts_l, ints_s, flts_s, zb, dims)


def _core_fwd(dims, volR, ints_l, flts_l, ints_s, flts_s, zb):
    out = _fwd_pallas(volR, ints_l, flts_l, ints_s, flts_s, zb, dims)
    return out, (ints_l, flts_l, ints_s, flts_s, zb)


def _core_bwd(dims, res, g):
    ints_l, flts_l, ints_s, flts_s, zb = res
    d_volR = _bwd_pallas(g, ints_l, flts_l, ints_s, flts_s, zb, dims)
    # primal volR dtype is bf16 exactly in approx mode (see kern_path)
    vol_dt = jnp.bfloat16 if dims[7] else jnp.float32
    return d_volR.astype(vol_dt), None, None, None, None, None


_core.defvjp(_core_fwd, _core_bwd)


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def sample_volume_zbanded(vol, ndc, band: int = 3, approx=None):
    """Trilinear volume sampling for z-banded points (unwarped ray samples).

    Exactly ``grid_sample_3d(vol, ndc*2-1, "zeros")`` when every z tap of sample
    index s falls in [zb[s], zb[s]+band) — guaranteed by the linspace+jitter
    depth construction when the target and reference views share near/far (NSFF
    does). When violated (checked at runtime), lax.cond falls back to the exact
    XLA path, so results are ALWAYS correct.

    Coordinates are stop_gradient'ed: use only where ndc carries no learnable
    inputs (use ``sample_volume_zbanded_diff`` for scene-flow-warped points).

    Args:
        vol: [D, Hv, Wv, C]; ndc: [R, S, 3] in [0, 1].
    Returns: [R, S, C] float32.
    """
    D, Hv, Wv, C = vol.shape
    R, S, _ = ndc.shape
    ndc = jax.lax.stop_gradient(ndc)
    band = min(band, D)
    ints_l, flts_l, ints_s, flts_s, zb, ok = _precompute(ndc, D, Hv, Wv, band)
    NC = -(-R // LANES)
    if approx is None:
        approx = vol.dtype == jnp.bfloat16
    dims = (D, Hv, Wv, C, band, S, NC, bool(approx))

    def kern_path(vol):
        # approx mode streams the volume in bf16 — halves the per-slice VMEM
        # double-buffers and HBM traffic; the matmuls cast to bf16 anyway
        volR = vol.astype(jnp.bfloat16 if approx else jnp.float32) \
            .reshape(D, Hv, Wv * C)
        out = _core(dims, volR, ints_l, flts_l, ints_s, flts_s, zb)
        return jnp.moveaxis(out.reshape(S, NC * LANES, C), 0, 1)[:R]

    def xla_path(vol):
        return grid_sample_3d(vol, ndc * 2.0 - 1.0,
                              padding_mode="zeros").astype(jnp.float32)

    return jax.lax.cond(ok, kern_path, xla_path, vol)


# ---------------------------------------------------------------------------
# coordinate-differentiable variant (scene-flow-warped sample sites)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _core_d(dims, volR, ndc):
    out, _ = _core_d_fwd(dims, volR, ndc)
    return out


def _core_d_fwd(dims, volR, ndc):
    D, Hv, Wv, C, band, S, NC, approx = dims[:8]
    (ints_l, flts_l, ints_s, flts_s, zb, _ok,
     dflts_l, dflts_s) = _precompute(ndc, D, Hv, Wv, band, derivs=True)
    out = _fwd_pallas(volR, ints_l, flts_l, ints_s, flts_s, zb, dims)
    res = (volR, ints_l, flts_l, dflts_l, ints_s, flts_s, dflts_s, zb)
    return out, res


def _core_d_bwd(dims, res, g):
    D, Hv, Wv, C, band, S, NC, approx, R = dims
    volR, ints_l, flts_l, dflts_l, ints_s, flts_s, dflts_s, zb = res
    d_volR = _bwd_pallas(g, ints_l, flts_l, ints_s, flts_s, zb, dims)
    d_sc = _coords_pallas(g, volR, ints_l, flts_l, dflts_l, ints_s, flts_s,
                          dflts_s, zb, dims)                # [S, NC, LANES, 3]
    d_ndc = jnp.moveaxis(d_sc.reshape(S, NC * LANES, 3), 0, 1)[:R]
    return d_volR.astype(volR.dtype), d_ndc


_core_d.defvjp(_core_d_fwd, _core_d_bwd)


def prepare_warped_paired(vol, approx=None):
    """Build the octo-paired super-volume ONCE for a volume that will be
    sampled several times per step at flow-warped sites (t±1 + chain passes).

    Pass the result as ``paired=`` to every ``sample_volume_zbanded_diff`` call
    on the same volume: each build is ~350 MB of HBM traffic, and without
    hoisting it is repeated inside every call's lax.cond body (where XLA
    cannot CSE across conds). The cast here must match the xla_path cast.
    """
    from ..ops.grid_sample import paired_volume
    if approx is None:
        approx = vol.dtype == jnp.bfloat16
    return paired_volume(vol.astype(jnp.bfloat16) if approx else vol)


def sample_volume_zbanded_diff(vol, ndc, band: int = 6, approx=None,
                               paired=None):
    """Like ``sample_volume_zbanded`` but differentiable w.r.t. ``ndc`` too —
    for scene-flow-WARPED sample sites (renderer.py:462-507), whose coordinates
    carry flow gradients. The backward computes d/d vol with the adjoint kernel
    and d/d ndc with three banded contractions that share the Y2ᵀ@vol matmul.

    Flow displacements widen the per-sample z spread, so the default band is
    wider; the runtime ``ok`` predicate still lax.cond's to the exact XLA path
    whenever the band assumption is violated — results are ALWAYS correct, the
    kernel is purely a fast path.

    Measured caveat (round 3, tools/probe_trained_flow.py): with the
    reference's init the tanh flow heads SATURATE — after 3000 flagship steps
    |sf_z| is bimodal (p50 ≈ 0.002 but p99 ≈ 0.96), and since ``ok`` is an
    all-points predicate one saturated outlier keeps the fallback selected.
    Real training therefore runs the (octo-paired, optimized) XLA fallback
    essentially always; the kernel branch engages only for checkpoints whose
    flows are globally confined (verified by tools/bench_trained_regime.py).
    """
    D, Hv, Wv, C = vol.shape
    R, S, _ = ndc.shape
    band = min(band, D)
    # ok-check on value-level taps (cheap, fused); taps are recomputed inside
    # the custom_vjp so the vjp closes over ndc itself
    *_unused, zb0, ok = _precompute(jax.lax.stop_gradient(ndc), D, Hv, Wv, band)
    NC = -(-R // LANES)
    if approx is None:
        approx = vol.dtype == jnp.bfloat16
    dims = (D, Hv, Wv, C, band, S, NC, bool(approx), R)

    def kern_path(operands):
        vol, ndc = operands[0], operands[1]
        volR = vol.astype(jnp.bfloat16 if approx else jnp.float32) \
            .reshape(D, Hv, Wv * C)
        out = _core_d(dims, volR, ndc)
        return jnp.moveaxis(out.reshape(S, NC * LANES, C), 0, 1)[:R]

    def xla_path(operands):
        vol, ndc = operands[0], operands[1]
        # octo-paired wide-row gather (ops/grid_sample.grid_sample_3d_paired):
        # one 8C-wide gather per point instead of 8 C-wide — measured 306 →
        # 133 ms fwd+bwd for the flagship's 427k warped sites (bit-exact).
        # approx: gather AND the autodiff scatter-add (d_vol) run in bf16 —
        # matches the kernel path's bf16 matmuls. When the caller did not
        # hoist a shared build, the ~350 MB paired-volume build lives INSIDE
        # this cond body so the kernel-engaged branch never pays for it
        # (ADVICE r3 #2); a caller-hoisted `paired` rides in as an operand.
        from ..ops.grid_sample import grid_sample_3d_paired
        v = vol.astype(jnp.bfloat16) if approx else vol
        p = operands[2] if len(operands) == 3 else None
        return grid_sample_3d_paired(v, ndc * 2.0 - 1.0,
                                     paired=p).astype(jnp.float32)

    operands = (vol, ndc) if paired is None else (vol, ndc, paired)
    return jax.lax.cond(ok, kern_path, xla_path, operands)
