"""A/B probe: plane-sweep warp kernel fwd/bwd formulations (real chip).

The round-4 ablation charges ~27.8 ms/step to the warp adjoint kernel alone
(step_fakewarpbwd row) across the step's 4 warp calls (2 encoders x 2 source
views). Both kernels dynamic-slice the source band at an UNALIGNED sublane
offset rb (`src_ref[:, pl.ds(rb, band), :]`), and the backward additionally
read-modify-writes that band slab per chunk, serializing all 42 chunks x 128
planes on one accumulator. Candidates, at flagship shapes
(src [32, 72, 128], D=128 planes, pad=24 -> 120x176 grid, group=4):

  base       — shipped kernels as-is
  aligned    — rb rounded down to the 8-sublane grain (band +8 to keep
               coverage): dynamic slices land on sublane-tile boundaries
  slot2      — backward accumulates into 2 parity slots (chunk k -> slot k&1),
               halving the RMW dependency chain; slots summed outside

Timing: iterations chained on-device, one value fetch per window (tunnel
defers + memoizes; CLAUDE.md rules).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/probe_warp_bwd.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from zest_tpu.kernels import plane_sweep as ps  # noqa: E402

H, W, C = 72, 128, 32
PAD = 24
D = 128
GROUP = 4
GP = GROUP * 128
STEPS = 30


def make_taps(band):
    """Realistic homography taps: small rotation + depth-dependent shift."""
    th = 0.05
    R = np.array([[np.cos(th), -np.sin(th), 0.0],
                  [np.sin(th), np.cos(th), 0.0],
                  [0.0, 0.0, 1.0]], np.float32)
    T = np.array([40.0, 25.0, 0.0], np.float32)
    proj = jnp.asarray(np.concatenate([R, T[:, None]], 1))
    depths = jnp.linspace(2.5, 10.0, D)
    grid = ps.homography_grid(proj, depths, (H, W), pad=PAD)
    need = int(jax.jit(ps.required_band, static_argnums=(1, 2, 3))(
        grid, H, W, GP))
    assert need <= band, (need, band)
    ints, flts, nc = jax.jit(
        ps._precompute_taps, static_argnums=(1, 2, 3, 4))(grid, H, W, band, GP)
    print(f"required_band={need} band={band} nc={nc}", flush=True)
    return np.asarray(ints), np.asarray(flts), nc


def align_ints(ints, band_al):
    """rb -> 8-aligned (band grown to band_al to keep tap coverage)."""
    out = ints.copy()
    rb = (ints[:, :, 4, :] // 8) * 8
    out[:, :, 4, :] = np.clip(rb, 0, max(H - band_al, 0))
    return out


def _bwd_kernel_slot2(g_ref, ints_ref, flts_ref, dsrc_ref, *, band, h, w,
                      approx):
    Cc = g_ref.shape[2]
    NC, _, gp = ints_ref.shape[1:]
    d = pl.program_id(0)
    dt, prec = ps._mm_dtype_prec(approx)

    @pl.when(d == 0)
    def _():
        dsrc_ref[...] = jnp.zeros_like(dsrc_ref)

    def body(k, _):
        rb = ints_ref[0, k, 4, 0]
        X2, vy = ps._make_X2_vy(ints_ref[0, k], flts_ref[0, k], rb, band, w,
                                gp)
        g = g_ref[0, k]
        d_mid = (g[:, None, :] * vy[None]).reshape(Cc * band, gp)
        contrib = jax.lax.dot_general(
            d_mid.astype(dt), X2.astype(dt), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        slot = jax.lax.rem(k, 2)
        cur = dsrc_ref[slot, :, pl.ds(rb, band), :]
        dsrc_ref[slot, :, pl.ds(rb, band), :] = (
            cur + contrib.reshape(Cc, band, w))
        return 0

    jax.lax.fori_loop(0, NC, body, 0)


def pallas_warp_bwd_slot2(g, ints, flts, band, h, w, approx):
    Dn, NC, Cc, gp = g.shape
    kern = functools.partial(_bwd_kernel_slot2, band=band, h=h, w=w,
                             approx=approx)
    out = pl.pallas_call(
        kern,
        grid=(Dn,),
        in_specs=[
            pl.BlockSpec((1, NC, Cc, gp), lambda d: (d, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NC, 5, gp), lambda d: (d, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NC, 4, gp), lambda d: (d, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, Cc, h, w), lambda d: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, Cc, h, w), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(g, ints, flts)
    return out[0] + out[1]


def time_fwd(name, ints, flts, band):
    ints = jnp.asarray(ints)
    flts = jnp.asarray(flts)
    rng = np.random.default_rng(0)
    src0 = jnp.asarray(rng.normal(size=(C, H, W)).astype(np.float32))

    @jax.jit
    def step(src):
        out = ps._pallas_warp_fwd(src, ints, flts, band, True)
        s = jnp.sum(out) * 1e-12
        return src + s, jnp.sum(out[0, 0, 0, :8])

    src, l = step(src0)
    float(l)
    t0 = time.perf_counter()
    src = src0
    for _ in range(STEPS):
        src, l = step(src)
    float(l)
    print(f"fwd  {name:10s} {(time.perf_counter() - t0) / STEPS * 1e3:8.2f} ms",
          flush=True)


def time_bwd(name, fn, ints, flts, band):
    ints = jnp.asarray(ints)
    flts = jnp.asarray(flts)
    NC = ints.shape[1]
    rng = np.random.default_rng(1)
    g0 = jnp.asarray(rng.normal(size=(D, NC, C, GP)).astype(np.float32))

    @jax.jit
    def step(g):
        dsrc = fn(g, ints, flts, band, H, W, True)
        s = jnp.sum(dsrc) * 1e-12
        return g + s, jnp.sum(dsrc[0, 0, :8])

    g, l = step(g0)
    float(l)
    t0 = time.perf_counter()
    g = g0
    for _ in range(STEPS):
        g, l = step(g)
    float(l)
    print(f"bwd  {name:10s} {(time.perf_counter() - t0) / STEPS * 1e3:8.2f} ms",
          flush=True)
    return np.asarray(jax.jit(fn, static_argnums=(3, 4, 5, 6))(
        g0, ints, flts, band, H, W, True))


def main():
    print(f"devices: {jax.devices()}", flush=True)
    band = 16
    ints, flts, nc = make_taps(band)
    band_al = band + 8
    ints_al = align_ints(ints, band_al)

    time_fwd("base", ints, flts, band)
    time_fwd("aligned", ints_al, flts, band_al)

    ref = time_bwd("base", ps._pallas_warp_bwd, ints, flts, band)
    out_al = time_bwd("aligned", ps._pallas_warp_bwd, ints_al, flts, band_al)
    out_s2 = time_bwd("slot2", pallas_warp_bwd_slot2, ints, flts, band)
    out_s2a = time_bwd("align+slot2", pallas_warp_bwd_slot2, ints_al, flts,
                       band_al)
    for nm, o in (("aligned", out_al), ("slot2", out_s2),
                  ("align+slot2", out_s2a)):
        err = float(np.max(np.abs(o - ref)))
        print(f"{nm}: max|Δ| vs base = {err:.3e}", flush=True)


if __name__ == "__main__" and "--smem" not in __import__("sys").argv:
    main()
    raise SystemExit(0)


# ---------------------------------------------------------------------------
# SMEM-rb variants (--smem): both kernels read the per-chunk band start rb
# with a scalar VMEM load (`ints_ref[0, k, 4, 0]`) that gates a dynamic
# slice — the scalar core stalls on VMEM every iteration (~0.8 µs/chunk
# measured vs a ~0.3 µs compute floor). These variants pass rb[D, NC] as a
# PrefetchScalarGridSpec scalar operand (SMEM, available before the body),
# the same structure the trilinear kernels already use (zb_ref).
# ---------------------------------------------------------------------------

def _fwd_kernel_smem(rb_ref, src_ref, ints_ref, flts_ref, out_ref, *, band,
                     h, w, approx):
    Cc = src_ref.shape[0]
    NC, _, gp = ints_ref.shape[1:]
    d = pl.program_id(0)
    dt, prec = ps._mm_dtype_prec(approx)

    def body(k, _):
        rb = rb_ref[d, k]
        band_rows = src_ref[:, pl.ds(rb, band), :]
        X2, vy = ps._make_X2_vy(ints_ref[0, k], flts_ref[0, k], rb, band, w,
                                gp)
        mid = jnp.dot(band_rows.reshape(Cc * band, w).astype(dt),
                      X2.astype(dt), preferred_element_type=jnp.float32,
                      precision=prec)
        out_ref[0, k] = jnp.sum(mid.reshape(Cc, band, gp) * vy[None], axis=1)
        return 0

    jax.lax.fori_loop(0, NC, body, 0)


def pallas_warp_fwd_smem(src_cm, ints, flts, band, approx):
    Cc, h, w = src_cm.shape
    Dn, NC, _, gp = ints.shape
    rb = ints[:, :, 4, 0]
    kern = functools.partial(_fwd_kernel_smem, band=band, h=h, w=w,
                             approx=approx)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Dn,),
        in_specs=[
            pl.BlockSpec((Cc, h, w), lambda d, rb_ref: (0, 0, 0)),
            pl.BlockSpec((1, NC, 5, gp), lambda d, rb_ref: (d, 0, 0, 0)),
            pl.BlockSpec((1, NC, 4, gp), lambda d, rb_ref: (d, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, NC, Cc, gp), lambda d, rb_ref: (d, 0, 0, 0)),
    )
    return pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Dn, NC, Cc, gp), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(rb, src_cm, ints, flts)


def _bwd_kernel_smem(rb_ref, g_ref, ints_ref, flts_ref, dsrc_ref, *, band,
                     h, w, approx):
    Cc = g_ref.shape[2]
    NC, _, gp = ints_ref.shape[1:]
    d = pl.program_id(0)
    dt, prec = ps._mm_dtype_prec(approx)

    @pl.when(d == 0)
    def _():
        dsrc_ref[...] = jnp.zeros_like(dsrc_ref)

    def body(k, _):
        rb = rb_ref[d, k]
        X2, vy = ps._make_X2_vy(ints_ref[0, k], flts_ref[0, k], rb, band, w,
                                gp)
        g = g_ref[0, k]
        d_mid = (g[:, None, :] * vy[None]).reshape(Cc * band, gp)
        contrib = jax.lax.dot_general(
            d_mid.astype(dt), X2.astype(dt), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        cur = dsrc_ref[:, pl.ds(rb, band), :]
        dsrc_ref[:, pl.ds(rb, band), :] = cur + contrib.reshape(Cc, band, w)
        return 0

    jax.lax.fori_loop(0, NC, body, 0)


def pallas_warp_bwd_smem(g, ints, flts, band, h, w, approx):
    Dn, NC, Cc, gp = g.shape
    rb = ints[:, :, 4, 0]
    kern = functools.partial(_bwd_kernel_smem, band=band, h=h, w=w,
                             approx=approx)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Dn,),
        in_specs=[
            pl.BlockSpec((1, NC, Cc, gp), lambda d, rb_ref: (d, 0, 0, 0)),
            pl.BlockSpec((1, NC, 5, gp), lambda d, rb_ref: (d, 0, 0, 0)),
            pl.BlockSpec((1, NC, 4, gp), lambda d, rb_ref: (d, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((Cc, h, w), lambda d, rb_ref: (0, 0, 0)),
    )
    return pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Cc, h, w), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(rb, g, ints, flts)


def _fwd_kernel_smem2d(rb_ref, src_ref, ints_ref, flts_ref, out_ref, *, band,
                       h, w, approx):
    """2D grid (D, NC): one chunk per grid step — Mosaic pipelines the
    per-chunk ints/flts/out block DMAs across steps; rb from SMEM."""
    Cc = src_ref.shape[0]
    gp = ints_ref.shape[3]
    d = pl.program_id(0)
    k = pl.program_id(1)
    dt, prec = ps._mm_dtype_prec(approx)

    rb = rb_ref[d, k]
    band_rows = src_ref[:, pl.ds(rb, band), :]
    X2, vy = ps._make_X2_vy(ints_ref[0, 0], flts_ref[0, 0], rb, band, w, gp)
    mid = jnp.dot(band_rows.reshape(Cc * band, w).astype(dt), X2.astype(dt),
                  preferred_element_type=jnp.float32, precision=prec)
    out_ref[0, 0] = jnp.sum(mid.reshape(Cc, band, gp) * vy[None], axis=1)


def pallas_warp_fwd_smem2d(src_cm, ints, flts, band, approx):
    Cc, h, w = src_cm.shape
    Dn, NC, _, gp = ints.shape
    rb = ints[:, :, 4, 0]
    kern = functools.partial(_fwd_kernel_smem2d, band=band, h=h, w=w,
                             approx=approx)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Dn, NC),
        in_specs=[
            pl.BlockSpec((Cc, h, w), lambda d, k, rb_ref: (0, 0, 0)),
            pl.BlockSpec((1, 1, 5, gp), lambda d, k, rb_ref: (d, k, 0, 0)),
            pl.BlockSpec((1, 1, 4, gp), lambda d, k, rb_ref: (d, k, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, Cc, gp),
                               lambda d, k, rb_ref: (d, k, 0, 0)),
    )
    return pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Dn, NC, Cc, gp), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(rb, src_cm, ints, flts)


def time_fwd_fn(name, fn, ints, flts, band):
    ints = jnp.asarray(ints)
    flts = jnp.asarray(flts)
    rng = np.random.default_rng(0)
    src0 = jnp.asarray(rng.normal(size=(C, H, W)).astype(np.float32))

    @jax.jit
    def step(src):
        out = fn(src, ints, flts, band, True)
        s = jnp.sum(out) * 1e-12
        return src + s, jnp.sum(out[0, 0, 0, :8])

    src, l = step(src0)
    float(l)
    t0 = time.perf_counter()
    src = src0
    for _ in range(STEPS):
        src, l = step(src)
    float(l)
    print(f"fwd  {name:10s} {(time.perf_counter() - t0) / STEPS * 1e3:8.2f} ms",
          flush=True)
    return np.asarray(jax.jit(fn, static_argnums=(3, 4))(
        src0, ints, flts, band, True))


def main_smem():
    print(f"devices: {jax.devices()}", flush=True)
    band = 16
    ints, flts, nc = make_taps(band)

    f_ref = time_fwd_fn("base", lambda s, i, f, b, a: ps._pallas_warp_fwd(
        s, i, f, b, a), ints, flts, band)
    f_sm = time_fwd_fn("smem", pallas_warp_fwd_smem, ints, flts, band)
    f_2d = time_fwd_fn("smem2d", pallas_warp_fwd_smem2d, ints, flts, band)
    for nm, o in (("smem", f_sm), ("smem2d", f_2d)):
        print(f"fwd {nm}: max|Δ| vs base = "
              f"{float(np.max(np.abs(o - f_ref))):.3e}", flush=True)

    ref = time_bwd("base", ps._pallas_warp_bwd, ints, flts, band)
    out_sm = time_bwd("smem", pallas_warp_bwd_smem, ints, flts, band)
    print(f"bwd smem: max|Δ| vs base = "
          f"{float(np.max(np.abs(out_sm - ref))):.3e}", flush=True)


if __name__ == "__main__" and "--smem" in __import__("sys").argv:
    main_smem()
