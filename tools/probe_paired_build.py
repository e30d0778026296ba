"""A/B probe: octo-paired super-volume BUILD formulations (real chip).

probe_paired_vjp.py established the warped-sites fwd is ~30.5 ms of which the
row gather is only ~8 (probe_block_gather.py) — so the paired BUILD is ~20 ms
for what is logically a 44 MB read + 354 MB write (<1 ms at HBM speed). The
suspected culprit is layout: the stack+moveaxis build materializes arrays
whose minor dims are (8, C=8) — 8 of 128 lanes occupied, 16x bandwidth waste.

Candidate `flat2d`: pad the volume once to [D+2, H+2, W+2, C], flatten rows,
then three lane-CONCAT passes each pairing a row-shifted copy (x: shift 1,
y: shift W+2, z: shift (H+2)(W+2)) — every intermediate is 2D [rows, k*C]
with k*C lanes (8 -> 16 -> 32 -> 64), no 4D reshapes, no transposes, and the
gather indexes the padded row space directly (garbage wrap-rows are never
addressed: tap indices are clipped to [0, dim]), so there is NO compaction
pass. Octant lane order matches the shipped build (oct = dz*4+dy*2+dx).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/probe_paired_build.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from zest_tpu.ops.grid_sample import (_rows_weights_combine,  # noqa
                                      _unnormalize)

D, H, W, C = 128, 120, 176, 8
N = 1112 * 128 * 3
STEPS = 30


def _paired_build(vol):
    """Superseded 4D stack+moveaxis build (kept local for the historical A/B;
    the shipped ops/grid_sample.paired_volume is now the flat2d form below)."""
    volZ2 = jnp.pad(vol, ((1, 1), (1, 1), (1, 1), (0, 0)))
    octants = [volZ2[dz:dz + D + 1, dy:dy + H + 1, dx:dx + W + 1]
               for dz in (0, 1) for dy in (0, 1) for dx in (0, 1)]
    volP = jnp.moveaxis(jnp.stack(octants, 0), 0, 3)
    return volP.reshape((D + 1) * (H + 1) * (W + 1), 8 * C)


def _paired_taps(grid, Dn, Hn, Wn):
    """Tap indices/weights with the 4D table's (H+1, W+1) strides."""
    x = _unnormalize(grid[..., 0], Wn)
    y = _unnormalize(grid[..., 1], Hn)
    z = _unnormalize(grid[..., 2], Dn)

    def taps(v, n):
        v0 = jnp.floor(v)
        f = v - v0
        w0 = jnp.where((v0 >= 0) & (v0 <= n - 1), 1.0 - f, 0.0)
        w1 = jnp.where((v0 + 1 >= 0) & (v0 + 1 <= n - 1), f, 0.0)
        return (jnp.clip(v0 + 1, 0, n).astype(jnp.int32),
                jnp.stack([w0, w1], -1))

    ix0, wx = taps(x, Wn)
    iy0, wy = taps(y, Hn)
    iz0, wz = taps(z, Dn)
    row_idx = (iz0 * (Hn + 1) + iy0) * (Wn + 1) + ix0
    w = (wz[..., :, None, None] * wy[..., None, :, None]
         * wx[..., None, None, :])
    return row_idx, w


def build_flat2d(vol):
    volPad = jnp.pad(vol, ((1, 1), (1, 1), (1, 1), (0, 0)))
    f = volPad.reshape(-1, vol.shape[-1])
    W2 = W + 2
    T2 = (H + 2) * (W + 2)
    x = jnp.concatenate([f[:-1], f[1:]], -1)
    y = jnp.concatenate([x[:-W2], x[W2:]], -1)
    return jnp.concatenate([y[:-T2], y[T2:]], -1)      # [rows, 8C]


def taps_flat2d(grid):
    """_paired_taps with padded-space row strides (H+2, W+2)."""
    x = _unnormalize(grid[..., 0], W)
    y = _unnormalize(grid[..., 1], H)
    z = _unnormalize(grid[..., 2], D)

    def taps(v, n):
        v0 = jnp.floor(v)
        f = v - v0
        m0 = (v0 >= 0) & (v0 <= n - 1)
        m1 = (v0 + 1 >= 0) & (v0 + 1 <= n - 1)
        w0 = jnp.where(m0, 1.0 - f, 0.0)
        w1 = jnp.where(m1, f, 0.0)
        i0 = jnp.clip(v0 + 1, 0, n).astype(jnp.int32)
        return i0, jnp.stack([w0, w1], -1)

    ix0, wx = taps(x, W)
    iy0, wy = taps(y, H)
    iz0, wz = taps(z, D)
    row_idx = (iz0 * (H + 2) + iy0) * (W + 2) + ix0
    w = (wz[..., :, None, None] * wy[..., None, :, None]
         * wx[..., None, None, :])
    return row_idx, w


def sample_current(vol, grid):
    flat = _paired_build(vol)
    row_idx, w = _paired_taps(grid, D, H, W)
    rows = jnp.take(flat, row_idx, axis=0)
    return _rows_weights_combine(rows, w, C)


def sample_flat2d(vol, grid):
    flat = build_flat2d(vol)
    row_idx, w = taps_flat2d(grid)
    rows = jnp.take(flat, row_idx, axis=0)
    return _rows_weights_combine(rows, w, C)


def time_build(name, build, vol0):
    @jax.jit
    def step(v):
        flat = build(v)
        s = jnp.sum(flat[::997, :].astype(jnp.float32))
        return v + s * 1e-12, s

    v, l = step(vol0)
    float(l)
    t0 = time.perf_counter()
    v = vol0
    for _ in range(STEPS):
        v, l = step(v)
    float(l)
    print(f"build {name:10s} {(time.perf_counter() - t0) / STEPS * 1e3:8.2f} "
          f"ms", flush=True)


def time_mode(name, fn, vol, grid0, g, mode):
    @jax.jit
    def step(gr):
        def loss(v, n):
            if mode == "dvol":
                n = jax.lax.stop_gradient(n)
            return jnp.vdot(fn(v, n), g)

        if mode == "fwd":
            l = loss(vol, gr)
            return gr + l * 1e-12, l
        l, grads = jax.value_and_grad(loss, argnums=(0, 1))(vol, gr)
        dn = grads[1] if mode != "dvol" else jnp.zeros_like(gr)
        return (gr + dn * 1e-9 + l * 1e-12,
                l + jnp.sum(grads[0].astype(jnp.float32)[::7, 0, 0, 0]))

    gr, l = step(grid0)
    float(l)
    t0 = time.perf_counter()
    gr = grid0
    for _ in range(STEPS):
        gr, l = step(gr)
    float(l)
    print(f"{name:16s} {mode:6s} {(time.perf_counter() - t0) / STEPS * 1e3:8.2f}"
          f" ms ({N} pts)", flush=True)


def main():
    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}", flush=True)
    vol = jnp.asarray(rng.normal(size=(D, H, W, C)).astype(np.float32)
                      ).astype(jnp.bfloat16)
    grid = jnp.asarray(rng.uniform(-1.02, 1.02, size=(N, 3)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(N, C)).astype(np.float32))

    # correctness: sampled values + both grads must match the current path
    vol32 = jnp.asarray(rng.normal(size=(D, H, W, C)).astype(np.float32))
    sl = grid[:8192]
    oa = jax.jit(sample_current)(vol32, sl)
    ob = jax.jit(sample_flat2d)(vol32, sl)
    print(f"fwd: max|Δ| = {float(jnp.max(jnp.abs(oa - ob))):.3e}", flush=True)

    def l_a(v, n):
        return jnp.vdot(sample_current(v, n), g[:8192])

    def l_b(v, n):
        return jnp.vdot(sample_flat2d(v, n), g[:8192])

    ga = jax.jit(jax.grad(l_a, argnums=(0, 1)))(vol32, sl)
    gb = jax.jit(jax.grad(l_b, argnums=(0, 1)))(vol32, sl)
    for i, nm in ((0, "d_vol"), (1, "d_grid")):
        err = float(jnp.max(jnp.abs(ga[i] - gb[i])))
        ref = float(jnp.max(jnp.abs(ga[i]))) or 1.0
        print(f"{nm}: max|Δ| = {err:.3e} (rel {err / ref:.2e})", flush=True)

    time_build("current", _paired_build, vol)
    time_build("flat2d", build_flat2d, vol)
    for mode in ("fwd", "dvol", "full"):
        time_mode("current", sample_current, vol, grid, g, mode)
        time_mode("flat2d", sample_flat2d, vol, grid, g, mode)


if __name__ == "__main__" and not ({"--barrier", "--mxufold", "--mxucombine",
                                    "--pin"} & set(__import__("sys").argv)):
    main()


# ---------------------------------------------------------------------------
# round-4 follow-up: in-chain bwd reads ~33 ms vs ~13 ms of isolated parts —
# test whether materializing the scatter's updates (optimization_barrier in a
# custom take-VJP) stops XLA folding the octant-weight expand into the serial
# scatter loop, and measure the flat2d fold in isolation.
# ---------------------------------------------------------------------------

def _take_barrier(flat, row_idx):
    n_rows, width = flat.shape
    dt = flat.dtype

    @jax.custom_vjp
    def take(f, idx):
        return jnp.take(f, idx, axis=0)

    def fwd(f, idx):
        return jnp.take(f, idx, axis=0), idx

    def bwd(idx, g):
        g = jax.lax.optimization_barrier(g.astype(dt))
        d_flat = jnp.zeros((n_rows, width), dt
                           ).at[idx.reshape(-1)].add(g.reshape(-1, width))
        return d_flat, None

    take.defvjp(fwd, bwd)
    return take(flat, row_idx)


def sample_flat2d_barrier(vol, grid):
    flat = build_flat2d(vol)
    row_idx, w = taps_flat2d(grid)
    rows = _take_barrier(flat, row_idx)
    return _rows_weights_combine(rows, w, C)


def sample_flat2d_barrier2(vol, grid):
    """barrier'd take AND a barrier between scatter and the build fold."""
    flat = jax.lax.optimization_barrier(build_flat2d(vol))
    row_idx, w = taps_flat2d(grid)
    rows = _take_barrier(flat, row_idx)
    return _rows_weights_combine(rows, w, C)


def parts_flat2d(vol, grid, g):
    n_rows = ((D + 2) * (H + 2) * (W + 2)) - 1 - (W + 2) - (H + 2) * (W + 2)
    fold = jax.vjp(build_flat2d, vol)[1]
    row_idx, w = jax.jit(taps_flat2d)(grid)
    rng = np.random.default_rng(1)
    d_rows0 = jnp.asarray(rng.normal(size=(N, 8 * C)).astype(np.float32)
                          ).astype(jnp.bfloat16)

    def t(name, step, x0):
        x, l = jax.jit(step)(x0)
        float(l)
        t0 = time.perf_counter()
        for _ in range(STEPS):
            x, l = jax.jit(step)(x)
        float(l)
        print(f"{name:18s} {(time.perf_counter() - t0) / STEPS * 1e3:8.2f} ms",
              flush=True)

    def scatter_step(dr):
        d_flat = jnp.zeros((n_rows, 8 * C), jnp.bfloat16
                           ).at[row_idx.reshape(-1)].add(dr)
        s = jnp.sum(d_flat.astype(jnp.float32)[::997, :2])
        return (dr + s * 1e-12).astype(dr.dtype), s

    t("scatter", scatter_step, d_rows0)

    d_flat0 = jnp.zeros((n_rows, 8 * C), jnp.bfloat16
                        ).at[row_idx.reshape(-1)].add(d_rows0)

    def fold_step(df):
        (d_vol,) = fold(df)
        s = jnp.sum(d_vol.astype(jnp.float32))
        return (df + s * 1e-12).astype(df.dtype), s

    t("fold(flat2d)", fold_step, d_flat0)

    def scatter_fold_step(dr):
        d_flat = jnp.zeros((n_rows, 8 * C), jnp.bfloat16
                           ).at[row_idx.reshape(-1)].add(dr)
        (d_vol,) = fold(d_flat)
        s = jnp.sum(d_vol.astype(jnp.float32))
        return (dr + s * 1e-12).astype(dr.dtype), s

    t("scatter+fold", scatter_fold_step, d_rows0)


def main2():
    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}", flush=True)
    vol = jnp.asarray(rng.normal(size=(D, H, W, C)).astype(np.float32)
                      ).astype(jnp.bfloat16)
    grid = jnp.asarray(rng.uniform(-1.02, 1.02, size=(N, 3)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(N, C)).astype(np.float32))

    vol32 = jnp.asarray(rng.normal(size=(D, H, W, C)).astype(np.float32))
    sl = grid[:8192]
    ga = jax.jit(jax.grad(
        lambda v, n: jnp.vdot(sample_flat2d(v, n), g[:8192]),
        argnums=(0, 1)))(vol32, sl)
    gb = jax.jit(jax.grad(
        lambda v, n: jnp.vdot(sample_flat2d_barrier(v, n), g[:8192]),
        argnums=(0, 1)))(vol32, sl)
    for i, nm in ((0, "d_vol"), (1, "d_grid")):
        err = float(jnp.max(jnp.abs(ga[i] - gb[i])))
        print(f"barrier/{nm}: max|Δ| = {err:.3e}", flush=True)

    parts_flat2d(vol, grid, g)
    for mode in ("dvol", "full"):
        time_mode("flat2d", sample_flat2d, vol, grid, g, mode)
        time_mode("flat2d_barrier", sample_flat2d_barrier, vol, grid, g, mode)
        time_mode("flat2d_barrier2", sample_flat2d_barrier2, vol, grid, g,
                  mode)


if __name__ == "__main__" and "--barrier" in __import__("sys").argv:
    main2()
    raise SystemExit(0)


# ---------------------------------------------------------------------------
# MXU-fold variant: the HLO of scatter+fold shows XLA inserting a wide.body
# relayout while-loop whenever a narrow ([rows, 8/16]) intermediate flips
# between row-/column-major tiled layouts. Avoid narrow arrays entirely: do
# the dz fold as a wide 2D slice-add, then fold dy+dx with TWO selection
# matmuls on the lane-merged view [ (D+2)(H+2), (W+2)*32 ] -> every
# materialized array is >=1.4k lanes and the 2-hot selection rides the MXU
# (~0.5 TFLOP, trivial).
# ---------------------------------------------------------------------------

def _fold_sel_matrices():
    """M_dy [(W+2)*32, (W+2)*8] with M[x_in*32 + dy*16 + dx*8 + c,
    x_out*8 + c] = 1 where x_in = x_out - dx (x_out ranges the FULL padded
    W+2 line; garbage x_out columns are sliced away afterwards, and the
    x_out=0, dx=1 cross-line leak is provably zero: it reads a garbage-x
    row of the previous line, which is never scattered)."""
    W2 = W + 2
    i = np.arange(W2 * 32)
    x_in, rem = np.divmod(i, 32)
    dy_in, rem = np.divmod(rem, 16)
    dx_in, c_in = np.divmod(rem, 8)
    o = np.arange(W2 * 8)
    x_out, c_out = np.divmod(o, 8)
    ms = []
    for dy in (0, 1):
        m = ((dy_in[:, None] == dy) & (c_in[:, None] == c_out[None, :])
             & (x_in[:, None] == x_out[None, :] - dx_in[:, None]))
        ms.append(m.astype(np.float32))       # numpy: safe to cache globally
    return ms


_M_DY = None


def build_flat2d_mxufold(vol):
    global _M_DY
    if _M_DY is None:
        _M_DY = _fold_sel_matrices()
    approx = vol.dtype == jnp.bfloat16
    mdt = jnp.bfloat16 if approx else jnp.float32
    prec = (jax.lax.Precision.DEFAULT if approx
            else jax.lax.Precision.HIGHEST)
    m0 = jnp.asarray(_M_DY[0], mdt)
    m1 = jnp.asarray(_M_DY[1], mdt)

    @jax.custom_vjp
    def build(v):
        return build_flat2d(v)

    def fwd(v):
        return build_flat2d(v), None

    def bwd(_, dZ):
        W2 = W + 2
        T2 = (H + 2) * (W + 2)
        n_f = (D + 2) * (H + 2) * (W + 2)
        # dz fold: wide [N3, 64] -> [N2=n_f-1-W2, 32] slice-adds
        dY = (jnp.pad(dZ[:, :32], ((0, T2), (0, 0)))
              + jnp.pad(dZ[:, 32:], ((T2, 0), (0, 0))))        # [N2, 32]
        # merge x into lanes: pad rows to n_f, view as y-lines
        dYm = jnp.pad(dY, ((0, 1 + W2), (0, 0))).reshape(-1, W2 * 32)
        R = dYm.shape[0]                                       # (D+2)(H+2)
        # dy fold via row shift + dx fold via selection matmul (MXU)
        t0 = jnp.dot(dYm, m0, preferred_element_type=jnp.float32,
                     precision=prec)
        dy1 = jnp.pad(dYm[:-1], ((1, 0), (0, 0)))
        t1 = jnp.dot(dy1, m1, preferred_element_type=jnp.float32,
                     precision=prec)
        DV = (t0 + t1).reshape(D + 2, H + 2, W2 * 8)
        d_vol = DV[1:-1, 1:-1, 8:8 + W * 8].reshape(D, H, W, 8)
        return (d_vol.astype(vol.dtype),)

    build.defvjp(fwd, bwd)
    return build(vol)


def sample_flat2d_mxufold(vol, grid):
    flat = build_flat2d_mxufold(vol)
    row_idx, w = taps_flat2d(grid)
    rows = jnp.take(flat, row_idx, axis=0)
    return _rows_weights_combine(rows, w, C)


def main3():
    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}", flush=True)
    vol = jnp.asarray(rng.normal(size=(D, H, W, C)).astype(np.float32)
                      ).astype(jnp.bfloat16)
    grid = jnp.asarray(rng.uniform(-1.02, 1.02, size=(N, 3)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(N, C)).astype(np.float32))

    vol32 = jnp.asarray(rng.normal(size=(D, H, W, C)).astype(np.float32))
    sl = grid[:8192]
    ga = jax.jit(jax.grad(
        lambda v, n: jnp.vdot(sample_flat2d(v, n), g[:8192]),
        argnums=(0, 1)))(vol32, sl)
    gb = jax.jit(jax.grad(
        lambda v, n: jnp.vdot(sample_flat2d_mxufold(v, n), g[:8192]),
        argnums=(0, 1)))(vol32, sl)
    for i, nm in ((0, "d_vol"), (1, "d_grid")):
        err = float(jnp.max(jnp.abs(ga[i] - gb[i])))
        ref = float(jnp.max(jnp.abs(ga[i]))) or 1.0
        print(f"mxufold/{nm}: max|Δ| = {err:.3e} (rel {err / ref:.2e})",
              flush=True)

    for mode in ("dvol", "full"):
        time_mode("flat2d", sample_flat2d, vol, grid, g, mode)
        time_mode("flat2d_mxufold", sample_flat2d_mxufold, vol, grid, g, mode)


if __name__ == "__main__" and "--mxufold" in __import__("sys").argv:
    main3()
    raise SystemExit(0)


# ---------------------------------------------------------------------------
# MXU-combine variant: the expand+scatter side composes at ~30 ms in-step vs
# ~13 isolated — g [N, C=8] and w [N, 8] are themselves narrow arrays feeding
# the scatter's update fusion. Reformulate the weights-combine so BOTH its
# forward and its autodiff transpose only materialize [N, 64] forms, with
# one-hot matmuls (MXU) doing every narrow<->wide conversion:
#   out = ((rows * (w @ K)) @ K2)         K  [8, 8C] : w_oct -> oct*C lanes
#                                         K2 [8C, C] : sum over octants
#   d_rows = (g @ K2^T) * (w @ K)         (wide elementwise product)
# ---------------------------------------------------------------------------

def _combine_sel_np():
    K = np.zeros((8, 8 * C), np.float32)
    for oct_ in range(8):
        K[oct_, oct_ * C:(oct_ + 1) * C] = 1.0
    K2 = np.zeros((8 * C, C), np.float32)
    for oct_ in range(8):
        K2[oct_ * C + np.arange(C), np.arange(C)] = 1.0
    return K, K2


_K_NP = None


def _combine_mxu(rows, w):
    global _K_NP
    if _K_NP is None:
        _K_NP = _combine_sel_np()
    K = jnp.asarray(_K_NP[0], jnp.float32)
    K2 = jnp.asarray(_K_NP[1], jnp.float32)
    hi = jax.lax.Precision.HIGHEST
    wk = jnp.dot(w.reshape(-1, 8).astype(jnp.float32), K, precision=hi)
    prod = rows.reshape(-1, 8 * C).astype(jnp.float32) * wk
    return jnp.dot(prod, K2, precision=hi).reshape(w.shape[:-3] + (C,))


def sample_flat2d_mxucombine(vol, grid):
    flat = build_flat2d_mxufold(vol)
    row_idx, w = taps_flat2d(grid)
    rows = jnp.take(flat, row_idx, axis=0)
    return _combine_mxu(rows, w)


def main4():
    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}", flush=True)
    vol = jnp.asarray(rng.normal(size=(D, H, W, C)).astype(np.float32)
                      ).astype(jnp.bfloat16)
    grid = jnp.asarray(rng.uniform(-1.02, 1.02, size=(N, 3)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(N, C)).astype(np.float32))

    vol32 = jnp.asarray(rng.normal(size=(D, H, W, C)).astype(np.float32))
    sl = grid[:8192]
    ga = jax.jit(jax.grad(
        lambda v, n: jnp.vdot(sample_flat2d(v, n), g[:8192]),
        argnums=(0, 1)))(vol32, sl)
    gb = jax.jit(jax.grad(
        lambda v, n: jnp.vdot(sample_flat2d_mxucombine(v, n), g[:8192]),
        argnums=(0, 1)))(vol32, sl)
    for i, nm in ((0, "d_vol"), (1, "d_grid")):
        err = float(jnp.max(jnp.abs(ga[i] - gb[i])))
        ref = float(jnp.max(jnp.abs(ga[i]))) or 1.0
        print(f"mxucombine/{nm}: max|Δ| = {err:.3e} (rel {err / ref:.2e})",
              flush=True)

    for mode in ("fwd", "dvol", "full"):
        time_mode("flat2d_mxufold", sample_flat2d_mxufold, vol, grid, g, mode)
        time_mode("flat2d_mxucomb", sample_flat2d_mxucombine, vol, grid, g,
                  mode)


if __name__ == "__main__" and "--mxucombine" in __import__("sys").argv:
    main4()
    raise SystemExit(0)


# ---------------------------------------------------------------------------
# round-5: Pallas LAYOUT-PIN variants (VERDICT r4 next #1b/#1c).
# The round-4 finding: expand+scatter composes at ~30 ms vs ~13 isolated and
# the fold reads 17.9 ms in-step vs ~6.5 isolated — the HLO shows serial
# `wide.body` relayout while-loops whenever narrow ([rows, 8/16]) arrays flip
# between row-/column-major tilings, and optimization_barrier does NOT stop
# layout assignment. A Pallas custom-call boundary DOES: XLA must materialize
# custom-call operands/results in the kernel's default (row-major tiled)
# layout and cannot fuse/relayout across it.
#   pin_expand — d_rows/d_w computed INSIDE a Pallas kernel (wide [BLK, 8C]
#                only; tiny one-hot matmuls built from iota compares), so the
#                scatter consumes a layout-pinned custom-call result and its
#                update computation is trivial (clean-floor shape).
#   pin_fold   — Pallas identity copy pins the scatter output's layout before
#                the fold's lane-slices.
#   fold64     — alternative fold that never lane-slices: 4 selection matmuls
#                (dz,dy shifts as row shifts; dx as lane arithmetic) read the
#                scatter output UNSLICED at 64 lanes (~2 TFLOP bf16, ~10 ms
#                MXU — trades FLOPs for zero relayout).
# ---------------------------------------------------------------------------

from jax.experimental import pallas as pl  # noqa: E402


def _expand_kernel(g_ref, w_ref, rows_ref, drows_ref, dw_ref, *, C):
    g = g_ref[...].astype(jnp.float32)            # [BLK, C]
    w = w_ref[...].astype(jnp.float32)            # [BLK, 8]
    rows = rows_ref[...].astype(jnp.float32)      # [BLK, 8C]
    oct_of_lane = jax.lax.broadcasted_iota(jnp.int32, (8, 8 * C), 1) // C
    oct_row = jax.lax.broadcasted_iota(jnp.int32, (8, 8 * C), 0)
    K = (oct_row == oct_of_lane).astype(jnp.float32)          # [8, 8C]
    c_of_lane = jax.lax.broadcasted_iota(jnp.int32, (C, 8 * C), 1) % C
    c_row = jax.lax.broadcasted_iota(jnp.int32, (C, 8 * C), 0)
    K2T = (c_row == c_of_lane).astype(jnp.float32)            # [C, 8C]
    wk = jnp.dot(w, K, preferred_element_type=jnp.float32)    # [BLK, 8C]
    gk = jnp.dot(g, K2T, preferred_element_type=jnp.float32)  # [BLK, 8C]
    drows_ref[...] = (gk * wk).astype(drows_ref.dtype)
    dw_ref[...] = jnp.dot(rows * gk, K.T,
                          preferred_element_type=jnp.float32)  # [BLK, 8]


def _expand_pallas(g, w8, rows, C, out_dt=jnp.bfloat16):
    """d_rows = (g @ K2^T) * (w @ K), d_w = (rows*(g @ K2^T)) @ K^T — in one
    Pallas kernel so both wide results are custom-call-pinned."""
    N = g.shape[0]
    BLK = 1024
    NB = -(-N // BLK)
    Np = NB * BLK
    if Np != N:
        g = jnp.pad(g, ((0, Np - N), (0, 0)))
        w8 = jnp.pad(w8, ((0, Np - N), (0, 0)))
        rows = jnp.pad(rows, ((0, Np - N), (0, 0)))
    import functools as _ft
    drows, dw = pl.pallas_call(
        _ft.partial(_expand_kernel, C=C),
        grid=(NB,),
        in_specs=[pl.BlockSpec((BLK, C), lambda i: (i, 0)),
                  pl.BlockSpec((BLK, 8), lambda i: (i, 0)),
                  pl.BlockSpec((BLK, 8 * C), lambda i: (i, 0))],
        out_specs=[pl.BlockSpec((BLK, 8 * C), lambda i: (i, 0)),
                   pl.BlockSpec((BLK, 8), lambda i: (i, 0))],
        out_shape=[jax.ShapeDtypeStruct((Np, 8 * C), out_dt),
                   jax.ShapeDtypeStruct((Np, 8), jnp.float32)],
        interpret=jax.default_backend() != "tpu",
    )(g, w8, rows)
    return drows[:N], dw[:N]


def _copy_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...]


def _pin_pallas(x):
    """Pallas identity copy: pins x's layout at a custom-call boundary."""
    N, L = x.shape
    BLK = 8192
    NB = -(-N // BLK)
    return pl.pallas_call(
        _copy_kernel, grid=(NB,),
        in_specs=[pl.BlockSpec((BLK, L), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((BLK, L), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((N, L), x.dtype),
        interpret=jax.default_backend() != "tpu",
    )(x)


def _fold64_matrix(dz, dy, dt):
    """M[(dz,dy)] [(W+2)*64, (W+2)*8]: out[line, x_out*8+c] sums
    in[line', x_in*64 + dz*32 + dy*16 + dx*8 + c] over dx with
    x_in = x_out - dx; the (dz, dy) row shift is applied to the input rows
    (line' = line - dz*(H+2) - dy) outside the matmul.

    Built ON DEVICE from iota compares — a numpy constant of this size
    (65 MB x4) serializes into the tunnel's remote compile request and
    trips its HTTP-413 body limit (CLAUDE.md)."""
    W2 = W + 2
    shp = (W2 * 64, W2 * 8)
    i = jax.lax.broadcasted_iota(jnp.int32, shp, 0)
    o = jax.lax.broadcasted_iota(jnp.int32, shp, 1)
    x_in, rem = i // 64, i % 64
    dz_in, rem = rem // 32, rem % 32
    dy_in, rem = rem // 16, rem % 16
    dx_in, c_in = rem // 8, rem % 8
    x_out, c_out = o // 8, o % 8
    m = ((dz_in == dz) & (dy_in == dy) & (c_in == c_out)
         & (x_in == x_out - dx_in))
    return m.astype(dt)


def _fold64(d_flat, n_rows_full):
    """Fold the paired cotangent [n_rows, 64] -> d_vol WITHOUT lane slices:
    pad rows to the full (D+2)(H+2)(W+2) space, view as y-lines at 64 lanes,
    4 selection matmuls with (dz, dy)-dependent row shifts."""
    W2 = W + 2
    H2 = H + 2
    dZ = jnp.pad(d_flat, ((0, n_rows_full - d_flat.shape[0]), (0, 0)))
    dZm = dZ.reshape(-1, W2 * 64)                       # [(D+2)(H+2), .]
    acc = None
    mdt = dZm.dtype if dZm.dtype == jnp.bfloat16 else jnp.float32
    prec = (jax.lax.Precision.DEFAULT if mdt == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)
    for dz in (0, 1):
        for dy in (0, 1):
            m = _fold64_matrix(dz, dy, mdt)
            shift = dz * H2 + dy
            src = dZm if shift == 0 else jnp.pad(dZm[:-shift],
                                                 ((shift, 0), (0, 0)))
            t = jnp.dot(src, m, preferred_element_type=jnp.float32,
                        precision=prec)
            acc = t if acc is None else acc + t
    DV = acc.reshape(D + 2, H + 2, W2 * 8)
    return DV[1:-1, 1:-1, 8:8 + W * 8].reshape(D, H, W, 8)


def _make_sample_pinned(pin_expand, pin_fold, fold_mode):
    """take+combine with a custom VJP whose adjoint uses the pin variants.

    fold_mode: 'mxu' (shipped 2-matmul fold on the 32-lane view) or 'fold64'.
    """
    n_rows_full = (D + 2) * (H + 2) * (W + 2)
    n_rows = n_rows_full - 1 - (W + 2) - (H + 2) * (W + 2)

    # fold applied via a custom-vjp'd build so we control both sides
    def sample_full(vol, grid):
        @jax.custom_vjp
        def build(v):
            return build_flat2d(v)

        def bfwd(v):
            return build_flat2d(v), None

        def bbwd(_, dZ):
            if pin_fold:
                dZ = _pin_pallas(dZ)
            if fold_mode == "fold64":
                return (_fold64(dZ, n_rows_full).astype(vol.dtype),)
            # shipped MXU fold
            d = build_flat2d_mxufold  # noqa — reuse its bwd via vjp
            _, vjp = jax.vjp(build_flat2d_mxufold, jnp.zeros_like(vol))
            return vjp(dZ)

        build.defvjp(bfwd, bbwd)

        flat = build(vol)
        row_idx, w = taps_flat2d(grid)

        @jax.custom_vjp
        def tc(flat, w):
            rows = jnp.take(flat, row_idx.reshape(-1), axis=0)
            return _combine_mxu(rows, w)

        def fwd(flat, w):
            rows = jnp.take(flat, row_idx.reshape(-1), axis=0)
            return _combine_mxu(rows, w), (rows, w)

        def bwd(res, g):
            rows, w = res
            dt = rows.dtype
            g2 = g.reshape(-1, C)
            w2 = w.reshape(-1, 8)
            if pin_expand:
                d_rows, d_w = _expand_pallas(g2, w2, rows, C, out_dt=dt)
            else:
                global _K_NP
                if _K_NP is None:
                    _K_NP = _combine_sel_np()
                K = jnp.asarray(_K_NP[0], jnp.float32)
                K2 = jnp.asarray(_K_NP[1], jnp.float32)
                wk = jnp.dot(w2, K)
                gk = jnp.dot(g2, K2.T)
                d_rows = (gk * wk).astype(dt)
                d_w = jnp.dot(rows.astype(jnp.float32) * gk, K.T)
            d_flat = jnp.zeros((n_rows, 8 * C), dt
                               ).at[row_idx.reshape(-1)].add(d_rows)
            return d_flat, d_w.reshape(w.shape[:-3] + (2, 2, 2))

        tc.defvjp(fwd, bwd)
        return tc(flat, w)

    return sample_full


def main5():
    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}", flush=True)
    vol = jnp.asarray(rng.normal(size=(D, H, W, C)).astype(np.float32)
                      ).astype(jnp.bfloat16)
    grid = jnp.asarray(rng.uniform(-1.02, 1.02, size=(N, 3)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(N, C)).astype(np.float32))

    variants = {
        "base(mxucomb)": sample_flat2d_mxucombine,
        "pin_expand": _make_sample_pinned(True, False, "mxu"),
        "pin_fold": _make_sample_pinned(False, True, "mxu"),
        "pin_both": _make_sample_pinned(True, True, "mxu"),
        "fold64": _make_sample_pinned(False, False, "fold64"),
        "pinexp+fold64": _make_sample_pinned(True, False, "fold64"),
    }

    # correctness vs the shipped autodiff path (f32 to see real error)
    vol32 = jnp.asarray(rng.normal(size=(D, H, W, C)).astype(np.float32))
    sl = grid[:8192]
    ga = jax.jit(jax.grad(
        lambda v, n: jnp.vdot(sample_flat2d(v, n), g[:8192]),
        argnums=(0, 1)))(vol32, sl)
    for name, fn in variants.items():
        gb = jax.jit(jax.grad(
            lambda v, n: jnp.vdot(fn(v, n), g[:8192]),
            argnums=(0, 1)))(vol32, sl)
        for i, nm in ((0, "d_vol"), (1, "d_grid")):
            err = float(jnp.max(jnp.abs(ga[i] - gb[i])))
            ref = float(jnp.max(jnp.abs(ga[i]))) or 1.0
            print(f"{name}/{nm}: max|Δ| = {err:.3e} (rel {err / ref:.2e})",
                  flush=True)

    for mode in ("dvol", "full"):
        for name, fn in variants.items():
            time_mode(name, fn, vol, grid, g, mode)


if __name__ == "__main__" and "--pin" in __import__("sys").argv:
    main5()
    raise SystemExit(0)
