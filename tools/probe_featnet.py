"""A/B probe: FeatureNet 2D-CNN forward/backward formulations (real chip).

The round-4 ablation charges ~54 ms/step to warp+variance+FeatureNet backward,
of which the warp adjoint kernels are ~28 ms (at their MXU floor per
tools/probe_warp_bwd.py) — leaving ~26 ms on the FeatureNet/variance side for
12 views of 288x512. FeatureNet's full-res stages are channel-THIN (3->8,
8->8): if XLA-TPU lane-pads Cout, those convs run at ~1/16 MXU occupancy.

Variants (all exact reformulations, bf16 compute like --precision 16):
  base     — FeatureNet as shipped (NHWC, bf16)
  stages   — base with the full-res pair / half-res triple knocked out
             (replaced by cheap slices) to attribute time per stage
  s2d      — space-to-depth the full-res pair: x [B,288,512,3] ->
             [B,144,256,12]; conv0_0/conv0_1 become 3x3 convs over the
             block grid with phase-structured kernels (exact: each output
             phase (di,dj) reads input phase (di+u, dj+v) — a [3,3,4Cin,4Cout]
             kernel with 1/4 density). 4x fewer spatial rows through the MXU
             at the same (lane-padded) channel cost.

Timing: chained on-device, one value fetch per window (CLAUDE.md rules).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/probe_featnet.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from zest_tpu.models.feature_net import FeatureNet  # noqa: E402

V, H, W = 12, 288, 512
STEPS = 30


def timed(name, loss_fn, params, x0):
    # ADVICE r4: 1e-12*g underflowed below one f32 ulp -> params bitwise
    # identical every step -> tunnel memoization. Perturb the INPUT by a
    # device-carried step counter instead (guaranteed bit change), and keep a
    # small real param nudge (1e-4*g) so the grad graph stays live.
    g_fn = jax.jit(jax.grad(loss_fn))

    def chain(p, i):
        g = g_fn(p, x0 + (i + 1) * 1e-4)
        return jax.tree.map(lambda a, b: a + 1e-4 * b, p, g), i + 1, g

    chain_j = jax.jit(chain)
    p, i, g = chain_j(params, jnp.float32(0.0))
    float(jax.tree.leaves(g)[0].reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(STEPS):
        p, i, g = chain_j(p, i)
    float(jax.tree.leaves(g)[0].reshape(-1)[0])
    dt = (time.perf_counter() - t0) / STEPS * 1e3
    print(f"fwd+bwd {name:14s} {dt:8.2f} ms", flush=True)
    return dt


def timed_fwd(name, fn, params, x0):
    f = jax.jit(lambda p, x: jnp.sum(fn(p, x).astype(jnp.float32)))
    o = f(params, x0)
    float(o)
    t0 = time.perf_counter()
    outs = []
    for i in range(STEPS):
        # i+1: step 0 must not repeat the warm-up input bitwise (ADVICE r4)
        outs.append(f(params, x0 + (i + 1) * 1e-6))
    float(outs[-1])
    dt = (time.perf_counter() - t0) / STEPS * 1e3
    print(f"fwd     {name:14s} {dt:8.2f} ms", flush=True)
    return dt


# --- s2d full-res pair (exact): conv over the 2x2-block grid ---
def s2d(x):                                  # [B,H,W,C] -> [B,H/2,W/2,4C]
    B, h, w, C = x.shape
    return x.reshape(B, h // 2, 2, w // 2, 2, C).transpose(
        0, 1, 3, 2, 4, 5).reshape(B, h // 2, w // 2, 4 * C)

def d2s(y):                                  # inverse
    B, h2, w2, C4 = y.shape
    C = C4 // 4
    return y.reshape(B, h2, w2, 2, 2, C).transpose(
        0, 1, 3, 2, 4, 5).reshape(B, h2 * 2, w2 * 2, C)

def lift_kernel(k):                          # [3,3,Cin,Co] -> [3,3,4Cin,4Co]
    kh, kw, Ci, Co = k.shape
    K = jnp.zeros((3, 3, 4 * Ci, 4 * Co), k.dtype)
    for di in range(2):
        for dj in range(2):
            for u in range(-1, 2):
                for v in range(-1, 2):
                    si, sj = di + u, dj + v          # input phase coords
                    bi, pi = si // 2, si % 2          # block offset, phase
                    bj, pj = sj // 2, sj % 2
                    K = K.at[bi + 1, bj + 1,
                             (pi * 2 + pj) * Ci:(pi * 2 + pj + 1) * Ci,
                             (di * 2 + dj) * Co:(di * 2 + dj + 1) * Co
                             ].set(k[u + 1, v + 1])
    return K


def fullres_s2d(p, x):
    """conv0_0 + bn + act + conv0_1 + bn + act, in s2d space (exact)."""
    xb = s2d(x.astype(jnp.bfloat16))                     # [B,144,256,12]
    k0 = lift_kernel(p["params"]["conv0_0"]["conv"]["kernel"]
                     .astype(jnp.bfloat16))
    # bf16 conv output, upcast after: keeps the VJP cotangent bf16 so the
    # kernel-grad conv sees matching dtypes (preferred_element_type=f32 made
    # the cotangent f32 vs the bf16 operands and the grad conv rejects that)
    y = jax.lax.conv_general_dilated(
        xb, k0, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # BN in s2d space: per TRUE channel — fold the 4 phases into rows so
    # the stats equal the base layout's per-channel stats exactly
    y32 = y.astype(jnp.float32).reshape(y.shape[:3] + (4, 8))
    mean = jnp.mean(y32.reshape(-1, 8), 0)
    var = jnp.mean(jnp.square(y32.reshape(-1, 8)), 0) - mean * mean
    sc = p["params"]["conv0_0"]["bn"]["scale"]
    of = p["params"]["conv0_0"]["bn"]["bias"]
    inv = jax.lax.rsqrt(var + 1e-5) * sc
    y = (y32 * inv + (of - mean * inv)).astype(jnp.bfloat16)
    y = jax.nn.leaky_relu(y, 0.01).reshape(y.shape[:3] + (32,))
    k1 = lift_kernel(p["params"]["conv0_1"]["conv"]["kernel"]
                     .astype(jnp.bfloat16))
    z = jax.lax.conv_general_dilated(
        y, k1, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    z32 = z.astype(jnp.float32).reshape(z.shape[:3] + (4, 8))
    mean = jnp.mean(z32.reshape(-1, 8), 0)
    var = jnp.mean(jnp.square(z32.reshape(-1, 8)), 0) - mean * mean
    sc = p["params"]["conv0_1"]["bn"]["scale"]
    of = p["params"]["conv0_1"]["bn"]["bias"]
    inv = jax.lax.rsqrt(var + 1e-5) * sc
    z = (z32 * inv + (of - mean * inv)).astype(jnp.bfloat16)
    z = jax.nn.leaky_relu(z, 0.01).reshape(z.shape[:3] + (32,))
    return d2s(z)                                         # [B,288,512,8]

def fullres_base(p, x):
    from zest_tpu.models.feature_net import ConvBnReLU
    y = ConvBnReLU(8, 3, 1, dtype=jnp.bfloat16, name="conv0_0").bind(
        {"params": p["params"]["conv0_0"]})(x)
    return ConvBnReLU(8, 3, 1, dtype=jnp.bfloat16, name="conv0_1").bind(
        {"params": p["params"]["conv0_1"]})(y)



def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(V, H, W, 3)).astype(np.float32))

    net = FeatureNet(dtype=jnp.bfloat16)
    params = net.init(jax.random.PRNGKey(0), x0)

    def loss(p, x):
        return jnp.sum(net.apply(p, x).astype(jnp.float32) ** 2) * 1e-6

    timed_fwd("base", lambda p, x: net.apply(p, x), params, x0)
    timed("base", loss, params, x0)

    # --- stage attribution: skip the full-res pair (feed a cheap 8-ch lift of
    # the input straight into conv1_0) ---
    from zest_tpu.models.feature_net import ConvBnReLU
    import flax.linen as nn
    from zest_tpu.models.init import torch_conv_kernel_init

    def run_skip(p, x):
        y = jnp.concatenate([x, x, x[..., :2]], -1).astype(jnp.bfloat16)
        for name, ch, k, s in (("conv1_0", 16, 5, 2), ("conv1_1", 16, 3, 1),
                               ("conv1_2", 16, 3, 1), ("conv2_0", 32, 5, 2),
                               ("conv2_1", 32, 3, 1), ("conv2_2", 32, 3, 1)):
            y = ConvBnReLU(ch, k, s, dtype=jnp.bfloat16, name=name).bind(
                {"params": p["params"][name]})(y)
        return nn.Conv(32, (1, 1), dtype=jnp.bfloat16,
                       kernel_init=torch_conv_kernel_init,
                       name="toplayer").bind(
            {"params": p["params"]["toplayer"]})(y)

    def loss_skip(p, x):
        return jnp.sum(run_skip(p, x).astype(jnp.float32) ** 2) * 1e-6

    timed("skip_fullres", loss_skip, params, x0)

    # exactness check (CPU-friendly small slice happens on chip here; tolerate
    # bf16 rounding of the different contraction order)
    a = np.asarray(jax.jit(fullres_base)(params, x0[:, :32, :64]),
                   np.float32)
    b = np.asarray(jax.jit(fullres_s2d)(params, x0[:, :32, :64]), np.float32)
    print(f"s2d fullres max|Δ| = {np.max(np.abs(a - b)):.3e} "
          f"(bf16 reassociation)", flush=True)

    def loss_fb(p, x):
        return jnp.sum(fullres_base(p, x).astype(jnp.float32) ** 2) * 1e-6

    def loss_fs(p, x):
        return jnp.sum(fullres_s2d(p, x).astype(jnp.float32) ** 2) * 1e-6

    timed_fwd("fullres_base", fullres_base, params, x0)
    timed_fwd("fullres_s2d", fullres_s2d, params, x0)
    timed("fullres_base", loss_fb, params, x0)
    timed("fullres_s2d", loss_fs, params, x0)


if __name__ == "__main__":
    main()
