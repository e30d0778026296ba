"""On-chip A/B: grouped y-banded color gather at eval geometry (round 5).

The eval ablation charges ~1.0 s/image to color-feature gathers; the G=1
kernel issues one tiny (128x512 @ 512x128) matmul per 128 points. This times
gather_colors_banded on REAL eval-geometry coords (2.1M points = one 16384-ray
chunk x 128 samples, s_major) for (group, band) in {(1,16),(4,16),(8,24),
(16,24)} — union spans measured 9/11/13 by tools/probe_color_eval.py, +7
alignment margin. Chained timing, one fetch per window (tunnel protocol).

Run: PYTHONPATH="/root/repo:$PYTHONPATH" python tools/probe_color_group.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from zest_tpu import geometry, sampling
from zest_tpu.data.synthetic import SyntheticDataset
from zest_tpu.kernels.color_gather import gather_colors_banded, _precompute

H, W, CHUNK, S = 288, 512, 16384, 128


def main():
    ds = SyntheticDataset(img_h=H, img_w=W, num_frames=24, num_keyframes=8,
                          use_mvs=True, use_mvs_dy=True)
    b = {k: jnp.asarray(v) for k, v in ds[3].items()}
    inv_scale = jnp.array([W - 1, H - 1], jnp.float32)
    xs, ys = sampling.sample_pixels_grid(H, W, CHUNK, 4)
    rays = sampling.build_rays(
        jax.random.PRNGKey(0), xs, ys, images=b["images"], depths=b["depths"],
        w2cs=b["w2cs"], c2ws=b["c2ws"], intrinsics=b["intrinsics"],
        near_fars=b["near_fars"], n_samples=S, pad=24, stratified=False)
    ndc = geometry.world_to_ndc(rays.pts, b["w2cs"][0], b["intrinsics"][0],
                                inv_scale, near=2.0, far=6.0, pad=0)
    xy = (ndc[..., :2] * inv_scale).transpose(1, 0, 2).reshape(-1, 2)
    img = jnp.asarray(
        np.random.default_rng(0).normal(size=(H, W, 3)).astype(np.float32))
    print(f"points: {xy.shape[0]}")

    for group, band in ((1, 16), (4, 16), (8, 24), (16, 24)):
        _, _, ok = _precompute(xy, H, W, band, group)
        f = jax.jit(lambda im, c: gather_colors_banded(
            im, c, band=band, approx=True, group=group))
        out = f(img, xy)
        float(out[0, 0])                 # force compile+exec (warm fetch)
        n = 60
        t0 = time.perf_counter()
        cur_img = img
        for i in range(n):
            # chain each output into the next input: defeats memoization AND
            # makes the final fetch force the whole chain (deferred tunnel)
            cur_img = img + out[0, 0] * 1e-9 + i * 1e-7
            out = f(cur_img, xy)
        float(out[0, 0])
        dt = (time.perf_counter() - t0) / n * 1000
        print(f"group={group:2d} band={band}: ok={bool(ok)} {dt:7.3f} ms/call "
              f"({dt * 1e6 / xy.shape[0]:.1f} ns/pt)", flush=True)


if __name__ == "__main__":
    main()
