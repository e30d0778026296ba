"""Why does full-image eval pay ~1.0 s/image of color gathers? (round 5)

The eval ablation (bench_eval.py --ablate) charges ~35% of the 2.8 s image to
render.build_color_features. The banded gather kernel
(kernels/color_gather.py) lax.conds on a GLOBAL ok predicate — one 128-point
group spanning > band source-image rows sends the ENTIRE call to the XLA
gather path. This probe reproduces eval's exact point geometry on CPU
(sample_pixels_grid -> build_rays -> world_to_ndc per source view, the same
calls system._eval_image / render.build_color_features make) and reports, per
chunk and per source view:

  - the kernel's actual ok predicate at the shipped eval band (16);
  - how many 128-pt groups fail, and WHY (true row spread vs out-of-view
    clamp-to-edge rows dragging the span to ~H);
  - the minimal band that would pass once fully-clamped points (r0==r1==0 or
    H-1 -> border-replicated edge rows) are exempted.

Run: PYTHONPATH=/root/repo python tools/probe_color_eval.py
"""
import numpy as np
import jax
import jax.numpy as jnp

from zest_tpu import geometry, sampling
from zest_tpu.data.synthetic import SyntheticDataset
from zest_tpu.kernels.color_gather import _precompute

H, W, CHUNK, S = 288, 512, 16384, 128


def main():
    ds = SyntheticDataset(img_h=H, img_w=W, num_frames=24, num_keyframes=8,
                          use_mvs=True, use_mvs_dy=True)
    b = {k: jnp.asarray(v) for k, v in ds[3].items()}
    V = b["images"].shape[0]
    inv_scale = jnp.array([W - 1, H - 1], jnp.float32)
    n_chunks = -(-(H * W) // CHUNK)

    for view_set, w2cs, intrs in (
            ("src", b["w2cs"][:-1], b["intrinsics"][:-1]),
            ("nb", b["nb_w2cs"], b["nb_intr"])):
        print(f"== {view_set} views: {w2cs.shape[0]} ==")
        for ci in range(n_chunks):
            xs, ys = sampling.sample_pixels_grid(H, W, CHUNK, ci)
            rays = sampling.build_rays(
                jax.random.PRNGKey(0), xs, ys, images=b["images"],
                depths=b["depths"], w2cs=b["w2cs"], c2ws=b["c2ws"],
                intrinsics=b["intrinsics"], near_fars=b["near_fars"],
                n_samples=S, pad=24, stratified=False)
            for v in range(w2cs.shape[0]):
                ndc = geometry.world_to_ndc(rays.pts, w2cs[v], intrs[v],
                                            inv_scale, near=2.0, far=6.0,
                                            pad=0)
                xy = (ndc[..., :2] * inv_scale)          # [R, S, 2]
                xy_s = xy.transpose(1, 0, 2).reshape(-1, 2)   # s_major
                ints, _, ok16 = _precompute(xy_s, H, W, 16)
                r0, r1 = np.asarray(ints[:, 2]), np.asarray(ints[:, 3])
                clamp0 = (r0 == 0) & (r1 == 0)
                clampH = (r0 == H - 1) & (r1 == H - 1)
                free = ~(clamp0 | clampH)
                # per-group span over non-fully-clamped points only
                r0m = np.where(free, r0, H)      # min over free
                r1m = np.where(free, r1, -1)     # max over free
                gmin = r0m.min(-1)
                gmax = r1m.max(-1)
                has_free = free.any(-1)
                rb = np.clip((gmin // 8) * 8, 0, None)
                span = np.where(has_free, gmax - rb + 1, 0)
                # raw span including clamped points (what the shipped ok sees)
                raw_rb = np.clip((r0.min(-1) // 8) * 8, 0, ((H - 16) // 8) * 8)
                raw_fail = ((r0 < raw_rb[:, None])
                            | (r1 >= raw_rb[:, None] + 16)).any(-1)
                print(f"  chunk {ci} view {v}: ok16={bool(ok16)} "
                      f"groups_fail={int(raw_fail.sum())}/{len(r0)} "
                      f"fully_clamped_pts={int((~free).sum())} "
                      f"free-span p50/p99/max="
                      f"{int(np.percentile(span, 50))}/"
                      f"{int(np.percentile(span, 99))}/{int(span.max())}")
            if ci == 2:   # 3 chunks are representative (top/upper-mid rows)
                break


if __name__ == "__main__":
    main()
