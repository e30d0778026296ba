"""Full-image eval throughput at flagship scale, per eval_chunk (VERDICT r2 #5).

288x512 scene-flow eval (volumes built once per image, two field passes per
ray, banded kernels engaged). Forced-fetch timing; inputs varied across
repeats (the axon tunnel memoizes identical executions). Persistent compile
cache makes retries of the same chunk size cheap.

Usage: python tools/bench_eval.py [chunk ...]   (default: 8192 16384)
       python tools/bench_eval.py --ablate     (component shares at the
                                                default chunk: full /
                                                zeroed-color-features /
                                                static-field-only)
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _patch(mode):
    """Component ablations for share attribution (not semantics-preserving).

    Returns an undo callable (or None). Shares at the default chunk:
    full − nocolor = color-feature gathers; full − nomlp = field passes;
    full − nosample = volume trilinear sampling (both banded kernels)."""
    from zest_tpu import render
    if mode == "nocolor":
        orig = render.build_color_features

        def zeros(pts_world, images, w2cs, intrinsics, with_mask=True,
                  approx=False, order="s_major", band=16):
            V = images.shape[0]
            R, S, _ = pts_world.shape
            c = 4 if with_mask else 3
            return jnp.zeros((R, S, V * c),
                             jnp.bfloat16 if approx else jnp.float32)

        render.build_color_features = zeros

        def undo():
            render.build_color_features = orig
        return undo
    if mode == "nomlp":
        from zest_tpu.kernels import fused_mlp as _fm
        orig = _fm.fused_nerf_apply

        def cheap(field, field_params, p, f, v, approx=None):
            out = jax.eval_shape(
                lambda p_, f_, v_: orig(field, field_params, p_, f_, v_,
                                        approx=approx), p, f, v)
            eps = (jnp.sum(p[::509, 0]) + jnp.sum(f[::509, 0])) * 1e-30
            return jnp.zeros(out.shape, out.dtype) + eps.astype(out.dtype)

        _fm.fused_nerf_apply = cheap

        def undo():
            _fm.fused_nerf_apply = orig
        return undo
    if mode == "nosample":
        from zest_tpu.kernels import trilinear as _tri
        orig_b = _tri.sample_volume_zbanded
        orig_d = _tri.sample_volume_zbanded_diff

        def cheap_b(vol, ndc, band=6, approx=None):
            eps = jnp.mean(vol.astype(jnp.float32)[0, 0, 0]) * 1e-30
            return (jnp.zeros(ndc.shape[:-1] + (vol.shape[-1],), vol.dtype)
                    + eps.astype(vol.dtype))

        def cheap_d(vol, ndc, band=6, approx=None, paired=None):
            eps = jnp.mean(vol.astype(jnp.float32)[0, 0, 0]) * 1e-30
            return (jnp.zeros(ndc.shape[:-1] + (vol.shape[-1],), vol.dtype)
                    + eps.astype(vol.dtype))

        _tri.sample_volume_zbanded = cheap_b
        _tri.sample_volume_zbanded_diff = cheap_d

        def undo():
            _tri.sample_volume_zbanded = orig_b
            _tri.sample_volume_zbanded_diff = orig_d
        return undo
    return None


def main(chunks, mode="full"):
    from zest_tpu.config import ZestConfig
    from zest_tpu.data.synthetic import SyntheticDataset
    from zest_tpu.system import ZestSystem

    base = ZestConfig(train_sceneflow=True, use_mvs=True, use_mvs_dy=True,
                      pad=24, num_keyframes=8, netdepth=8, netwidth=256,
                      multires=10, multires_views=4, N_samples=128,
                      batch_size=600, num_extra_samples=512,
                      use_motion_mask=True, decay_iteration=30,
                      with_chain_loss=True, pts_embedder=True,
                      dir_embedder=True, use_viewdirs=True, num_epochs=6000,
                      raw_noise_std=1.0, img_h=288, img_w=512, precision=16)
    ds = SyntheticDataset(img_h=288, img_w=512, num_frames=24, num_keyframes=8,
                          use_mvs=True, use_mvs_dy=True)
    batch = {k: jnp.asarray(v) for k, v in ds[3].items()}
    base = base.replace(warp_band=ds.warp_band_bound(pad=base.pad, group=base.warp_group))

    _orig = _patch(mode)
    if mode == "static_only":
        base = base.replace(train_sceneflow=False, use_mvs_dy=False)

    for chunk in chunks:
        cfg = base.replace(eval_chunk=chunk)
        system = ZestSystem(cfg)
        params = system.init_params(jax.random.PRNGKey(0), batch)
        eval_fn = system.make_eval_step()
        key = "rgb_map_ref" if cfg.train_sceneflow else "rgb_map"
        t_c0 = time.perf_counter()
        maps = eval_fn(params, batch)
        float(maps[key][0, 0, 0])               # forces compile+exec
        print(f"chunk {chunk}: first call (compile+run) "
              f"{time.perf_counter() - t_c0:.1f} s", flush=True)
        n = 3
        t0 = time.perf_counter()
        prev = 0.0
        for i in range(n):
            b2 = dict(batch)
            b2["images"] = batch["images"] + prev * 1e-6  # defeat memoization
            maps = eval_fn(params, b2)
            prev = float(maps[key][0, 0, 0]) % 1.0
        dt = (time.perf_counter() - t0) / n
        print(f"[{mode}] chunk {chunk}: {dt:.2f} s/image "
              f"({288 * 512 / dt:.0f} rays/s)", flush=True)

    if _orig is not None:
        _orig()


def main_path(n_poses=60):
    """Bullet-time throughput: pose-batched wanderpath render of one frame
    (make_eval_path_step, dispatched in PATH_BLOCK-pose blocks: volumes built
    once per block, one host fetch per block — VERDICT r3 next #4 / r4 #5).
    A single 60-pose dispatch is a ~150 s device execution and crashes the
    tunnel's TPU worker (round 5, 2/2 runs); 15-pose blocks run reliably.
    Reports s/frame and s/pose-image."""
    from zest_tpu.config import ZestConfig
    from zest_tpu.data.synthetic import SyntheticDataset
    from zest_tpu.system import ZestSystem

    cfg = ZestConfig(train_sceneflow=True, use_mvs=True, use_mvs_dy=True,
                     pad=24, num_keyframes=8, netdepth=8, netwidth=256,
                     multires=10, multires_views=4, N_samples=128,
                     batch_size=600, num_extra_samples=512,
                     use_motion_mask=True, decay_iteration=30,
                     with_chain_loss=True, pts_embedder=True,
                     dir_embedder=True, use_viewdirs=True, num_epochs=6000,
                     raw_noise_std=1.0, img_h=288, img_w=512, precision=16)
    ds = SyntheticDataset(img_h=288, img_w=512, num_frames=24, num_keyframes=8,
                          use_mvs=True, use_mvs_dy=True)
    sample = ds[21]
    batch = {k: jnp.asarray(v) for k, v in sample.items()}
    cfg = cfg.replace(warp_band=ds.warp_band_bound(pad=cfg.pad,
                                                   group=cfg.warp_group))
    system = ZestSystem(cfg)
    params = system.init_params(jax.random.PRNGKey(0), batch)
    eval_fn = system.make_eval_path_step()
    from zest_tpu.render_paths import eval_path_blocked
    key = "rgb_map_ref" if cfg.train_sceneflow else "rgb_map"
    c2ws = jnp.asarray(np.asarray(sample["wander_path_c2w"])[:n_poses])
    w2cs = jnp.asarray(np.asarray(sample["wander_path_w2c"])[:n_poses])

    t0 = time.perf_counter()
    maps = eval_path_blocked(eval_fn, params, batch, c2ws, w2cs)
    print(f"path: first frame (compile+run) {time.perf_counter() - t0:.1f} s",
          flush=True)
    n = 2
    t0 = time.perf_counter()
    prev = 0.0
    for i in range(n):
        b2 = dict(batch)
        b2["images"] = batch["images"] + prev * 1e-6   # defeat memoization
        maps = eval_path_blocked(eval_fn, params, b2, c2ws, w2cs)
        prev = float(maps[key][0, 0, 0, 0]) % 1.0  # blocks already fetched
    dt = (time.perf_counter() - t0) / n
    print(f"wanderpath: {n_poses} poses in {dt:.2f} s/frame = "
          f"{dt / n_poses:.3f} s/pose-image "
          f"({288 * 512 * n_poses / dt:.0f} rays/s)", flush=True)


if __name__ == "__main__":
    if "--ablate" in sys.argv[1:]:
        for m in ("full", "nocolor", "nomlp", "nosample", "static_only"):
            main([16384], mode=m)
            jax.clear_caches()
    elif "--path" in sys.argv[1:]:
        a = sys.argv[1:]
        i = a.index("--path")
        main_path(int(a[i + 1]) if len(a) > i + 1 else 60)
    else:
        cs = [int(a) for a in sys.argv[1:]] or [8192, 16384]
        main(cs)
