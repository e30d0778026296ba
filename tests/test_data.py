"""Data layer: synthetic schema, NSFF loader on a generated on-disk fixture,
config parsing of reference config files."""
import numpy as np
import pytest

from zest_tpu.config import ZestConfig, config_parser, parse_config_file
from zest_tpu.data.synthetic import SyntheticDataset


def test_synthetic_schema_full():
    ds = SyntheticDataset(img_h=24, img_w=32, num_frames=6, num_keyframes=3,
                          use_mvs=True, use_mvs_dy=True)
    s = ds[2]
    # keyframe count follows the reference interval rule (nsff.py:78-81)
    V = len(ds.key_frames) + 1
    assert s["images"].shape == (V, 24, 32, 3)
    assert s["proj_mats"].shape == (V, 3, 4)
    assert s["nb_imgs"].shape == (4, 24, 32, 3)
    assert s["nb_proj_mats"].shape == (4, 3, 4)
    # neighbour proj mats are identity (reference quirk, data/nsff.py:294-297)
    for pm in s["nb_proj_mats"]:
        np.testing.assert_allclose(pm, np.eye(4)[:3], atol=1e-6)
    # view 0 proj mat is identity (relative to itself)
    np.testing.assert_allclose(s["proj_mats"][0], np.eye(4)[:3], atol=1e-6)
    assert s["fnb_w2cs"].shape == (2, 4, 4)
    assert float(s["time"]) == 2.0


def _make_nsff_fixture(tmp_path, n_frames=4, H=32, W=64):
    """Write a minimal NSFF scene directory."""
    from PIL import Image
    scene = tmp_path / "toy_scene"
    (scene / "images").mkdir(parents=True)
    (scene / "disp").mkdir()
    (scene / "motion_masks").mkdir()
    (scene / "flow_i1").mkdir()
    (scene / "dense").mkdir()
    rng = np.random.default_rng(0)
    for t in range(n_frames):
        img = (rng.uniform(size=(H, W, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(scene / "images" / f"{t:05d}.png")
        np.save(scene / "disp" / f"{t:05d}.npy",
                rng.uniform(1, 2, (H, W)).astype(np.float32))
        mask = (rng.uniform(size=(H, W)) > 0.5).astype(np.uint8) * 255
        Image.fromarray(mask).save(scene / "motion_masks" / f"{t:05d}.png")
        flow = rng.normal(size=(H, W, 2)).astype(np.float32)
        fmask = np.ones((H, W), np.float32)
        np.savez(scene / "flow_i1" / f"{t:05d}_fwd.npz", flow=flow, mask=fmask)
        np.savez(scene / "flow_i1" / f"{t:05d}_bwd.npz", flow=-flow, mask=fmask)
    # poses_bounds: LLFF format [N, 17]
    pb = np.zeros((n_frames, 17))
    for t in range(n_frames):
        pose = np.eye(4)[:3]
        pose[0, 3] = 0.1 * t
        hwf = np.array([H * 4.0, W * 4.0, 100.0])
        # LLFF layout: poses[:, :15] = [3,5] with cols [down, right?...]
        m = np.concatenate([-pose[:, 1:2], pose[:, 0:1], pose[:, 2:4],
                            hwf[:, None]], 1)
        pb[t, :15] = m.reshape(-1)
        pb[t, 15:] = [2.0, 8.0]
    np.save(scene / "dense" / "poses_bounds.npy", pb)
    return tmp_path


def test_nsff_loader_on_fixture(tmp_path):
    from zest_tpu.data.nsff import NSFFDataset
    root = _make_nsff_fixture(tmp_path)
    ds = NSFFDataset(root, scene="toy_scene", use_mvs=True, use_mvs_dy=True,
                     num_keyframes=3, img_h=32, img_w=64)
    assert len(ds) == 4
    s = ds[1]
    assert s["images"].shape[0] == len(ds.key_frames["toy_scene"]) + 1
    assert s["images"].shape[1:] == (32, 64, 3)
    assert s["nb_imgs"].shape == (4, 32, 64, 3)
    assert s["flow_fwd"].shape == (32, 64, 2)
    assert s["depths"].shape == (32, 64)
    assert s["wander_path_c2w"].shape == (60, 4, 4)
    assert s["motion_count"] > 0
    # frame 0: only forward flow
    s0 = ds[0]
    np.testing.assert_allclose(s0["mask_bwd"], 0.0)
    # all finite
    for k, v in s.items():
        assert np.all(np.isfinite(np.asarray(v))), k


def test_config_parses_all_reference_configs():
    import glob
    files = glob.glob("/root/reference/configs/config_files/*.txt") + \
        glob.glob("/root/reference/configs_overfit/config_files/*.txt")
    assert len(files) > 50
    for f in files:
        cfg = config_parser(f"--config {f}")
        assert isinstance(cfg, ZestConfig)


def test_metrics_self_consistency():
    import jax.numpy as jnp
    from zest_tpu import metrics
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(size=(32, 32, 3)).astype(np.float32))
    assert float(metrics.ssim(img, img)) == pytest.approx(1.0, abs=1e-4)
    assert float(metrics.psnr(img, img)) > 60
    noisy = jnp.clip(img + 0.1, 0, 1)
    assert float(metrics.ssim(img, noisy)) < 1.0
    assert 10 < float(metrics.psnr(img, noisy)) < 30


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp
    from zest_tpu.checkpoint import CheckpointManager
    state = ({"w": jnp.arange(6.0).reshape(2, 3)}, {"m": jnp.zeros(3)},
             jnp.asarray(7))
    mgr = CheckpointManager(tmp_path / "ckpts", ZestConfig())
    mgr.save_last(state)
    assert mgr.has_last()
    restored = mgr.restore("last", state)
    np.testing.assert_allclose(np.asarray(restored[0]["w"]),
                               np.asarray(state[0]["w"]))
    assert int(restored[2]) == 7
    # top-k retention
    for i, loss in enumerate([3.0, 1.0, 2.0, 0.5, 4.0, 0.1, 5.0]):
        mgr.save_topk(state, loss, step=i)
    import json
    scores = json.loads((tmp_path / "ckpts" / "scores.json").read_text())
    assert len(scores) == 5
    assert max(scores.values()) <= 3.0  # worst two pruned
