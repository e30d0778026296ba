"""End-to-end harness: run_training on the synthetic dataset, checkpoint + resume,
run_test writing test_metrics.txt."""
import numpy as np
import pytest

from zest_tpu.config import ZestConfig
from zest_tpu.data.synthetic import SyntheticDataset
from zest_tpu.train_loop import run_training, run_test


def _cfg(tmp_path, **kw):
    base = dict(expname="toy", dataset_name="synthetic", save_dir=str(tmp_path),
                train_sceneflow=True, use_mvs=False, use_mvs_dy=False, pad=0,
                netdepth=4, netwidth=32, multires=4, multires_views=2,
                N_samples=8, batch_size=32, num_extra_samples=0,
                use_motion_mask=False, decay_iteration=1, with_chain_loss=False,
                pts_embedder=True, dir_embedder=True, use_viewdirs=True,
                num_epochs=2, N_vis=1, chunk=256, log_every=4,
                img_h=24, img_w=32, seed_everything=0)
    base.update(kw)
    return ZestConfig(**base)


def _datasets(splits=("train", "val")):
    mk = lambda: SyntheticDataset(img_h=24, img_w=32, num_frames=4,
                                  num_keyframes=3, use_mvs=False,
                                  use_mvs_dy=False)
    return {s: mk() for s in splits}


def test_run_training_and_resume(tmp_path):
    cfg = _cfg(tmp_path)
    state, system = run_training(cfg, max_steps=6, datasets=_datasets(),
                                 quiet=True)
    assert int(state.step) == 6
    ckpt_dir = tmp_path / "toy" / "ckpts"
    assert (ckpt_dir / "last").exists() or (ckpt_dir / "last.npz").exists()
    assert (tmp_path / "toy" / "metrics.csv").exists()

    # resume continues from step 6
    state2, _ = run_training(cfg, max_steps=8, datasets=_datasets(), quiet=True)
    assert int(state2.step) == 8


def test_run_test_writes_metrics(tmp_path):
    cfg = _cfg(tmp_path, expname="toy_test")
    out = run_test(cfg, datasets=_datasets(("test",)), quiet=True)
    assert np.isfinite(out["val_PSNR"])
    txt = (tmp_path / "toy_test" / "test_metrics.txt").read_text()
    assert "PSNR" in txt and "SSIM" in txt
