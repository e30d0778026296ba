"""Config system: the full flag surface of the reference CLI, as a typed dataclass.

Reproduces every flag of the reference parser (``/root/reference/opt.py:17-204``) with the
same names, types and defaults, and reads the reference's ``configs/config_files/*.txt``
config-file format (``key = value  # comment`` lines) without requiring configargparse.
CLI flags override config-file values, which override defaults.

Unlike the reference (a flat mutable argparse namespace with hparams injected at runtime,
e.g. ``train.py:70-73``), derived quantities (feature dims, embedder channel counts) are
explicit computed properties here.
"""
from __future__ import annotations

import argparse
import dataclasses
import shlex
from dataclasses import dataclass, field
from pathlib import Path
from typing import List, Optional


@dataclass
class ZestConfig:
    # --- experiment / data (opt.py:21-34) ---
    config: Optional[str] = None
    expname: str = "exp"
    datadir: str = "./data/llff/fern"
    configdir: str = "./configs/"
    imgScale_train: float = 1.0
    imgScale_test: float = 1.0
    img_downscale: float = 1.0
    img_h: int = 288
    img_w: int = 544
    pad: int = 24

    # --- loader options (opt.py:36-51) ---
    batch_size: int = 1024
    patch_size: int = -1
    num_extra_samples: int = 512
    num_epochs: int = 8
    pts_dim: int = 3
    dir_dim: int = 3
    num_input: int = 3
    net_type: str = "v0"
    dataset_name: str = "blender"
    crossval: str = "NSFF"
    use_color_volume: bool = False

    # --- training options (opt.py:53-94) ---
    netdepth: int = 6
    netwidth: int = 128
    netdepth_fine: int = 6
    netwidth_fine: int = 128
    chunk: int = 1024
    netchunk: int = 1024
    ckpt: Optional[str] = None
    precision: int = 32
    acc_grad: int = 1
    use_mvs: bool = False
    use_mvs_dy: bool = False
    train_video: bool = False
    use_keyframes: bool = False
    num_keyframes: int = 10
    # neural3Dvideo keyframe-only training. The reference forwards
    # hparams.key_frames to the dataset (train.py:207) but never DEFINES the
    # flag in opt.py — that path crashes with AttributeError there; defined
    # here (default off) so the dataset kwarg actually works.
    key_frames: bool = False
    frame_jump: int = 1
    train_sceneflow: bool = False
    finetune_scene: Optional[str] = None
    seed_everything: int = -1
    use_closest_views: bool = False
    use_motion_mask: bool = False

    # --- hyperparameters (opt.py:96-130) ---
    lrate: float = 5e-4
    lrate_disc: float = 1e-4
    lambda_rec: float = 200
    lambda_depth_reg: float = 0.1
    lambda_depth_smooth: float = 0.1
    lambda_distortion: float = 0.1
    lambda_perc: float = 0.1
    lambda_adv: float = 0.5
    lambda_cyc: float = 0.1
    lambda_prob_reg: float = 0.1
    lambda_sf_reg: float = 0.1
    lambda_sf_smooth: float = 0.1
    lambda_sf_depth: float = 0.04
    lambda_optical_flow: float = 0.02
    lambda_blending_reg: float = 1e-3
    time_code_dim: int = 1024
    decay_iteration: int = 50

    # --- losses (opt.py:133-156) ---
    gan_loss: Optional[str] = None  # naive | lsgan
    gan_type: Optional[str] = None  # basic | n_layers | pixel | graf
    getIntermFeat: bool = False
    with_depth_loss: bool = False
    with_depth_loss_rec: bool = False
    with_depth_loss_reg: bool = False
    with_depth_smoothness: bool = False
    with_distortion_loss: bool = False
    with_perceptual_loss: bool = False
    with_chain_loss: bool = False
    depth_path: Optional[str] = None

    # --- rendering options (opt.py:158-184) ---
    N_samples: int = 128
    # Accepted for config-file parity; the reference builds a `nerf_fine` when
    # set (train.py:143-148) but its renderer NEVER evaluates it — the fine
    # net's params are dead weight in reference checkpoints. We deliberately
    # skip allocating it (the converter drops fine-net tensors on import).
    N_importance: int = 0
    scale_anneal: float = 0.0025
    use_viewdirs: bool = False
    # CLI default True (unlike opt.py:167-170 store_true): the reference's
    # MVSNeRFSystem constructor FORCES pts_embedder=True/dir_embedder=True for
    # every training entry (train.py:58-64), so True is the effective behavior
    pts_embedder: bool = True
    dir_embedder: bool = True
    multires: int = 10
    multires_views: int = 4
    raw_noise_std: float = 0.0
    target_idx: int = 10
    white_bkgd: bool = False

    # --- logging / saving (opt.py:187-199) ---
    N_vis: int = 20
    save_dir: str = "runs"
    vis_cnn: bool = False
    save_test: str = "test_suite"
    render_wanderpath: bool = False

    # --- new (TPU framework only; no reference counterpart) ---
    mesh_shape: Optional[str] = None  # e.g. "data:8"; None = all devices on data axis
    bf16: bool = False  # compute-dtype policy for the encoder CNNs
    use_pallas_warp: bool = True  # MXU banded-matmul plane-sweep kernel
    warp_band: int = 16  # static source-row band; must cover required_band()
    warp_group: int = 4  # warp-kernel chunks-per-matmul (group·128-px chunks);
                         # the band preflight accounts for the group width
    use_pallas_trilinear: bool = True  # z-banded volume-sampling kernel
    z_band: int = 3  # depth-slice band per sample index (3 when S == n_planes)
    # scene-flow-warped sites: flows widen the per-sample z spread, so the
    # coordinate-differentiable kernel uses a wider band; runtime-guarded with
    # an exact XLA fallback when trained flows outgrow it
    z_band_warped: int = 6
    # fused NeRF-MLP Pallas kernel (trunk + heads resident in VMEM); applies
    # to v0 fields with viewdirs + volume conditioning, Flax otherwise
    use_fused_mlp: bool = True
    # training-time color-feature gather: ray-major chunking (one ray's S
    # samples per 128-lane chunk) lets the y-banded Pallas gather engage for
    # RANDOM train pixels — the band only needs to cover the per-ray epipolar
    # row drift (measured <= 10.5 rows on the flagship geometry, + 1 tap row
    # + up to 7 alignment rows). Pure reordering (identical values); runtime
    # ok-check falls back to XLA if the drift exceeds the band. Multiple of 8.
    color_band_train: int = 24
    render_path: str = "auto"  # wander | spiral | spheric (render_spiral.py)
    # rays per traced eval iteration. The reference's --chunk (1024) is a CUDA
    # memory knob; one TPU chip comfortably renders far larger batches per pass,
    # and a small chunk serializes the lax.map. 0 = use `chunk`. Swept on a
    # v5e (tools/bench_eval.py, round 3): 8192→2.81, 16384→2.65 (best),
    # 24576→2.88, 32768→3.07 s/image at 288x512.
    eval_chunk: int = 16384
    lpips_weights: Optional[str] = None  # path to LPIPS AlexNet weights (npz)
    log_every: int = 50
    steps_per_epoch: int = 0  # 0 = derive from dataset length
    max_train_steps: int = -1  # -1 = num_epochs * steps_per_epoch

    # ------------------------------------------------------------------
    # Derived quantities (reference computed these by mutating hparams).
    # ------------------------------------------------------------------
    @property
    def feat_dim(self) -> int:
        """Conditioning feature dim of the static NeRF (train.py:69-73)."""
        if self.train_sceneflow:
            return 8 + self.num_keyframes * 4
        return 8 + self.num_input * 4

    @property
    def feat_dim_dy(self) -> int:
        """Conditioning feature dim of the dynamic NeRF: 4 temporal neighbour
        frames (train.py:71)."""
        return 8 + 4 * 4

    @property
    def input_ch(self) -> int:
        """Embedded xyz channels (train.py:112-114)."""
        ch = self.pts_dim * (2 * self.multires + 1) if self.pts_embedder else self.pts_dim
        if self.train_video:
            ch += int(self.time_code_dim)
        return ch

    @property
    def input_ch_dy(self) -> int:
        """Embedded xyzt channels for the dynamic NeRF (train.py:107-109)."""
        d = self.pts_dim + 1
        return d * (2 * self.multires + 1) if self.pts_embedder else d

    @property
    def input_ch_views(self) -> int:
        """Embedded view-direction channels (train.py:115)."""
        if self.dir_embedder:
            return self.dir_dim * (2 * self.multires_views + 1)
        return self.dir_dim

    @property
    def decay_iteration_clamped(self) -> int:
        """Data-driven prior decay (train.py:77): min(decay_iteration, 250)."""
        return min(self.decay_iteration, 250)

    @property
    def img_wh(self):
        return (int(self.img_w * self.imgScale_train), int(self.img_h * self.imgScale_train))

    def replace(self, **kw) -> "ZestConfig":
        return dataclasses.replace(self, **kw)


_BOOL_FLAGS = {
    f.name
    for f in dataclasses.fields(ZestConfig)
    if f.type == "bool" or isinstance(f.default, bool)
}


def _coerce(name: str, raw: str):
    """Coerce a config-file string to the field's declared type."""
    fields = {f.name: f for f in dataclasses.fields(ZestConfig)}
    if name not in fields:
        raise KeyError(f"Unknown config key: {name!r}")
    f = fields[name]
    default = f.default
    if name in _BOOL_FLAGS:
        return raw.strip().lower() in ("true", "1", "yes")
    if isinstance(default, int) and not isinstance(default, bool):
        return int(float(raw))
    if isinstance(default, float):
        return float(raw)
    return raw


def parse_config_file(path) -> dict:
    """Parse the reference's config-file format: ``key = value  # comment`` lines.

    Matches configargparse's default behavior closely enough to run
    ``/root/reference/configs/config_files/*.txt`` unchanged.
    """
    out = {}
    for line in Path(path).read_text().splitlines():
        line = line.split("#", 1)[0].strip()
        if not line or "=" not in line:
            continue
        key, _, val = line.partition("=")
        key, val = key.strip(), val.strip()
        if not key:
            continue
        out[key] = _coerce(key, val)
    return out


def _build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="zest-tpu", allow_abbrev=False)
    for f in dataclasses.fields(ZestConfig):
        name = "--" + f.name
        if f.name in _BOOL_FLAGS:
            # reference uses store_true actions; also accept explicit =True/False
            p.add_argument(name, nargs="?", const=True, default=None,
                           type=lambda s: s.strip().lower() in ("true", "1", "yes"))
        elif isinstance(f.default, int) and not isinstance(f.default, bool):
            p.add_argument(name, type=int, default=None)
        elif isinstance(f.default, float):
            p.add_argument(name, type=float, default=None)
        else:
            p.add_argument(name, type=str, default=None)
    return p


def config_parser(cmd=None) -> ZestConfig:
    """Parse CLI (+ optional ``--config file``) into a ZestConfig.

    Mirrors the reference entry point ``opt.config_parser`` (opt.py:17-204):
    precedence is CLI > config file > defaults.
    """
    if isinstance(cmd, str):
        cmd = shlex.split(cmd)
    ns, _ = _build_argparser().parse_known_args(cmd)
    values = {}
    if ns.config:
        values.update(parse_config_file(ns.config))
        values["config"] = ns.config
    for k, v in vars(ns).items():
        if v is not None and k != "config":
            values[k] = v
    return ZestConfig(**values)
