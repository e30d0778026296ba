"""Round-3 fixes: kornia-exact SSIM (reflect-SAME, torch-oracle golden),
perceptual-loss hard gate, run_test random-init warning, warp-band preflight
user-band floor, Conv3dZ2D N==1 contract, fused-MLP approx-mode coverage,
color-gather coordinate-gradient contract."""
import warnings

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zest_tpu.config import ZestConfig
from zest_tpu import metrics


# --------------------------------------------------------------------------
# SSIM: kornia.metrics.ssim semantics (VERDICT r2 weak #8)
# --------------------------------------------------------------------------

# torch-f64 oracle value for the fixed input below, computed with an exact
# re-expression of kornia.metrics.ssim (padding='same', filter2d reflect,
# gaussian window 5, sigma 1.5) — see _kornia_ssim_torch
SSIM_GOLDEN = 0.9426351852969304


def _ssim_inputs():
    rng = np.random.default_rng(0)
    a = rng.uniform(size=(31, 47, 3))
    b = np.clip(a + 0.1 * rng.standard_normal((31, 47, 3)), 0, 1)
    return a, b


def _kornia_ssim_torch(img1, img2, ks=5, max_val=1.0):
    """Exact re-expression of kornia.metrics.ssim (kornia/metrics/ssim.py):
    gaussian window (sigma 1.5), filter2d with border_type='reflect',
    padding='same', full-size SSIM map. f64 throughout."""
    import torch
    import torch.nn.functional as F

    half = ks // 2
    coords = torch.arange(ks, dtype=torch.float64) - half
    g = torch.exp(-(coords ** 2) / (2 * 1.5 ** 2))
    g = g / g.sum()
    k = torch.outer(g, g)[None, None]
    C1 = (0.01 * max_val) ** 2
    C2 = (0.03 * max_val) ** 2

    def f2d(x):
        C = x.shape[1]
        xp = F.pad(x, (half, half, half, half), mode="reflect")
        return F.conv2d(xp, k.expand(C, 1, ks, ks), groups=C)

    mu1, mu2 = f2d(img1), f2d(img2)
    s1 = f2d(img1 ** 2) - mu1 ** 2
    s2 = f2d(img2 ** 2) - mu2 ** 2
    s12 = f2d(img1 * img2) - mu1 * mu2
    num = (2 * mu1 * mu2 + C1) * (2 * s12 + C2)
    den = (mu1 ** 2 + mu2 ** 2 + C1) * (s1 + s2 + C2)
    return (num / den).mean().item()


def test_ssim_golden_constant():
    """metrics.ssim must reproduce the checked-in kornia-semantics constant."""
    a, b = _ssim_inputs()
    got = float(metrics.ssim(jnp.asarray(a, jnp.float32),
                             jnp.asarray(b, jnp.float32), 5))
    assert abs(got - SSIM_GOLDEN) < 1e-5


def test_ssim_torch_oracle():
    """... and the constant itself must reproduce from the torch oracle."""
    torch = pytest.importorskip("torch")
    a, b = _ssim_inputs()
    ta = torch.from_numpy(a).permute(2, 0, 1)[None]
    tb = torch.from_numpy(b).permute(2, 0, 1)[None]
    oracle = _kornia_ssim_torch(ta, tb)
    assert abs(oracle - SSIM_GOLDEN) < 1e-12


def test_ssim_identical_images_is_one():
    a, _ = _ssim_inputs()
    got = float(metrics.ssim(jnp.asarray(a, jnp.float32),
                             jnp.asarray(a, jnp.float32), 5))
    assert abs(got - 1.0) < 1e-6


# --------------------------------------------------------------------------
# Loud guards (VERDICT r2 weak #6/#7)
# --------------------------------------------------------------------------

def test_perceptual_loss_without_weights_raises():
    """--with_perceptual_loss without --lpips_weights must REFUSE, not warn
    (silently training a different objective)."""
    from zest_tpu.system import ZestSystem
    from zest_tpu.system_gan import GanSystem
    cfg = ZestConfig(train_sceneflow=False, use_mvs=True, use_mvs_dy=False,
                     pad=4, num_keyframes=3, netdepth=2, netwidth=16,
                     N_samples=4, batch_size=8, gan_type="pixel",
                     with_perceptual_loss=True, lpips_weights=None)
    with pytest.raises(RuntimeError, match="perceptual"):
        GanSystem(ZestSystem(cfg))


def test_run_test_without_ckpt_warns(tmp_path, monkeypatch):
    """run_test without --ckpt evaluates random init — must be loud about it."""
    from zest_tpu import train_loop
    from zest_tpu.data.synthetic import SyntheticDataset

    cfg = ZestConfig(train_sceneflow=False, use_mvs=True, use_mvs_dy=False,
                     pad=4, num_keyframes=3, netdepth=2, netwidth=16,
                     multires=2, multires_views=2, N_samples=4, batch_size=8,
                     num_extra_samples=0, use_motion_mask=False,
                     pts_embedder=True, dir_embedder=True, use_viewdirs=True,
                     img_h=32, img_w=64, save_dir=str(tmp_path), ckpt=None)
    ds = SyntheticDataset(img_h=32, img_w=64, num_frames=6, num_keyframes=3,
                          use_mvs=True, use_mvs_dy=False, split="test")
    # stub the heavy eval — only the guard is under test
    monkeypatch.setattr(train_loop, "validate",
                        lambda *a, **k: {"val_loss": 0.0, "val_PSNR": 0.0,
                                         "val_SSIM": 0.0})
    with pytest.warns(UserWarning, match="randomly initialised"):
        train_loop.run_test(cfg, datasets={"test": ds}, quiet=True)


# --------------------------------------------------------------------------
# Warp-band preflight (ADVICE r2 #2)
# --------------------------------------------------------------------------

class _FakeDS:
    def __init__(self, bound):
        self._bound = bound

    def warp_band_bound(self, pad=24, group=1):
        return self._bound


def test_preflight_keeps_user_raised_band():
    """An explicitly raised band is a safe margin — never lowered."""
    from zest_tpu.train_loop import apply_warp_band_preflight
    cfg = ZestConfig(use_pallas_warp=True, warp_band=40)  # default is 16
    out = apply_warp_band_preflight(cfg, _FakeDS(8), verbose=False)
    assert out.warp_band == 40


def test_preflight_lowers_default_band():
    from zest_tpu.train_loop import apply_warp_band_preflight
    cfg = ZestConfig(use_pallas_warp=True)  # default band
    out = apply_warp_band_preflight(cfg, _FakeDS(8), verbose=False)
    assert out.warp_band == 8


def test_preflight_raises_any_band_to_bound():
    """Raising to the exact bound is a correctness fix — applies always."""
    from zest_tpu.train_loop import apply_warp_band_preflight
    for band in (16, 24):  # default and user-set
        cfg = ZestConfig(use_pallas_warp=True, warp_band=band)
        out = apply_warp_band_preflight(cfg, _FakeDS(32), verbose=False)
        assert out.warp_band == 32


# --------------------------------------------------------------------------
# Conv3dZ2D / _UpConvBn single-volume contract (ADVICE r2 #3)
# --------------------------------------------------------------------------

def test_conv3dz2d_rejects_batched_input():
    from zest_tpu.models.cost_reg import Conv3dZ2D
    m = Conv3dZ2D(8)
    x1 = jnp.zeros((1, 8, 8, 8, 4))
    m.init(jax.random.PRNGKey(0), x1)  # N == 1 fine
    with pytest.raises(AssertionError, match="N == 1"):
        m.init(jax.random.PRNGKey(0), jnp.zeros((2, 8, 8, 8, 4)))


def test_upconvbn_rejects_batched_input():
    from zest_tpu.models.cost_reg import _UpConvBn
    m = _UpConvBn(8)
    with pytest.raises(AssertionError, match="N == 1"):
        m.init(jax.random.PRNGKey(0), jnp.zeros((2, 4, 4, 4, 4)))


# --------------------------------------------------------------------------
# Fused-MLP approx mode (ADVICE r2 #4): wiring correctness + f32 heads
# --------------------------------------------------------------------------

@pytest.mark.parametrize("static", [True, False])
def test_fused_approx_mode_close_to_flax(static):
    """approx=True (bf16 trunk, f32-operand heads) must stay within bf16
    rounding of the f32 Flax oracle — catches head-wiring/precision bugs the
    exact-mode tests cannot see."""
    from tests.test_fused_mlp import _setup
    from zest_tpu.kernels.fused_mlp import fused_nerf_apply
    field, variables, pts, feats, views = _setup(static, width=64, depth=4,
                                                 P=33, F=24, V=15)
    with jax.default_matmul_precision("highest"):
        ref = field.apply(variables, pts, feats, views)
    out = fused_nerf_apply(field, variables, pts, feats, views, approx=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0.1, atol=0.05)
    # bounded heads (sigmoid/tanh/rgb) should be tighter than the raw trunk
    np.testing.assert_allclose(np.asarray(out[..., :3]),
                               np.asarray(ref[..., :3]), rtol=0.1, atol=0.03)


# --------------------------------------------------------------------------
# color-gather coordinate-gradient contract (ADVICE r2 #1)
# --------------------------------------------------------------------------

def test_color_gather_xy_has_no_gradient():
    """xy is stop_gradient'ed: both the kernel path and the XLA fallback must
    produce ZERO coordinate cotangents (the kernel VJP returns None for xy, so
    a differentiable fallback would silently disagree across the lax.cond)."""
    from zest_tpu.kernels.color_gather import gather_colors_banded
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(size=(16, 16, 3)).astype(np.float32))
    xy = jnp.asarray(rng.uniform(0, 15, size=(256, 2)).astype(np.float32))

    def loss(xy_):
        return jnp.sum(gather_colors_banded(img, xy_, band=8))

    g = jax.grad(loss)(xy)
    np.testing.assert_array_equal(np.asarray(g), 0.0)


# --------------------------------------------------------------------------
# In-repo flagship configs (VERDICT r2 missing #4)
# --------------------------------------------------------------------------

def test_flagship_config_parses_standalone():
    """configs/config_files/config_zest_nsff_cross1.txt must resolve through
    config_parser without the reference mount, with the flagship values."""
    from zest_tpu.config import config_parser
    cfg = config_parser(["--config",
                         "configs/config_files/config_zest_nsff_cross1.txt"])
    assert cfg.expname == "zest_nsff_cross1"
    assert cfg.dataset_name == "nsff"
    assert cfg.crossval == "NSFF_cross1"
    assert cfg.train_sceneflow and cfg.use_mvs and cfg.use_mvs_dy
    assert (cfg.num_epochs, cfg.batch_size, cfg.num_extra_samples) == \
        (6000, 600, 512)
    assert (cfg.img_h, cfg.img_w, cfg.pad, cfg.num_keyframes) == \
        (288, 512, 24, 8)
    assert cfg.raw_noise_std == 1.0 and cfg.with_chain_loss
    assert (cfg.netdepth, cfg.netwidth) == (8, 256)
    assert cfg.lambda_cyc == 1.0 and cfg.lambda_sf_depth == 0.04


def test_all_generated_configs_parse():
    """Every generated experiment config must parse cleanly."""
    import glob
    from zest_tpu.config import config_parser
    paths = sorted(glob.glob("configs/config_files/*.txt"))
    assert len(paths) == 89  # one per reference experiment config
    for p in paths:
        cfg = config_parser(["--config", p])
        assert cfg.expname


@pytest.mark.skipif(not __import__("os").path.isdir("/root/reference"),
                    reason="reference mount not present")
def test_generated_configs_match_reference_values():
    """With the reference mounted, our generated configs must produce the same
    parsed hyperparameters as the reference's config files (paths/expnames are
    repo-local by design and excluded)."""
    import os
    from zest_tpu.config import config_parser
    ref_dir = "/root/reference/configs/config_files"
    skip = {"expname", "datadir", "save_dir", "configdir", "config"}
    for fname in sorted(os.listdir(ref_dir)):
        ours = os.path.join("configs/config_files", fname)
        assert os.path.exists(ours), f"missing generated config {fname}"
        a = config_parser(["--config", ours])
        b = config_parser(["--config", os.path.join(ref_dir, fname)])
        import dataclasses
        for f in dataclasses.fields(type(a)):
            if f.name in skip:
                continue
            assert getattr(a, f.name) == getattr(b, f.name), \
                f"{fname}: field {f.name}: ours={getattr(a, f.name)!r} " \
                f"ref={getattr(b, f.name)!r}"


# --------------------------------------------------------------------------
# r-major color-feature gather (VERDICT r2 weak #4 / next #6)
# --------------------------------------------------------------------------

def _color_geometry(R=8, S=16, H=24, W=32, V=2, seed=0):
    rng = np.random.default_rng(seed)
    imgs = rng.uniform(size=(V, H, W, 3)).astype(np.float32)
    w2cs = np.tile(np.eye(4, dtype=np.float32), (V, 1, 1))
    w2cs[1, :3, 3] = [0.1, -0.05, 0.02]
    intrs = np.tile(np.array([[0.6 * W, 0, W / 2], [0, 0.6 * W, H / 2],
                              [0, 0, 1]], np.float32), (V, 1, 1))
    pts = rng.uniform(-0.5, 0.5, size=(R, S, 3)).astype(np.float32) \
        + np.array([0, 0, 3.0], np.float32)
    return jnp.asarray(pts), jnp.asarray(imgs), jnp.asarray(w2cs), \
        jnp.asarray(intrs)


def test_color_features_r_major_matches_s_major():
    """Chunk layout is a pure reordering — identical output values."""
    from zest_tpu import render
    pts, imgs, w2cs, intrs = _color_geometry()
    a = render.build_color_features(pts, imgs, w2cs, intrs, order="s_major")
    b = render.build_color_features(pts, imgs, w2cs, intrs, order="r_major",
                                    band=24)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-6)


def test_r_major_band_holds_for_random_pixels():
    """The point of r-major chunking: with RANDOM train pixels and S=128, the
    per-chunk row spread is the per-ray epipolar drift — the banded kernel's
    ok-predicate must hold (sample-major provably fails on the same rays)."""
    from zest_tpu import geometry
    from zest_tpu.kernels.color_gather import _precompute
    R, S, H, W = 16, 128, 288, 512
    rng = np.random.default_rng(3)
    # realistic forward-facing geometry: small camera offset, f = 0.8 W
    w2c = np.eye(4, dtype=np.float32)
    w2c[:3, 3] = [0.15, -0.1, 0.05]
    intr = np.array([[0.8 * W, 0, W / 2], [0, 0.8 * W, H / 2], [0, 0, 1]],
                    np.float32)
    c2w_tgt = np.eye(4, dtype=np.float32)
    # rays through random pixels of the TARGET camera, samples z in [2, 6]
    xs = rng.integers(0, W, R).astype(np.float32)
    ys = rng.integers(0, H, R).astype(np.float32)
    dirs = np.stack([(xs - W / 2) / (0.8 * W), (ys - H / 2) / (0.8 * W),
                     np.ones_like(xs)], -1)
    z = np.linspace(2.0, 6.0, S, dtype=np.float32)
    pts = dirs[:, None, :] * z[None, :, None]                   # [R, S, 3]
    inv_scale = jnp.array([W - 1, H - 1], jnp.float32)
    ndc = geometry.world_to_ndc(jnp.asarray(pts), jnp.asarray(w2c),
                                jnp.asarray(intr), inv_scale, near=2.0,
                                far=6.0, pad=0)
    xy_r = (ndc[..., :2] * inv_scale).reshape(-1, 2)            # r-major
    xy_s = (ndc[..., :2] * inv_scale).transpose(1, 0, 2).reshape(-1, 2)
    *_a, ok_r = _precompute(xy_r, H, W, band=48)
    *_b, ok_s = _precompute(xy_s, H, W, band=48)
    assert bool(ok_r), "r-major epipolar band must hold for random pixels"
    assert not bool(ok_s), "sanity: sample-major must fail on random pixels"


# --------------------------------------------------------------------------
# octo-paired trilinear gather (warped-sites XLA fallback, VERDICT r2 next #1)
# --------------------------------------------------------------------------

def test_grid_sample_3d_paired_matches_reference():
    """One-wide-gather formulation must match grid_sample_3d exactly,
    INCLUDING out-of-bounds coords (flow-warped points leave the volume; the
    floor = -1 case needs the leading zero slab) and coordinate/volume grads."""
    from zest_tpu.ops.grid_sample import grid_sample_3d, grid_sample_3d_paired
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.normal(size=(6, 7, 9, 4)).astype(np.float32))
    # cover interior, borders, just-outside (floor -1), and far-outside
    g_in = rng.uniform(-1, 1, size=(64, 5, 3))
    g_edge = rng.uniform(-1.3, -0.9, size=(32, 5, 3))
    g_far = rng.uniform(1.0, 2.5, size=(16, 5, 3)) * rng.choice([-1, 1], (16, 5, 3))
    grid = jnp.asarray(np.concatenate([g_in, g_edge, g_far]).astype(np.float32))

    want = grid_sample_3d(vol, grid, padding_mode="zeros")
    got = grid_sample_3d_paired(vol, grid)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6,
                               atol=1e-6)

    g_out = jnp.asarray(rng.normal(size=want.shape).astype(np.float32))

    def loss_ref(v, g):
        return jnp.vdot(grid_sample_3d(v, g, padding_mode="zeros"), g_out)

    def loss_pair(v, g):
        return jnp.vdot(grid_sample_3d_paired(v, g), g_out)

    gr = jax.grad(loss_ref, argnums=(0, 1))(vol, grid)
    gp = jax.grad(loss_pair, argnums=(0, 1))(vol, grid)
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gr[0]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gr[1]),
                               rtol=1e-5, atol=1e-5)


# --------------------------------------------------------------------------
# warped-sites band flip (VERDICT r2 next #3)
# --------------------------------------------------------------------------

def test_warped_band_flips_with_flow_magnitude():
    """The coordinate-differentiable trilinear kernel's z-band predicate must
    HOLD for converged-scale flows (~1e-2 NDC) and FAIL for saturated init
    flows (|sf| -> 1) — the lax.cond branch selection the trained-regime bench
    relies on (tools/bench_trained_regime.py)."""
    from zest_tpu.kernels.trilinear import _precompute
    rng = np.random.default_rng(0)
    R, S, D, Hv, Wv = 64, 128, 128, 120, 176
    z = (np.linspace(0, 1, S)[None, :]
         + rng.uniform(0, 1.0 / S, (R, S))).clip(0, 1)
    ndc = np.stack([rng.uniform(0, 1, (R, S)), rng.uniform(0, 1, (R, S)), z],
                   -1).astype(np.float32)
    flow = np.tanh(rng.normal(size=(R, S, 3))).astype(np.float32)

    for scale, expect in [(0.01, True), (1.0, False)]:
        warped = jnp.asarray(ndc + scale * flow)
        *_x, ok = _precompute(warped, D, Hv, Wv, band=6)
        assert bool(ok) == expect, (scale, bool(ok))
