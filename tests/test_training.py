import os

import numpy as np
import pytest

from pienerf_tpu.config import PieNeRFConfig
from pienerf_tpu.data import synthetic
from pienerf_tpu.train.metrics import PSNRMeter, SSIMMeter, psnr, ssim
from pienerf_tpu.train.trainer import Trainer


def test_psnr_ssim_basics():
    a = np.random.RandomState(0).rand(32, 32, 3)
    assert psnr(a, a) == float("inf")
    assert abs(ssim(a, a) - 1.0) < 1e-9
    b = np.clip(a + 0.1, 0, 1)
    assert 15 < psnr(a, b) < 25
    m = PSNRMeter()
    m.update(a, b)
    assert "PSNR" in m.report()


def test_synthetic_gt_consistency():
    ds = synthetic.make_dataset(n_views=2, H=32, W=32)
    assert ds.images.shape == (2, 32, 32, 3)
    assert np.all((ds.images >= 0) & (ds.images <= 1.3))
    # sphere visible: center pixels darker than bg in at least one channel
    assert ds.images[0, 16, 16].min() < 0.95


@pytest.mark.slow
def test_hard_scene_properties():
    """The 'hard' analytic scene (round-4 quality fixture) must actually be
    hard: higher image-gradient energy than the sphere (high-frequency
    texture + bump-displaced silhouettes), multi-lobe occupancy, and a
    numpy/jnp field twin that agrees (tools/quality_run.py renders GT on
    device with the jnp twin)."""
    import jax.numpy as jnp

    pose = synthetic.orbit_poses(2, seed=3)
    intr = (0.9 * 48, 0.9 * 48, 24.0, 24.0)
    hard = synthetic.render_gt(pose[0], intr, 48, 48, scene="hard")
    sph = synthetic.render_gt(pose[0], intr, 48, 48, scene="sphere")
    assert np.isfinite(hard).all()
    g_h = np.abs(np.diff(hard, axis=0)).mean()
    g_s = np.abs(np.diff(sph, axis=0)).mean()
    assert g_h > 1.3 * g_s, (g_h, g_s)

    # numpy vs jnp twin of the field itself
    xs = (np.random.RandomState(0).randn(512, 3) * 0.4).astype(np.float32)
    s_np, r_np = synthetic.scene_field("hard", xs)
    s_j, r_j = synthetic.scene_field("hard", jnp.asarray(xs), xp=jnp)
    assert np.abs(s_np - np.asarray(s_j)).max() < 1e-3
    assert np.abs(r_np - np.asarray(r_j)).max() < 1e-5

    # physics point cloud: non-empty, multi-lobe (spread exceeds any
    # single lobe's diameter), comparable to the sphere scene's count
    pts = synthetic.scene_points("hard", dx=0.05)
    assert 1500 < len(pts) < 6000
    assert (pts.max(0) - pts.min(0)).max() > 0.8


def test_end_to_end_training_fits_scene(tmp_path):
    """Train a small field on the analytic sphere and check novel-view PSNR.

    This is the pipeline-level correctness test standing in for the
    reference's (missing) tests: march -> network -> composite -> loss ->
    grads -> optimizer -> occupancy refresh, all under jit.
    """
    ds = synthetic.make_dataset(n_views=12, H=48, W=48, seed=0)
    test_ds = synthetic.make_dataset(n_views=2, H=48, W=48, seed=99)

    cfg = PieNeRFConfig(
        bound=1.0, dt_gamma=0.0, iters=300, num_rays=1024,
        max_steps=256, train_max_samples=48, density_thresh=0.5,
        min_near=0.05, workspace=str(tmp_path / "ws"),
        update_extra_interval=32,
    ).finalize()
    # keep W/H presets from interfering
    trainer = Trainer("ngp", cfg, use_checkpoint="scratch", seed=0)
    trainer.mark_untrained_grid(ds.poses, ds.intrinsics)
    trainer.train_iterations(ds, 300)

    p = trainer.evaluate(test_ds, n_views=1)
    # bar calibrated below the measured RNG-stream spread (16.8-17.6 dB
    # over seeds/sampling streams at 300 iters; an untrained field sits
    # ~6 dB lower) so the test detects pipeline breakage, not stream luck
    assert p > 16.3, f"novel-view PSNR too low: {p}"

    # checkpoint roundtrip preserves eval quality
    path = trainer.save_checkpoint()
    assert os.path.exists(path)
    t2 = Trainer("ngp", cfg, use_checkpoint="scratch", seed=1)
    ok = t2.load_checkpoint(path)
    assert ok
    p2 = t2.evaluate(test_ds, n_views=1)
    assert abs(p2 - p) < 0.2


@pytest.mark.slow
def test_longer_fit_reaches_quality_bar(tmp_path):
    """Raised-bar fit guard (round-3 item 1 follow-through): a moderate
    96x96 / 800-iter run must clear 25 dB novel-view PSNR — deep enough
    to catch a multi-dB quality regression in the renderer or optimizer
    that the 300-iter breakage detector above would miss. Context: the
    full 800x800 / 30k-iter protocol reaches ~48 dB by 4k iters
    (runs/quality_mlp_800, PERF.md quality section)."""
    ds = synthetic.make_dataset(n_views=16, H=96, W=96, seed=0)
    test_ds = synthetic.make_dataset(n_views=2, H=96, W=96, seed=77)

    cfg = PieNeRFConfig(
        bound=1.0, dt_gamma=0.0, iters=800, num_rays=2048,
        train_max_samples=64, min_near=0.05,
        workspace=str(tmp_path / "ws"),
    ).finalize()
    cfg.backbone = "mlp"
    cfg.compute_dtype = "bfloat16"
    trainer = Trainer("ngp", cfg, use_checkpoint="scratch", seed=0)
    trainer.train_iterations(ds, 800)
    p = trainer.evaluate(test_ds, n_views=2, save_images=False)
    assert p > 25.0, f"800-iter novel-view PSNR too low: {p}"
