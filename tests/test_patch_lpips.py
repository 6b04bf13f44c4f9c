"""Patch-mode ray sampling, JAX LPIPS plumbing, and eval artifacts."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pienerf_tpu.config import PieNeRFConfig
from pienerf_tpu.data import synthetic
from pienerf_tpu.data.rays import sample_patch_indices
from pienerf_tpu.train import lpips as lp
from pienerf_tpu.train.trainer import Trainer


def test_patch_indices_are_contiguous_squares():
    inds = np.asarray(sample_patch_indices(jax.random.PRNGKey(0),
                                           64, 64, 256, 8))
    assert inds.shape == (256,)          # 4 patches of 64
    for pi in range(4):
        blk = inds[pi * 64:(pi + 1) * 64]
        xs, ys = blk // 64, blk % 64
        assert xs.max() - xs.min() == 7 and ys.max() - ys.min() == 7
        # every cell of the 8x8 patch covered exactly once
        assert len(set(zip(xs.tolist(), ys.tolist()))) == 64


def _random_lpips_weights(rng):
    w = {}
    for i, (ci, co, k, _, _) in enumerate(lp._ALEX):
        w[f"conv{i}_w"] = rng.randn(co, ci, k, k).astype(np.float32) * 0.05
        w[f"conv{i}_b"] = np.zeros(co, np.float32)
        w[f"lin{i}_w"] = np.abs(rng.randn(co)).astype(np.float32)
    return w


def test_lpips_pipeline_properties():
    """With shape-correct (random) weights: zero for identical images,
    positive and symmetric for different ones, differentiable."""
    rng = np.random.RandomState(0)
    w = _random_lpips_weights(rng)
    a = jnp.asarray(rng.rand(2, 48, 48, 3), jnp.float32)
    b = jnp.asarray(rng.rand(2, 48, 48, 3), jnp.float32)
    d_aa = np.asarray(lp.lpips(a, a, w))
    d_ab = np.asarray(lp.lpips(a, b, w))
    d_ba = np.asarray(lp.lpips(b, a, w))
    assert np.allclose(d_aa, 0.0, atol=1e-6)
    assert np.all(d_ab > 0)
    np.testing.assert_allclose(d_ab, d_ba, rtol=1e-5)
    g = jax.grad(lambda x: jnp.sum(lp.lpips(x, b, w)))(a)
    assert np.all(np.isfinite(np.asarray(g)))


def test_lpips_weight_file_roundtrip(tmp_path, monkeypatch):
    rng = np.random.RandomState(1)
    w = _random_lpips_weights(rng)
    path = str(tmp_path / "lpips_alex.npz")
    np.savez(path, **w)
    monkeypatch.setenv("PIENERF_LPIPS_WEIGHTS", path)
    assert lp.available()
    w2 = lp.load_weights()
    np.testing.assert_allclose(w2["conv0_w"], w["conv0_w"])

    from pienerf_tpu.train.metrics import LPIPSMeter
    m = LPIPSMeter()
    a = rng.rand(48, 48, 3)
    m.update(a, np.clip(a + 0.1, 0, 1))
    assert "LPIPS" in m.report() and m.measure() > 0


def test_patch_training_step_runs(tmp_path, monkeypatch):
    """patch_size=8 trains MSE-only; patch_size=32 adds the LPIPS term."""
    rng = np.random.RandomState(2)
    path = str(tmp_path / "w.npz")
    np.savez(path, **_random_lpips_weights(rng))
    monkeypatch.setenv("PIENERF_LPIPS_WEIGHTS", path)

    ds = synthetic.make_dataset(n_views=2, H=48, W=48, seed=0)
    cfg = PieNeRFConfig(bound=1.0, dt_gamma=0.0, iters=20, num_rays=128,
                        max_steps=64, train_max_samples=16, backbone="mlp",
                        patch_size=8,
                        workspace=str(tmp_path / "ws")).finalize()
    trainer = Trainer("ngp", cfg, workspace=cfg.workspace)
    loss = trainer.train_iterations(ds, 3)
    assert np.isfinite(loss)

    cfg2 = PieNeRFConfig(bound=1.0, dt_gamma=0.0, iters=20, num_rays=1024,
                         max_steps=64, train_max_samples=8, backbone="mlp",
                         patch_size=32,
                         workspace=str(tmp_path / "ws2")).finalize()
    trainer2 = Trainer("ngp", cfg2, workspace=cfg2.workspace)
    loss2 = trainer2.train_iterations(ds, 2)
    assert np.isfinite(loss2)


def test_evaluate_writes_artifacts(tmp_path):
    ds = synthetic.make_dataset(n_views=2, H=32, W=32, seed=0)
    cfg = PieNeRFConfig(bound=1.0, dt_gamma=0.0, iters=20, num_rays=128,
                        max_steps=64, train_max_samples=16, backbone="mlp",
                        workspace=str(tmp_path / "ws")).finalize()
    trainer = Trainer("ngp", cfg, workspace=cfg.workspace)
    p = trainer.evaluate(ds, n_views=1)
    assert np.isfinite(p)
    vdir = os.path.join(cfg.workspace, "validation")
    pngs = os.listdir(vdir)
    assert any(f.endswith(".png") and "depth" not in f for f in pngs)
    assert any(f.endswith("_depth.png") for f in pngs)
    log = open(os.path.join(cfg.workspace, "log_ngp.txt")).read()
    assert "SSIM" in log
