import numpy as np
import pytest

from pienerf_tpu.config import PieNeRFConfig
from pienerf_tpu.data import synthetic
from pienerf_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def small_scene():
    return synthetic.make_dataset(n_views=4, H=32, W=32, seed=3)


def _cfg(tmp, **kw):
    base = dict(bound=1.0, dt_gamma=0.0, iters=100, num_rays=256,
                max_steps=128, train_max_samples=16, density_thresh=0.5,
                min_near=0.05, workspace=str(tmp), update_extra_interval=50)
    base.update(kw)
    return PieNeRFConfig(**base).finalize()


def test_error_map_training(tmp_path, small_scene):
    cfg = _cfg(tmp_path / "ws1", error_map=True)
    t = Trainer("ngp", cfg, use_checkpoint="scratch", seed=0)
    t.train_iterations(small_scene, 10)
    assert t.error_map is not None
    em = np.asarray(t.error_map)
    assert em.shape == (4, 128 * 128)
    # sampled cells were EMA-updated away from the initial 1.0
    assert (em != 1.0).any()
    assert np.isfinite(em).all()


def test_eager_train_fallback_matches_interface(tmp_path, small_scene,
                                                monkeypatch):
    """The hosted-tunnel eager loop (PIENERF_TRAIN_SCAN=0) must train with
    the same interface/bookkeeping as the default scanned path."""
    monkeypatch.setenv("PIENERF_TRAIN_SCAN", "0")
    cfg = _cfg(tmp_path / "ws_eager", error_map=True)
    t = Trainer("ngp", cfg, use_checkpoint="scratch", seed=0)
    loss = t.train_iterations(small_scene, 6)
    assert np.isfinite(loss)
    assert t.global_step == 6
    assert t.error_map is not None and np.isfinite(
        np.asarray(t.error_map)).all()


def test_host_resident_dataset_training(tmp_path, small_scene, monkeypatch):
    """Datasets above PIENERF_MAX_DEVICE_DATASET stay in host RAM; only the
    sampled pixels transfer per step (round-1 weakness: the whole image set
    was force-resident in HBM)."""
    monkeypatch.setenv("PIENERF_MAX_DEVICE_DATASET", "1")  # force host mode
    cfg = _cfg(tmp_path / "ws_host")
    t = Trainer("ngp", cfg, use_checkpoint="scratch", seed=0)
    loss = t.train_iterations(small_scene, 4)
    assert np.isfinite(loss)
    assert t.global_step == 4


def test_test_gui_bridge(tmp_path, small_scene):
    cfg = _cfg(tmp_path / "ws2")
    t = Trainer("ngp", cfg, use_checkpoint="scratch", seed=0)
    pose = small_scene.poses[0]
    out = t.test_gui(pose, small_scene.intrinsics, W=32, H=32,
                     downscale=0.5, max_samples=16)
    assert out["image"].shape == (16, 16, 3)
    assert np.isfinite(out["image"]).all()


def test_mesh_export_from_trainer(tmp_path, small_scene):
    cfg = _cfg(tmp_path / "ws3", backbone="mlp")
    t = Trainer("ngp", cfg, use_checkpoint="scratch", seed=0)
    t.train_iterations(small_scene, 30)
    p = t.save_point_cloud(str(tmp_path / "pc.ply"), resolution=32,
                           threshold=1.0)
    import os
    assert os.path.exists(p)
    m = t.save_mesh(str(tmp_path / "m.obj"), resolution=32, threshold=1.0)
    assert os.path.exists(m)
