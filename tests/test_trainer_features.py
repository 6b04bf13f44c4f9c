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


def test_ema_decay_matches_reference_epoch_cadence(tmp_path, small_scene):
    """The reference applies EMA(0.95) once per EPOCH — one step per image
    (nerf/trainer.py:512-513, provider.py:325-332) — so the per-step decay
    must be 0.95^(1/n_views). Round 3 applied 0.95 per STEP (a ~20-step
    window), which let held-out evals ride the raw Adam wander: the
    800x800 quality curve peaked at 48.6 dB and declined to 45.5
    (round-3 review weakness #2)."""
    cfg = _cfg(tmp_path / "ws_ema")
    t = Trainer("ngp", cfg, use_checkpoint="scratch", seed=0)
    assert t._ema_step_decay == 0.95           # until a dataset is seen
    t.train_iterations(small_scene, 4)
    n = len(small_scene.poses)
    assert abs(t._ema_step_decay - 0.95 ** (1.0 / n)) < 1e-12
    # ema params actually lag the raw params (long window => small pull)
    import jax
    d_ema = [float(np.max(np.abs(np.asarray(e) - np.asarray(p))))
             for e, p in zip(jax.tree_util.tree_leaves(t.state.ema_params),
                             jax.tree_util.tree_leaves(t.state.params))]
    assert max(d_ema) > 0.0, "EMA froze (decay 1.0?)"
    # after k steps from identical init, |ema - params| is bounded by the
    # largest single-step move / (1 - decay) scaling; sanity: finite
    assert np.isfinite(max(d_ema))


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


def test_scan_nan_tripwire_falls_back_to_eager(tmp_path):
    """If the runtime mis-executes the scanned chunk (non-finite losses on
    a fresh state — the legacy axon worker's failure mode, PERF.md), the
    trainer rolls the chunk back and finishes the iterations eagerly."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pienerf_tpu.config import PieNeRFConfig
    from pienerf_tpu.data import synthetic
    from pienerf_tpu.train.trainer import Trainer

    ds = synthetic.make_dataset(n_views=2, H=32, W=32, seed=0)
    cfg = PieNeRFConfig(bound=1.0, dt_gamma=0.0, iters=100, num_rays=256,
                        train_max_samples=16, min_near=0.05,
                        backbone="mlp",
                        workspace=str(tmp_path / "ws")).finalize()
    cfg.backbone = "mlp"
    tr = Trainer("ngp", cfg, use_checkpoint="scratch", seed=0)
    # train_iterations derives the per-step EMA decay from the dataset
    # length and rebuilds the chunk when it changes — trigger that now so
    # the monkeypatched chunk below survives
    tr._ensure_ema_decay(len(ds.poses))

    def bad_chunk(state, bitfield, poses, images, error_map, rng, n_steps):
        poisoned = jax.tree_util.tree_map(lambda x: x * jnp.nan,
                                          state.params)
        return (state._replace(params=poisoned), error_map,
                jnp.full((n_steps,), jnp.nan))

    tr._chunk_fn = bad_chunk
    tr._chunk_key = (ds.H, ds.W,
                     tuple(float(v) for v in ds.intrinsics), False)

    loss = tr.train_iterations(ds, 10)
    assert np.isfinite(loss), "fallback did not recover a finite loss"
    assert tr._scan_disabled
    assert tr.global_step == 10
    leaves = jax.tree_util.tree_leaves(tr.state.params)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves), (
        "poisoned state leaked through the rollback")


def test_checkpoint_guards_refuse_non_finite_state(tmp_path, small_scene):
    """A diverged run must not poison later sessions through the
    checkpoint rotation (observed round 3: a 48-dB quality run NaN'd
    mid-flight, rotation kept only NaN checkpoints, and the relaunch
    resumed from garbage — then mis-blamed the scan runtime). Three
    guards: save refuses, load refuses, and the scan tripwire raises
    instead of blaming the runtime when the incoming state is already
    non-finite."""
    import jax
    import jax.numpy as jnp

    cfg = _cfg(tmp_path / "ws_nan", backbone="mlp")
    t = Trainer("ngp", cfg, use_checkpoint="scratch", seed=0)
    t.train_iterations(small_scene, 2)
    good_path = t.save_checkpoint()
    assert good_path and np.load(good_path) is not None

    # poison the live state -> save must refuse
    t.state = t.state._replace(params=jax.tree_util.tree_map(
        lambda x: x * jnp.nan, t.state.params))
    assert t.save_checkpoint() == ""

    # hand-corrupt the good checkpoint on disk -> load must refuse
    import numpy as _np
    with _np.load(good_path) as z:
        arrs = dict(z)
    k = next(k for k in arrs if arrs[k].dtype.kind == "f")
    arrs[k] = arrs[k] * _np.nan
    _np.savez(good_path, **arrs)
    t2 = Trainer("ngp", cfg, use_checkpoint="scratch", seed=0)
    assert t2.load_checkpoint(good_path) is False
    leaves = jax.tree_util.tree_leaves(t2.state.params)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)

    # non-finite state entering the first scanned chunk -> hard error,
    # not a "runtime bug" fallback
    t2.state = t2.state._replace(params=jax.tree_util.tree_map(
        lambda x: x * jnp.nan, t2.state.params))
    with pytest.raises(RuntimeError, match="non-finite BEFORE"):
        t2.train_iterations(small_scene, 4)


def test_precision_tail_switches_to_f32(tmp_path, small_scene):
    """cfg.precision_tail_start flips the compute dtype to float32 at the
    configured step (TPU extra: counters coherent Adam drift at the bf16
    output-quantization floor — PERF.md "Training quality at scale"). The
    switch must happen exactly at the boundary, keep training finite, and
    leave f32 master params untouched in dtype."""
    import jax

    cfg = _cfg(tmp_path / "ws_tail", backbone="mlp",
               compute_dtype="bfloat16", precision_tail_start=8)
    t = Trainer("ngp", cfg, use_checkpoint="scratch", seed=0)
    assert t.spec.compute_dtype == "bfloat16"
    t.train_iterations(small_scene, 6)          # 6 < 8: still bf16
    assert t.spec.compute_dtype == "bfloat16"
    t.train_iterations(small_scene, 6)          # crosses 8 mid-call
    assert t.spec.compute_dtype == "float32"
    assert t.global_step == 12
    for leaf in jax.tree_util.tree_leaves(t.state.params):
        assert leaf.dtype == np.float32
    loss = t.train_iterations(small_scene, 2)
    assert np.isfinite(loss)
