"""Web viewer (pienerf_tpu/web_viewer.py): scripted browser-free drive of
the HTTP surface — page, frame stream, state, input events, force pick."""

import json
import threading
import time
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np

from pienerf_tpu.models import network
from pienerf_tpu.ops import beam_bend
from pienerf_tpu.ops.pallas import field_kernel
from pienerf_tpu.render import interactive
from pienerf_tpu.sim import solver as sim
from pienerf_tpu import web_viewer


class _Cfg:
    H = W = 64
    radius = 2.5
    fovy = 60.0


def _tiny_scene():
    r0, dx = 0.45, 0.15
    c = np.arange(-r0, r0 + 1e-6, dx)
    xx, yy, zz = np.meshgrid(c, c, c, indexing="ij")
    pts = np.stack([xx.ravel(), yy.ravel(), zz.ravel()], 1)
    pts = pts[np.linalg.norm(pts, axis=1) <= r0]
    n = pts.shape[0]
    consts, state, aux = sim.sim_init(
        pts, np.full(n, 0.1), np.full(n, 1e5), np.full(n, 1e5),
        np.zeros(n, bool), dt=1e-2, iters=3,
        bbox=np.array([2.0, 2.0, 2.0]), kres=4, dx=dx,
        gravity=(0.0, 0.0, 0.0), stiff=1e5,
        base=np.array([-1.0, -1.0, -1.0]))
    spec = network.make_spec(bound=1.0, backbone="mlp")
    params = network.init_params(jax.random.PRNGKey(0), spec)
    pw = field_kernel.pack_weights(params, spec)
    bst = beam_bend.BeamBendSettings(num_seek_ip=2, max_iter_num=1,
                                     ip_dx=1.05 * dx, ips_per_tile=64)
    ist = interactive.InteractiveSettings(
        spec=spec, bend=bst, tile=16, samples=16, active_frac=1.0,
        tile_chunk=4, min_near=0.05)
    return consts, state, ist, pw


def _get(url, timeout=30):
    with urllib.request.urlopen(url, timeout=timeout) as r:
        return r.read()


def _post(url, obj, timeout=10):
    req = urllib.request.Request(url, data=json.dumps(obj).encode(),
                                 method="POST")
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.read()


def test_sim_viewer_http_roundtrip():
    consts, state, ist, pw = _tiny_scene()
    cfg = _Cfg()
    server = web_viewer.ViewerServer(64, 64, port=0).start()
    base = f"http://127.0.0.1:{server.port}"

    done = {}

    def loop():
        done["state"] = web_viewer.run_sim_viewer(
            cfg, consts, state, ist, pw, max_frames=8, server=server)

    th = threading.Thread(target=loop, daemon=True)
    th.start()
    try:
        page = _get(base + "/")
        assert b"<canvas" in page and b"/event" in page

        # queue input early (drag events are held by the loop until the
        # first depth buffer exists)
        # (no zoom before the drag: a stale depth buffer from a different
        # radius would miss the pick, as it would for a human)
        _post(base + "/event", {"t": "orbit", "dx": 30, "dy": 5})
        _post(base + "/event", {"t": "drag_start", "x": 0.5, "y": 0.5})
        _post(base + "/event", {"t": "drag", "x": 0.55, "y": 0.5})

        # wait for the first frame
        frame = _get(base + "/frame.jpg?s=0", timeout=120)
        assert frame[:2] == b"\xff\xd8", "not a JPEG"

        st = json.loads(_get(base + "/state"))
        assert st["mode"] == "sim" and "fps" in st and "drops" in st

        # poll until the render loop finishes; the drag must pick an IP at
        # some point (drag events are held until a depth buffer exists)
        picked = -1
        while th.is_alive() or picked < 0:
            st = json.loads(_get(base + "/state"))
            picked = max(picked, st.get("force_ip", -1))
            if not th.is_alive():
                break
            time.sleep(0.25)
        _post(base + "/event", {"t": "drag_end"})
        assert picked >= 0, "ctrl+drag never picked an IP"

        # pause toggles
        _post(base + "/event", {"t": "pause"})
        _post(base + "/event", {"t": "zoom", "d": 1})
    finally:
        th.join(timeout=300)
        server.close()
    assert "state" in done, "render loop died"


def test_page_and_quit():
    server = web_viewer.ViewerServer(32, 32, port=0).start()
    base = f"http://127.0.0.1:{server.port}"
    try:
        assert b"pienerf-tpu viewer" in _get(base + "/")
        _post(base + "/quit", {})
        assert server.shared.stop
    finally:
        server.close()


def test_encode_jpeg():
    img = np.random.RandomState(0).rand(32, 32, 3).astype(np.float32)
    b = web_viewer.encode_jpeg(img)
    assert b[:2] == b"\xff\xd8" and len(b) > 100


def test_train_viewer_runs_and_accumulates(tmp_path):
    """Train-while-render loop: a few bursts + spp accumulation + dataset
    pose jump through the HTTP surface. Also pins the steady-state loop
    shape (round-2 weak #7): MLP weights are re-packed only when training
    advanced the params, never once per frame."""
    from pienerf_tpu.config import PieNeRFConfig
    from pienerf_tpu.data import synthetic
    from pienerf_tpu.ops.pallas import field_kernel
    from pienerf_tpu.train.trainer import Trainer

    ds = synthetic.make_dataset(n_views=3, H=32, W=32, seed=0)
    cfg = PieNeRFConfig(bound=1.0, dt_gamma=0.0, iters=50, num_rays=128,
                        max_steps=64, train_max_samples=16, backbone="mlp",
                        workspace=str(tmp_path / "ws")).finalize()
    cfg.H = cfg.W = 32
    cfg.radius = 2.5
    cfg.fovy = 60.0
    trainer = Trainer("ngp", cfg, workspace=cfg.workspace)

    server = web_viewer.ViewerServer(32, 32, port=0).start()
    base = f"http://127.0.0.1:{server.port}"
    done = {}

    pack_calls = {"n": 0}
    real_pack = field_kernel.pack_weights

    def counting_pack(*a, **kw):
        pack_calls["n"] += 1
        return real_pack(*a, **kw)

    n_frames = 6

    def loop():
        # patch the module attribute: run_train_viewer resolves
        # field_kernel.pack_weights at call time
        field_kernel.pack_weights = counting_pack
        try:
            web_viewer.run_train_viewer(trainer, ds, max_frames=n_frames,
                                        train_budget_ms=50.0, server=server)
        finally:
            field_kernel.pack_weights = real_pack
        done["ok"] = True

    th = threading.Thread(target=loop, daemon=True)
    th.start()
    try:
        _post(base + "/event", {"t": "pose_step", "d": 1})
        frame = _get(base + "/frame.jpg?s=0", timeout=300)
        assert frame[:2] == b"\xff\xd8"
        st = json.loads(_get(base + "/state"))
        assert st["mode"] == "train"
        assert st["step"] >= 1
        assert "loss" in st and "spp" in st
    finally:
        th.join(timeout=300)
        server.close()
    assert done.get("ok")
    assert trainer.global_step > 0
    # one pack per training burst at most (plus none for pure-spp frames);
    # a regression to per-frame packing would give n == n_frames even with
    # paused training, and > n_frames generally
    assert 1 <= pack_calls["n"] <= n_frames, pack_calls
    # frame cadence is published for observability (wall-clock asserts are
    # not meaningful on a shared CI core; the structural assert above is
    # the regression guard)
    assert np.isfinite(st["fps"])
