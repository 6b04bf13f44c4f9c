import numpy as np

from pienerf_tpu.gui import (
    DynamicResolution, InteractionState, pick_ip, screen_to_world,
    spring_force,
)


def test_screen_to_world_center_pixel():
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = (0, 0, -2.0)
    intr = (100.0, 100.0, 50.0, 50.0)
    # center pixel looks straight down +z
    w = screen_to_world(49.5, 49.5, 2.0, pose, intr)
    np.testing.assert_allclose(w, [0, 0, 0], atol=1e-6)


def test_pick_ip():
    ips = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float64)
    assert pick_ip(np.array([0.05, 0, 0]), ips) == 0
    assert pick_ip(np.array([0.9, 0.05, 0]), ips) == 1
    assert pick_ip(np.array([5.0, 5.0, 5.0]), ips) == -1


def test_spring_force_clamped():
    f = spring_force(np.zeros(3), np.array([10.0, 0, 0]))
    assert np.linalg.norm(f) <= 5e5 + 1e-3
    f2 = spring_force(np.zeros(3), np.array([1e-3, 0, 0]))
    np.testing.assert_allclose(f2, [100.0, 0, 0], rtol=1e-6)


def test_dynamic_resolution_converges():
    ctrl = DynamicResolution(target_ms=80.0)
    # pretend full-res frame costs 320 ms -> ideal scale = 0.5
    for _ in range(20):
        frame_ms = 320.0 * ctrl.scale**2
        ctrl.update(frame_ms)
    assert abs(ctrl.scale - 0.5) < 0.05
    # very slow frames floor at 1/4
    for _ in range(20):
        ctrl.update(10000.0 * ctrl.scale**2)
    assert abs(ctrl.scale - 0.25) < 1e-6


def test_interaction_state_lifecycle():
    st = InteractionState()
    st.toggle_pause()
    assert st.paused
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = (0, 0, -2.0)
    intr = (100.0, 100.0, 50.0, 50.0)
    ips = np.array([[0, 0, 0.0]])
    assert st.start_drag(49.5, 49.5, 2.0, pose, intr, ips) == 0
    f = st.drag_to(60.0, 49.5, 2.0, pose, intr, ips)
    assert f[0] > 0  # dragging right pulls +x
    st.wheel(2.0)
    assert st.force_scale > 1.0
    st.release()
    assert st.force_ip == -1 and np.all(st.force == 0)
