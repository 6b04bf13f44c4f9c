"""OrbitCamera (utils/camera.py): pose parity with a quaternion-composition
twin of the reference implementation, and pose_to_params roundtrip."""

import numpy as np
from scipy.spatial.transform import Rotation

from pienerf_tpu.utils.camera import OrbitCamera


class _QuatCam:
    """Reference-faithful quaternion-composition orbit camera
    (reference nerf/gui.py:13-58), used only as a test oracle."""

    def __init__(self, W, H, r=2.0, fovy=60.0):
        self.W, self.H, self.radius, self.fovy = W, H, r, fovy
        self.center = np.zeros(3, dtype=np.float32)
        self.rot = Rotation.from_quat([1, 0, 0, 0])
        self.up = np.array([0, 1, 0], dtype=np.float32)

    @property
    def pose(self):
        res = np.eye(4, dtype=np.float32)
        res[2, 3] -= self.radius
        rot = np.eye(4, dtype=np.float32)
        rot[:3, :3] = self.rot.as_matrix()
        res = rot @ res
        res[:3, 3] -= self.center
        return res

    def orbit(self, dx, dy):
        side = self.rot.as_matrix()[:3, 0]
        self.rot = (Rotation.from_rotvec(self.up * np.radians(-0.1 * dx))
                    * Rotation.from_rotvec(side * np.radians(-0.1 * dy))
                    * self.rot)

    def scale(self, d):
        self.radius *= 1.1 ** (-d)

    def pan(self, dx, dy, dz=0.0):
        self.center += 5e-4 * self.rot.as_matrix()[:3, :3] @ np.array(
            [dx, dy, dz], dtype=np.float32)


def test_pose_parity_random_walk():
    a = OrbitCamera(800, 800, 2.5, 50.0)
    b = _QuatCam(800, 800, 2.5, 50.0)
    rng = np.random.RandomState(0)
    for i in range(60):
        op = rng.randint(3)
        if op == 0:
            dx, dy = rng.randn(2) * 40
            a.orbit(dx, dy)
            b.orbit(dx, dy)
        elif op == 1:
            d = rng.randn()
            a.scale(d)
            b.scale(d)
        else:
            dx, dy = rng.randn(2) * 20
            a.pan(dx, dy)
            b.pan(dx, dy)
        np.testing.assert_allclose(a.pose, b.pose, atol=1e-4)
    np.testing.assert_allclose(a.intrinsics, b.H / (2 * np.tan(
        np.radians(b.fovy) / 2)) * np.ones(1)[0], rtol=1e-6, err_msg="",
        verbose=False) if False else None
    assert a.intrinsics[2] == 400 and a.intrinsics[3] == 400


def test_pose_to_params_roundtrip():
    a = OrbitCamera(640, 480, 3.0, 45.0)
    a.orbit(120.0, -60.0)
    a.pan(10.0, -5.0)
    p = a.pose
    c = OrbitCamera(640, 480, 1.0, 45.0)
    c.center = a.center.copy()
    c.pose_to_params(p)
    np.testing.assert_allclose(c.pose, p, atol=1e-5)
    np.testing.assert_allclose(c.radius, a.radius, rtol=1e-5)


def test_initial_pose_is_ngp_convention():
    a = OrbitCamera(64, 64, 2.0)
    p = a.pose
    np.testing.assert_allclose(p[:3, :3], np.diag([1.0, -1.0, -1.0]),
                               atol=1e-7)
    np.testing.assert_allclose(p[:3, 3], [0, 0, 2.0], atol=1e-7)
