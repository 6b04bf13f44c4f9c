import numpy as np

from pienerf_tpu.io.ply import read_ply, read_physics_ply, write_ply


def test_ply_roundtrip_binary(tmp_path):
    pts = np.random.RandomState(0).randn(100, 3)
    vp = np.random.RandomState(1).rand(100)
    p = str(tmp_path / "a.ply")
    write_ply(p, pts, vp=vp)
    out = read_ply(p)
    np.testing.assert_allclose(out["x"], pts[:, 0])
    np.testing.assert_allclose(out["y"], pts[:, 1])
    np.testing.assert_allclose(out["z"], pts[:, 2])
    np.testing.assert_allclose(out["vp"], vp)


def test_ply_roundtrip_ascii(tmp_path):
    pts = np.arange(12, dtype=np.float64).reshape(4, 3)
    p = str(tmp_path / "a.ply")
    write_ply(p, pts, binary=False, mass=np.ones(4))
    out = read_ply(p)
    np.testing.assert_allclose(out["z"], pts[:, 2])
    np.testing.assert_allclose(out["mass"], 1.0)


def test_physics_ply_full_schema(tmp_path):
    rng = np.random.RandomState(2)
    pts = rng.randn(50, 3)
    p = str(tmp_path / "phys.ply")
    write_ply(
        p, pts,
        vp=rng.rand(50), pin=(rng.rand(50) > 0.5).astype(np.float64),
        lam=np.full(50, 1e5), mu=np.full(50, 2e5), mass=np.full(50, 0.1),
    )
    d = read_physics_ply(p)
    assert d["pos"].shape == (50, 3)
    assert d["pin"].dtype == bool
    np.testing.assert_allclose(d["mu"], 2e5)


def test_physics_ply_defaults(tmp_path):
    pts = np.zeros((3, 3))
    p = str(tmp_path / "min.ply")
    write_ply(p, pts)
    d = read_physics_ply(p)
    assert (~d["pin"]).all()
    np.testing.assert_allclose(d["mass"], 1.0)
