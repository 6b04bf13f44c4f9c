import jax
import jax.numpy as jnp
import numpy as np

from pienerf_tpu.config import PieNeRFConfig
from pienerf_tpu.io.ply import read_ply
from pienerf_tpu.models import network
from pienerf_tpu.sample import AdaptiveUniformSampling
from pienerf_tpu.utils import mesh


def _sphere_density(x, r0=0.5, sigma0=300.0):
    r = np.linalg.norm(np.asarray(x), axis=-1)
    return np.where(r <= r0, sigma0, 0.0)


def test_marching_tetrahedra_sphere():
    res = 48
    lin = np.linspace(-1, 1, res)
    gx, gy, gz = np.meshgrid(lin, lin, lin, indexing="ij")
    field = _sphere_density(np.stack([gx, gy, gz], -1), r0=0.5)
    verts, tris = mesh.marching_tetrahedra(field, threshold=10.0, bound=1.0)
    assert len(verts) > 100
    r = np.linalg.norm(verts, axis=1)
    assert abs(np.median(r) - 0.5) < 0.05
    assert tris.max() == len(verts) - 1


def test_extract_point_cloud():
    pts = mesh.extract_point_cloud(lambda x: _sphere_density(x),
                                   resolution=48, bound=1.0, threshold=10.0)
    assert len(pts) > 100
    assert np.linalg.norm(pts, axis=1).max() <= 0.55


def test_adaptive_sampler_on_trained_stub(tmp_path):
    """Sampler machinery on a random-init mlp field (geometric sanity via a
    sharply-thresholded density is not possible without training, so check
    the plumbing: shapes, volumes, ply output)."""
    cfg = PieNeRFConfig(bound=1.0, sub_res=24, density_threshold=0.0001,
                        sub_coeff=0.1, sim_dx=0.05).finalize()
    spec = network.make_spec(bound=1.0, backbone="mlp")
    params = network.init_params(jax.random.PRNGKey(0), spec)
    sampler = AdaptiveUniformSampling(cfg, params, spec)
    out_path = str(tmp_path / "cloud.ply")
    res = sampler.sample(write_path=out_path)
    assert res["points"].shape[0] > 0
    assert res["volumes"].shape[0] == res["points"].shape[0]
    assert np.all(res["volumes"] > 0)
    d = read_ply(out_path)
    assert d["x"].shape[0] == res["points"].shape[0]
    assert "vp" in d
