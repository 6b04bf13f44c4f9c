import jax
import jax.numpy as jnp
import numpy as np

from pienerf_tpu.config import PieNeRFConfig
from pienerf_tpu.models import network
from pienerf_tpu.ops import grid as gridlib
from pienerf_tpu.render import pipeline, renderer
from pienerf_tpu.sim import solver as sim
from pienerf_tpu.train.metrics import psnr


def _coupled_scene(r0=0.45, dx=0.1):
    """Sphere radiance field + physics point cloud sampled inside it."""
    cfg = PieNeRFConfig(bound=1.0, sim_dx=dx, num_seek_IP=3, max_iter_num=2,
                        max_steps=512, train_max_samples=24,
                        min_near=0.05).finalize()
    spec = network.make_spec(bound=cfg.bound)
    params = network.init_params(jax.random.PRNGKey(0), spec)

    g = gridlib.init(cascade=1)

    def density_fn(x):
        return jnp.where(jnp.linalg.norm(x, axis=-1) <= r0, 50.0, 0.0)

    g = gridlib.update(g, density_fn, cfg.bound, density_thresh=10.0,
                       rng=jax.random.PRNGKey(1))

    # physics points: lattice inside the sphere
    c = np.arange(-r0, r0 + 1e-6, dx / 2, dtype=np.float64)
    xx, yy, zz = np.meshgrid(c, c, c, indexing="ij")
    pts = np.stack([xx.ravel(), yy.ravel(), zz.ravel()], 1)
    pts = pts[np.linalg.norm(pts, axis=1) <= r0]
    n = pts.shape[0]

    consts, state, aux = sim.sim_init(
        pos=pts, mass=np.full(n, 0.1), mu=np.full(n, 1e5),
        lam=np.full(n, 1e5), is_pin=np.zeros(n, bool),
        dt=cfg.sim_dt, iters=cfg.sim_iters,
        bbox=np.array([2.0, 2.0, 2.0]), kres=7, dx=dx,
        gravity=(0.0, 0.0, 0.0), stiff=cfg.sim_stiff,
        base=np.array([-1.0, -1.0, -1.0]),
    )
    fset = pipeline.make_frame_settings(spec, cfg, dx)
    return cfg, spec, params, g, consts, state, fset


def _rays(H=32, W=32):
    from pienerf_tpu.data.rays import get_rays_full
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = (0, 0, -2.5)
    return get_rays_full(jnp.asarray(pose), (48.0, 48.0, W / 2, H / 2), H, W), H, W


def test_frame_step_rest_matches_static():
    cfg, spec, params, g, consts, state, fset = _coupled_scene()
    (ro, rd), H, W = _rays()
    no_force = jnp.asarray(-1, jnp.int32)
    f0 = jnp.zeros(3, jnp.float32)

    state2, out = pipeline.frame_step(
        fset, consts, state, params, g.bitfield, ro, rd,
        jnp.float32(1.0), no_force, f0,
    )
    img_d = np.asarray(out["image"]).reshape(H, W, 3)

    out_s = renderer.render_rays(params, spec, fset.deformed.base,
                                 g.bitfield, ro, rd, jnp.float32(1.0))
    img_s = np.asarray(out_s["image"]).reshape(H, W, 3)

    # no gravity, no force: one sim step stays at rest -> renders must agree
    p = psnr(img_d, img_s)
    assert p > 28.0, f"coupled rest frame vs static PSNR {p}"
    # sim state stayed at rest
    assert float(jnp.abs(state2.ddof).max()) < 1e-5


def test_frame_step_force_deforms_image():
    cfg, spec, params, g, consts, state, fset = _coupled_scene()
    (ro, rd), H, W = _rays()
    f = jnp.asarray([2000.0, 0.0, 0.0], jnp.float32)
    vid = jnp.asarray(0, jnp.int32)

    s = state
    imgs = []
    for _ in range(5):
        s, out = pipeline.frame_step(fset, consts, s, params, g.bitfield,
                                     ro, rd, jnp.float32(1.0), vid, f)
        imgs.append(np.asarray(out["image"]).reshape(H, W, 3))

    assert float(jnp.abs(s.ddof).max()) > 1e-4, "force should deform the body"
    # frames stay finite and change over time
    assert np.all(np.isfinite(imgs[-1]))
    assert np.abs(imgs[-1] - imgs[0]).max() > 1e-3
