import jax
import jax.numpy as jnp
import numpy as np

from pienerf_tpu.models import network
from pienerf_tpu.ops import bending as bend_ops
from pienerf_tpu.ops import grid as gridlib
from pienerf_tpu.ops import spatial_hash as sh
from pienerf_tpu.render import deformed, renderer
from pienerf_tpu.train.metrics import psnr


def _sphere_scene(bound=1.0, r0=0.45, dx=0.06):
    """Random network + sphere occupancy + IPs on a grid inside the sphere."""
    spec = network.make_spec(bound=bound)
    params = network.init_params(jax.random.PRNGKey(0), spec)

    g = gridlib.init(cascade=1)

    def density_fn(x):
        return jnp.where(jnp.linalg.norm(x, axis=-1) <= r0, 50.0, 0.0)

    g = gridlib.update(g, density_fn, bound, density_thresh=10.0,
                       rng=jax.random.PRNGKey(1))

    # IPs: cell centers of a dx lattice inside the sphere (+ one shell)
    n_side = int(np.ceil(2 * bound / dx))
    c = (np.arange(n_side) + 0.5) * dx - bound
    xx, yy, zz = np.meshgrid(c, c, c, indexing="ij")
    pts = np.stack([xx.ravel(), yy.ravel(), zz.ravel()], 1).astype(np.float32)
    keep = np.linalg.norm(pts, axis=1) <= r0 + dx
    p_ori = pts[keep]
    n = p_ori.shape[0]
    F = np.tile(np.eye(3, dtype=np.float32), (n, 1, 1))
    dF = np.zeros((n, 3, 3, 3), np.float32)
    return spec, params, g, p_ori, F, dF, dx


def _camera_rays(n=None, origin=(0.0, 0.0, -2.5)):
    H = W = 40
    from pienerf_tpu.data.rays import get_rays_full
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = origin
    intr = (60.0, 60.0, W / 2, H / 2)
    ro, rd = get_rays_full(jnp.asarray(pose), intr, H, W)
    return ro, rd, H, W


def _settings(dx, num_seek=3):
    base = renderer.RenderSettings(bound=1.0, cascade=1, max_samples=48,
                                   max_steps=512, min_near=0.05)
    hgs = 1.2 * dx
    layout = sh.make_layout(bound=1.0, hgs=hgs, max_per_cell=16)
    bend = bend_ops.BendSettings(num_seek_ip=num_seek, max_iter_num=2,
                                 ip_dx=1.05 * dx)
    return deformed.DeformedSettings(base=base, bend=bend, layout=layout,
                                     max_bend_samples=128)


def test_rest_pose_deformed_matches_static():
    spec, params, g, p_ori, F, dF, dx = _sphere_scene()
    ro, rd, H, W = _camera_rays()
    dst = _settings(dx)

    out_s = renderer.render_rays(params, spec, dst.base, g.bitfield,
                                 ro, rd, jnp.float32(1.0))
    out_d = deformed.render_rays_deformed(
        params, spec, dst, g.bitfield,
        jnp.asarray(p_ori), jnp.asarray(p_ori),
        jnp.asarray(F), jnp.asarray(dF),
        ro, rd, jnp.float32(1.0),
    )
    img_s = np.asarray(out_s["image"]).reshape(H, W, 3)
    img_d = np.asarray(out_d["image"]).reshape(H, W, 3)
    p = psnr(img_d, img_s)
    assert p > 30.0, f"rest-pose deformed vs static PSNR {p}"


def test_translated_object_renders_translated():
    spec, params, g, p_ori, F, dF, dx = _sphere_scene()
    dst = _settings(dx)
    c = np.array([0.25, 0.0, 0.0], np.float32)
    p_def = p_ori + c

    ro, rd, H, W = _camera_rays()
    out_d = deformed.render_rays_deformed(
        params, spec, dst, g.bitfield,
        jnp.asarray(p_def), jnp.asarray(p_ori),
        jnp.asarray(F), jnp.asarray(dF),
        ro, rd, jnp.float32(1.0),
    )
    # static render with the camera shifted by +c sees the object the same way
    ro2 = ro - jnp.asarray(c)
    out_s = renderer.render_rays(params, spec, dst.base, g.bitfield,
                                 ro2, rd, jnp.float32(1.0))
    img_d = np.asarray(out_d["image"]).reshape(H, W, 3)
    img_s = np.asarray(out_s["image"]).reshape(H, W, 3)
    p = psnr(img_d, img_s)
    assert p > 28.0, f"translated deformed render PSNR {p}"

    # and it must differ from the untranslated static render
    out_0 = renderer.render_rays(params, spec, dst.base, g.bitfield,
                                 ro, rd, jnp.float32(1.0))
    img_0 = np.asarray(out_0["image"]).reshape(H, W, 3)
    assert psnr(img_d, img_0) < p - 3.0


def test_deformed_full_image_helper():
    spec, params, g, p_ori, F, dF, dx = _sphere_scene()
    dst = _settings(dx, num_seek=1)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = (0, 0, -2.5)
    out = deformed.render_image_deformed(
        params, spec, dst, g, jnp.asarray(p_ori), jnp.asarray(p_ori),
        jnp.asarray(F), jnp.asarray(dF), pose, (60.0, 60.0, 16.0, 16.0),
        H=32, W=32, chunk=512,
    )
    assert out["image"].shape == (32, 32, 3)
    assert np.all(np.isfinite(out["image"]))
