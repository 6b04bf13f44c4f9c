import jax
import jax.numpy as jnp
import numpy as np

from pienerf_tpu.models import network
from pienerf_tpu.ops import grid as gridlib
from pienerf_tpu.render import renderer


def _setup():
    spec = network.make_spec(bound=1.0)
    params = network.init_params(jax.random.PRNGKey(0), spec)
    g = gridlib.init(cascade=1)
    # mark everything occupied so rays generate samples
    g = g._replace(bitfield=jnp.full_like(g.bitfield, jnp.uint32(0xFFFFFFFF)))
    st = renderer.RenderSettings(bound=1.0, cascade=1, max_samples=32,
                                 max_steps=256)
    return params, spec, g, st


def test_render_rays_shapes_and_ranges():
    params, spec, g, st = _setup()
    n = 64
    key = jax.random.PRNGKey(1)
    rays_o = jnp.tile(jnp.asarray([[0.0, 0.0, -2.5]]), (n, 1))
    d = jax.random.normal(key, (n, 3)) * 0.1 + jnp.asarray([0.0, 0.0, 1.0])
    rays_d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    out = renderer.render_rays(params, spec, st, g.bitfield, rays_o, rays_d,
                               jnp.float32(1.0))
    assert out["image"].shape == (n, 3)
    assert np.all(np.isfinite(np.asarray(out["image"])))
    ws = np.asarray(out["weights_sum"])
    assert np.all((ws >= 0) & (ws <= 1 + 1e-5))


def test_render_rays_miss_gives_background():
    params, spec, g, st = _setup()
    rays_o = jnp.asarray([[5.0, 5.0, 5.0]])
    rays_d = jnp.asarray([[1.0, 0.0, 0.0]])
    out = renderer.render_rays(params, spec, st, g.bitfield, rays_o, rays_d,
                               jnp.float32(0.75))
    np.testing.assert_allclose(np.asarray(out["image"][0]), 0.75, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["weights_sum"][0]), 0.0, atol=1e-7)


def test_render_rays_gradients_flow():
    params, spec, g, st = _setup()
    rays_o = jnp.tile(jnp.asarray([[0.0, 0.0, -2.5]]), (8, 1))
    rays_d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (8, 1))
    target = jnp.zeros((8, 3))

    def loss(p):
        out = renderer.render_rays(p, spec, st, g.bitfield, rays_o, rays_d,
                                   jnp.float32(1.0))
        return jnp.mean((out["image"] - target) ** 2)

    grads = jax.grad(loss)(params)
    gnorm = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0


def test_render_image_tiles_evenly_and_unevenly():
    params, spec, g, st = _setup()
    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = -2.5
    out = renderer.render_image(params, spec, st, g, pose,
                                (30.0, 30.0, 12.0, 10.0), H=20, W=24,
                                chunk=128)
    assert out["image"].shape == (20, 24, 3)
    assert np.all(np.isfinite(out["image"]))
