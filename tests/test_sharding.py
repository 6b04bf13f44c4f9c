import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pienerf_tpu.config import PieNeRFConfig
from pienerf_tpu.models import network
from pienerf_tpu.ops import grid as gridlib
from pienerf_tpu.parallel import sharding
from pienerf_tpu.render import renderer
from pienerf_tpu.train import trainer as trainer_lib


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple (virtual) devices")
    return sharding.make_mesh()


def test_mesh_has_virtual_devices(mesh):
    assert mesh.devices.size == 8


def test_sharded_train_step_matches_single(mesh):
    cfg = PieNeRFConfig(bound=1.0, num_rays=256, max_steps=128,
                        train_max_samples=16, iters=100).finalize()
    spec = network.make_spec(bound=cfg.bound)
    params = network.init_params(jax.random.PRNGKey(0), spec)
    opt = trainer_lib.make_optimizer(cfg.lr, cfg.iters)
    st = renderer.RenderSettings(bound=1.0, cascade=1, max_samples=16,
                                 max_steps=128)
    step = trainer_lib.make_train_step(spec, st, opt)
    state = trainer_lib.TrainState(params, opt.init(params), params,
                                   jnp.zeros((), jnp.int32))
    g = gridlib.init(1)
    g = g._replace(bitfield=jnp.full_like(g.bitfield, jnp.uint32(0xFFFFFFFF)))

    key = jax.random.PRNGKey(1)
    n = 256
    ro = jnp.tile(jnp.asarray([[0.0, 0.0, -2.5]]), (n, 1))
    d = jax.random.normal(key, (n, 3)) * 0.1 + jnp.asarray([0.0, 0.0, 1.0])
    rd = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    pix = jax.random.uniform(key, (n, 3))
    batch = {"rays_o": ro, "rays_d": rd, "pixels": pix}

    # single-device result
    s1, m1 = step(state, g.bitfield, batch, jax.random.PRNGKey(2))

    # sharded result
    sstep = sharding.make_sharded_train_step(step, mesh)
    state_r = sharding.replicate(mesh, state)
    bf_r = sharding.replicate(mesh, g.bitfield)
    batch_s = sharding.shard_batch(mesh, batch)
    s8, m8 = sstep(state_r, bf_r, batch_s, jax.random.PRNGKey(2))

    np.testing.assert_allclose(float(m8["loss"]), float(m1["loss"]),
                               rtol=1e-5, atol=1e-7)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_sharded_render_matches_single(mesh):
    spec = network.make_spec(bound=1.0)
    params = network.init_params(jax.random.PRNGKey(0), spec)
    g = gridlib.init(1)
    g = g._replace(bitfield=jnp.full_like(g.bitfield, jnp.uint32(0xFFFFFFFF)))
    st = renderer.RenderSettings(bound=1.0, cascade=1, max_samples=16,
                                 max_steps=128)

    n = 512
    key = jax.random.PRNGKey(3)
    ro = jnp.tile(jnp.asarray([[0.0, 0.0, -2.5]]), (n, 1))
    d = jax.random.normal(key, (n, 3)) * 0.1 + jnp.asarray([0.0, 0.0, 1.0])
    rd = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    out1 = renderer.render_rays(params, spec, st, g.bitfield, ro, rd,
                                jnp.float32(1.0))

    from jax.sharding import NamedSharding, PartitionSpec as P
    data = NamedSharding(mesh, P("data"))
    ro_s = jax.device_put(ro, data)
    rd_s = jax.device_put(rd, data)
    out8 = renderer.render_rays(params, spec, st, g.bitfield, ro_s, rd_s,
                                jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(out8["image"]),
                               np.asarray(out1["image"]), rtol=1e-4, atol=1e-5)


def test_sharded_sim_step_matches_single(mesh):
    """IP-sharded sim (B rows split over the mesh, state replicated) must
    reproduce the single-device trajectory."""
    from pienerf_tpu.sim import solver as sim

    g = np.linspace(0.3, 0.7, 8) - 0.5
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    pos = np.stack([x.ravel(), y.ravel(), z.ravel()], 1)
    n = pos.shape[0]
    consts, state, aux = sim.sim_init(
        pos, np.full(n, 0.1), np.full(n, 1e4), np.full(n, 1e4),
        pos[:, 1] > 0.15, dt=1e-2, iters=5,
        bbox=np.array([1.0, 1.0, 1.0]), kres=4, dx=0.2,
        gravity=(0.0, -9.8, 0.0), stiff=1e5,
        base=np.array([-0.5, -0.5, -0.5]))

    ref = state
    for _ in range(4):
        ref = sim.sim_step(consts, ref)

    consts_sh, step = sharding.make_sharded_sim_step(mesh, consts)
    got = state
    for _ in range(4):
        got = step(consts_sh, got)

    # cross-device psum changes f32 summation order: ~1e-5 per step
    np.testing.assert_allclose(np.asarray(got.ddof), np.asarray(ref.ddof),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got.dof_vel),
                               np.asarray(ref.dof_vel), rtol=1e-3, atol=1e-2)
