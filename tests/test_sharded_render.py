import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pienerf_tpu.models import network
from pienerf_tpu.ops import beam_bend
from pienerf_tpu.ops.pallas import field_kernel
from pienerf_tpu.parallel import sharding
from pienerf_tpu.render import interactive


def _scene(max_iter_num):
    spec = network.make_spec(bound=1.0, backbone="mlp")
    params = network.init_params(jax.random.PRNGKey(0), spec)
    pw = field_kernel.pack_weights(params, spec)

    g = np.arange(-0.4, 0.41, 0.1, dtype=np.float32)
    xx, yy, zz = np.meshgrid(g, g, g, indexing="ij")
    p = np.stack([xx.ravel(), yy.ravel(), zz.ravel()], 1)
    p = p[np.linalg.norm(p, axis=1) <= 0.42]
    n = p.shape[0]
    F = np.tile(np.eye(3, dtype=np.float32), (n, 1, 1))
    dF = np.zeros((n, 3, 3, 3), np.float32)
    bst = beam_bend.BeamBendSettings(num_seek_ip=2,
                                     max_iter_num=max_iter_num,
                                     ip_dx=0.105, bin_capacity=12)
    pack = beam_bend.pack_for(bst, jnp.asarray(p), jnp.asarray(p),
                              jnp.asarray(F), jnp.asarray(dF))
    ist = interactive.InteractiveSettings(
        spec=spec, bend=bst, tile=16, samples=24, active_frac=1.0,
        tile_chunk=4, min_near=0.05)
    return ist, pw, pack, jnp.asarray(p)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs virtual devices")
@pytest.mark.parametrize("max_iter_num", [1, 2])
def test_sharded_frame_matches_single(max_iter_num):
    """Band-sharded frame == single-device frame, through BOTH renderers:
    max_iter_num=1 routes to the fused Pallas tile kernel inside
    shard_map; max_iter_num=2 exercises the XLA beam path."""
    mesh = sharding.make_mesh(4)
    ist, pw, pack, p = _scene(max_iter_num)

    H = W = 64
    intr = (64.0, 64.0, 32.0, 32.0)
    pose_np = np.eye(4, dtype=np.float32)
    pose_np[:3, 3] = (0.0, 0.0, -2.5)
    pose = jnp.asarray(pose_np)

    render = (interactive.render_frame_fused if max_iter_num == 1
              else interactive.render_frame)
    out = render(ist, pw, pack, p, pose, intr, H, W, jnp.float32(1.0))
    img_single = interactive.tiles_to_image(out["tiles_image"], H, W, 16)

    img_sharded, drops = sharding.render_frame_sharded(
        mesh, ist, pw, pack, p, pose, intr, H, W, jnp.float32(1.0))
    assert img_sharded.shape == (H, W, 3)
    assert drops["n_tile_overflow"] == 0
    np.testing.assert_allclose(img_sharded, img_single, atol=2e-3)
