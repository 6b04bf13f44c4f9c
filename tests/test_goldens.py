"""Golden-frame regression tests (the reference's main_render.py-style
deterministic harness — SURVEY.md §4).

Goldens are committed as small npz files rendered on CPU with fixed seeds;
regenerate deliberately with:  python tests/test_goldens.py --regen
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def _scene():
    from pienerf_tpu.models import network
    from pienerf_tpu.ops import beam_bend
    from pienerf_tpu.ops.pallas import field_kernel

    spec = network.make_spec(bound=1.0, backbone="mlp")
    params = network.init_params(jax.random.PRNGKey(42), spec)
    pw = field_kernel.pack_weights(params, spec)

    g = np.arange(-0.4, 0.41, 0.08, dtype=np.float32)
    xx, yy, zz = np.meshgrid(g, g, g, indexing="ij")
    p_ori = np.stack([xx.ravel(), yy.ravel(), zz.ravel()], 1)
    p_ori = p_ori[np.linalg.norm(p_ori, axis=1) <= 0.42]
    # deterministic non-rigid deformation: twist around y
    ang = 0.6 * p_ori[:, 1]
    ca, sa = np.cos(ang), np.sin(ang)
    p_def = np.stack([
        ca * p_ori[:, 0] + sa * p_ori[:, 2],
        p_ori[:, 1],
        -sa * p_ori[:, 0] + ca * p_ori[:, 2],
    ], 1).astype(np.float32)
    n = p_ori.shape[0]
    F = np.tile(np.eye(3, dtype=np.float32), (n, 1, 1))
    F[:, 0, 0] = ca; F[:, 0, 2] = sa
    F[:, 2, 0] = -sa; F[:, 2, 2] = ca
    dF = np.zeros((n, 3, 3, 3), np.float32)

    bst = beam_bend.BeamBendSettings(num_seek_ip=3, max_iter_num=1,
                                     ip_dx=0.085, bin_capacity=12)
    pack = beam_bend.pack_for(bst, jnp.asarray(p_def), jnp.asarray(p_ori),
                              jnp.asarray(F), jnp.asarray(dF))
    return spec, params, pw, bst, pack, jnp.asarray(p_def)


def _render_pair():
    from pienerf_tpu.render import fast, interactive

    spec, params, pw, bst, pack, p_def = _scene()
    H = W = 48
    intr = (56.0, 56.0, 24.0, 24.0)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = (0, 0, -2.5)

    # static: gather-free hierarchical renderer, fixed rng
    st = fast.FastSettings(bound=1.0, num_coarse=32, num_fine=32,
                           min_near=0.05)
    from pienerf_tpu.data.rays import get_rays_full
    ro, rd = get_rays_full(jnp.asarray(pose), intr, H, W)
    out_s = fast.render_rays_fast(params, spec, st, ro, rd, jnp.float32(1.0),
                                  jax.random.PRNGKey(7))
    img_static = np.asarray(out_s["image"]).reshape(H, W, 3)

    # deformed: interactive tile path (deterministic sampling)
    ist = interactive.InteractiveSettings(
        spec=spec, bend=bst, tile=16, samples=32, active_frac=1.0,
        tile_chunk=3, min_near=0.05)
    out_d = interactive.render_frame(ist, pw, pack, p_def, jnp.asarray(pose),
                                     intr, H, W, jnp.float32(1.0))
    img_def = interactive.tiles_to_image(out_d["tiles_image"], H, W, 16)
    return img_static, img_def


def test_golden_frames():
    path = os.path.join(GOLDEN_DIR, "frames_v1.npz")
    assert os.path.exists(path), "goldens missing; run --regen"
    img_static, img_def = _render_pair()
    g = np.load(path)
    np.testing.assert_allclose(img_static, g["static"], atol=2e-3,
                               err_msg="static golden drifted")
    np.testing.assert_allclose(img_def, g["deformed"], atol=2e-3,
                               err_msg="deformed golden drifted")


if __name__ == "__main__":
    import sys

    if "--regen" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        s, d = _render_pair()
        np.savez_compressed(os.path.join(GOLDEN_DIR, "frames_v1.npz"),
                            static=s, deformed=d)
        print("goldens written:", s.shape, d.shape,
              "static mean", s.mean(), "deformed mean", d.mean())
