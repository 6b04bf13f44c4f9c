import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pienerf_tpu.models import network
from pienerf_tpu.ops import beam_bend
from pienerf_tpu.render import fast, interactive
from pienerf_tpu.train.metrics import psnr

pytestmark = pytest.mark.skipif(
    jax.default_backend() == "cpu" and False, reason="")


def _ip_grid(r0=0.45, dx=0.1, shift=(0.0, 0.0, 0.0)):
    c = np.arange(-r0, r0 + 1e-6, dx, dtype=np.float32)
    xx, yy, zz = np.meshgrid(c, c, c, indexing="ij")
    p = np.stack([xx.ravel(), yy.ravel(), zz.ravel()], 1)
    p = p[np.linalg.norm(p, axis=1) <= r0 + dx / 2]
    p_ori = p
    p_def = p + np.asarray(shift, np.float32)
    n = p.shape[0]
    F = np.tile(np.eye(3, dtype=np.float32), (n, 1, 1))
    dF = np.zeros((n, 3, 3, 3), np.float32)
    return (jnp.asarray(p_def), jnp.asarray(p_ori), jnp.asarray(F),
            jnp.asarray(dF))


def test_pack_ip_data_layout():
    p_def, p_ori, F, dF = _ip_grid()
    pack = beam_bend.pack_ip_data(p_def, p_ori, F, dF)
    assert pack.shape == (p_def.shape[0], beam_bend.PACK)
    np.testing.assert_allclose(np.asarray(pack[:, :3]), np.asarray(p_def))
    np.testing.assert_allclose(np.asarray(pack[:, -1]), 1.0)
    fastp = beam_bend.pack_ip_data_fast(p_def, p_ori, F, dF)
    assert fastp.shape == (p_def.shape[0], beam_bend.PACK_FAST)
    np.testing.assert_allclose(np.asarray(fastp[:, -1]), 1.0)
    # identity F -> F^{-1} = I (row-major slots 6..14)
    np.testing.assert_allclose(
        np.asarray(fastp[0, 6:15]).reshape(3, 3), np.eye(3), atol=1e-6)


def test_fast_pack_matches_general_single_newton():
    """max_iter=1 general Newton == F^{-1}(x - p_def) fast path."""
    rng = np.random.RandomState(9)
    p_def, p_ori, F, dF = _ip_grid(shift=(0.1, 0.0, -0.05))
    n = F.shape[0]
    F = jnp.asarray(np.asarray(F) + 0.15 * rng.randn(n, 3, 3).astype(np.float32))
    dF = jnp.asarray(0.2 * rng.randn(n, 3, 3, 3).astype(np.float32))
    st = beam_bend.BeamBendSettings(num_seek_ip=2, max_iter_num=1,
                                    ip_dx=0.2, ips_per_tile=128,
                                    bin_capacity=12)
    origin = jnp.asarray([[0.0, 0.0, -2.5]])
    axis = jnp.asarray([[0.0, 0.0, 1.0]])
    t0 = jnp.asarray([1.9]); t1 = jnp.asarray([3.1])
    K = 16
    kk = (jnp.arange(K, dtype=jnp.float32) + 0.5) / K
    t = t0[:, None] + (t1 - t0)[:, None] * kk[None]
    d = jnp.asarray([[0.02, 0.01, 1.0]] * 4)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    xs = tuple(origin[0, i] + t[:, None, :] * d[None, :, i, None]
               for i in range(3))

    outs = []
    for pack_fn in (beam_bend.pack_ip_data, beam_bend.pack_ip_data_fast):
        pack = pack_fn(p_def, p_ori, F, dF)
        cand, proj, m = beam_bend.select_tile_candidates(
            st, pack, p_def, origin, axis, jnp.asarray([0.05]), t0, t1)
        bins = beam_bend.bin_candidates(st, cand, proj, m, t0,
                                        (t1 - t0) / K, K + 2)
        outs.append(beam_bend.bend_tile_samples(st, bins, xs))
    (xm_g, f_g), (xm_f, f_f) = outs
    np.testing.assert_array_equal(np.asarray(f_g), np.asarray(f_f))
    for i in range(3):
        np.testing.assert_allclose(np.asarray(xm_g[i]), np.asarray(xm_f[i]),
                                   atol=1e-5)


def test_beam_bend_identity_and_translation():
    for shift in [(0.0, 0.0, 0.0), (0.2, -0.1, 0.05)]:
        p_def, p_ori, F, dF = _ip_grid(shift=shift)
        pack = beam_bend.pack_ip_data(p_def, p_ori, F, dF)
        st = beam_bend.BeamBendSettings(num_seek_ip=3, max_iter_num=2,
                                        ip_dx=0.105, ips_per_tile=256,
                                        bin_capacity=16, beam_margin=0.12)
        C, T2, K = 1, 4, 32
        origin = jnp.asarray([[0.0, 0.0, -2.5]]) + jnp.asarray(shift)[None]
        axis = jnp.asarray([[0.0, 0.0, 1.0]])
        t0 = jnp.asarray([1.8])
        t1 = jnp.asarray([3.2])
        # narrow beam like a real 16px tile (tan_half ~ ts/fx)
        cand, proj, m = beam_bend.select_tile_candidates(
            st, pack, p_def, origin, axis, jnp.asarray([0.02]), t0, t1)
        assert int(m.sum()) > 10
        bins = beam_bend.bin_candidates(st, cand, proj, m, t0,
                                        (t1 - t0) / K, K + 2)
        # samples along near-axis rays inside the deformed object
        kk = (jnp.arange(K, dtype=jnp.float32) + 0.5) / K
        t = t0[:, None] + (t1 - t0)[:, None] * kk[None]
        d = jnp.asarray([[0.01, -0.01, 1.0]] * T2)
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        xs = tuple(origin[0, i] + t[:, None, :] * d[None, :, i, None]
                   for i in range(3))
        xm, found = beam_bend.bend_tile_samples(st, bins, xs)
        fnd = np.asarray(found)[0]
        # samples well inside the object must be found
        r = np.sqrt(sum(np.asarray(xs[i][0]) ** 2 for i in range(3)))
        inside = None
        xs_np = [np.asarray(xs[i][0]) for i in range(3)]
        r_def = np.sqrt(sum((xs_np[i] - shift[i]) ** 2 for i in range(3)))
        inside = r_def < 0.3
        assert fnd[inside].mean() > 0.95
        for i in range(3):
            got = np.asarray(xm[i][0])[fnd & inside]
            want = (xs_np[i] - shift[i])[fnd & inside]
            np.testing.assert_allclose(got, want, atol=1e-4)


def _render_frames(shift, deformed=True, backbone_seed=0,
                   cam_shift=(0.0, 0.0, 0.0)):
    spec = network.make_spec(bound=1.0, backbone="mlp")
    params = network.init_params(jax.random.PRNGKey(backbone_seed), spec)
    from pienerf_tpu.ops.pallas import field_kernel
    H = W = 64
    intr = (64.0, 64.0, W / 2, H / 2)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = np.asarray((0, 0, -2.5)) + np.asarray(cam_shift)

    p_def, p_ori, F, dF = _ip_grid(dx=0.08, shift=shift)
    pack = beam_bend.pack_ip_data(p_def, p_ori, F, dF)
    bst = beam_bend.BeamBendSettings(num_seek_ip=2, max_iter_num=2,
                                     ip_dx=0.085, ips_per_tile=192,
                                     bin_capacity=12)
    st = interactive.InteractiveSettings(
        spec=spec, bend=bst, tile=16, samples=32, active_frac=1.0,
        tile_chunk=8, min_near=0.05, deformed=deformed)
    out = interactive.render_frame(
        st, field_kernel.pack_weights(params, spec), pack, p_def,
        jnp.asarray(pose), intr, H, W, jnp.float32(1.0))
    img = interactive.tiles_to_image(out["tiles_image"], H, W, 16)
    return img, params, spec, intr, pose


def test_interactive_frame_runs_and_is_sane():
    img, params, spec, intr, pose = _render_frames((0.0, 0.0, 0.0),
                                                   deformed=False)
    assert img.shape == (64, 64, 3)
    assert np.all(np.isfinite(img))
    # a static frame marches the full [-bound, bound] box (density can be
    # anywhere; reference nears/fars vs the scene AABB) — the random field
    # must be visible somewhere
    assert np.any(np.abs(img - 1.0) > 1e-3)
    # from far enough back the corner rays MISS the scene box entirely:
    # those pixels must be exact background
    img_far, *_ = _render_frames((0.0, 0.0, 0.0), deformed=False,
                                 cam_shift=(0.0, 0.0, -3.5))
    assert abs(img_far[0, 0, 0] - 1.0) < 1e-5


def test_interactive_translation_equivariance():
    """Translating the IP cloud AND the camera by the same vector must
    reproduce the rest-pose deformed frame (the bending inverts the
    translation; the radiance field itself is queried in rest space)."""
    c = (0.2, -0.1, 0.0)
    img_rest, *_ = _render_frames((0.0, 0.0, 0.0), deformed=True)
    img_shift, *_ = _render_frames(c, deformed=True, cam_shift=c)
    p = psnr(img_shift, img_rest)
    assert p > 30.0, f"translation equivariance PSNR {p}"

    # and the shifted frame from the UNSHIFTED camera must differ
    img_other, *_ = _render_frames(c, deformed=True)
    assert psnr(img_other, img_rest) < p - 3.0


def test_exact_oracle_matches_xla_path_on_dense_cloud():
    """render_frame_exact (brute-force 3-NN over all IPs — the fidelity
    ground truth in tools/fidelity_diag.py) must closely agree with the
    binned XLA path on a dense translated cloud where the caps are not
    binding: both resolve the same nearest IPs, so the only differences
    are blend-order rounding."""
    from pienerf_tpu.ops.pallas import field_kernel
    spec = network.make_spec(bound=1.0, backbone="mlp",
                             compute_dtype="float32")
    params = network.init_params(jax.random.PRNGKey(0), spec)
    pw = field_kernel.pack_weights(params, spec)
    H = W = 64
    intr = (64.0, 64.0, W / 2, H / 2)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = (0, 0, -2.5)

    shift = (0.12, -0.05, 0.0)
    p_def, p_ori, F, dF = _ip_grid(dx=0.08, shift=shift)
    pack = beam_bend.pack_ip_data(p_def, p_ori, F, dF)
    bst = beam_bend.BeamBendSettings(num_seek_ip=3, max_iter_num=1,
                                     ip_dx=0.085, ips_per_tile=1024,
                                     bin_capacity=32)
    st = interactive.InteractiveSettings(
        spec=spec, bend=bst, tile=16, samples=32, active_frac=1.0,
        tile_chunk=4, min_near=0.05)
    out_x = interactive.render_frame(
        st, pw, pack, p_def, jnp.asarray(pose), intr, H, W,
        jnp.float32(1.0))
    out_e = interactive.render_frame_exact(
        st, pw, p_def, p_ori, F, dF, jnp.asarray(pose), intr, H, W,
        jnp.float32(1.0))
    img_x = interactive.tiles_to_image(out_x["tiles_image"], H, W, 16)
    img_e = interactive.tiles_to_image(out_e["tiles_image"], H, W, 16)
    assert np.all(np.isfinite(img_e))
    assert int(out_e["n_active"]) == int(out_x["n_active"])
    p = psnr(img_x, img_e)
    assert p > 35.0, f"exact-vs-binned PSNR {p}"
