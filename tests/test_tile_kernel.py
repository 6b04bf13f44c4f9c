"""Fused tile kernel (ops/pallas/tile_kernel.py) — correctness on the
interpret path + capacity-drop observability (VERDICT round-1 item 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pienerf_tpu.models import network
from pienerf_tpu.ops import beam_bend
from pienerf_tpu.ops.pallas import field_kernel, tile_kernel
from pienerf_tpu.render import interactive
from pienerf_tpu.train.metrics import psnr


def _ip_grid(r0=0.45, dx=0.1, shift=(0.0, 0.0, 0.0)):
    c = np.arange(-r0, r0 + 1e-6, dx, dtype=np.float32)
    xx, yy, zz = np.meshgrid(c, c, c, indexing="ij")
    p = np.stack([xx.ravel(), yy.ravel(), zz.ravel()], 1)
    p = p[np.linalg.norm(p, axis=1) <= r0 + dx / 2]
    n = p.shape[0]
    F = np.tile(np.eye(3, dtype=np.float32), (n, 1, 1))
    dF = np.zeros((n, 3, 3, 3), np.float32)
    return (jnp.asarray(p + np.asarray(shift, np.float32)), jnp.asarray(p),
            jnp.asarray(F), jnp.asarray(dF))


def _settings(dx=0.1, seek=3, P=192, deformed=True, samples=32):
    spec = network.make_spec(bound=1.0, backbone="mlp")
    params = network.init_params(jax.random.PRNGKey(0), spec)
    pw = field_kernel.pack_weights(params, spec)
    bst = beam_bend.BeamBendSettings(num_seek_ip=seek, max_iter_num=1,
                                     ip_dx=1.05 * dx, ips_per_tile=P)
    ist = interactive.InteractiveSettings(
        spec=spec, bend=bst, tile=16, samples=samples, active_frac=1.0,
        tile_chunk=4, min_near=0.05, deformed=deformed)
    return ist, pw


def _pose(cam_shift=(0.0, 0.0, 0.0)):
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = np.asarray((0.0, 0.0, -2.5)) + np.asarray(cam_shift)
    return jnp.asarray(pose)


def test_prep_candidates_sorted_and_binned():
    p_def, p_ori, F, dF = _ip_grid()
    pack = beam_bend.pack_ip_data_fast(p_def, p_ori, F, dF)
    A, P, nb = 3, 64, 34
    origin = jnp.tile(jnp.asarray([[0.0, 0.0, -2.5]]), (A, 1))
    axis = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (A, 1))
    cand, bs, nd, t0e, t1e = tile_kernel.prep_candidates(
        pack, p_def, origin, axis, jnp.full((A,), 0.02),
        jnp.full((A,), 1.5), jnp.full((A,), 3.5),
        n_cand=P, n_bins=nb, beam_margin=0.08)
    np.testing.assert_allclose(np.asarray(t0e), 1.5)   # margin 0: unchanged
    np.testing.assert_allclose(np.asarray(t1e), 3.5)
    assert cand.shape == (A, P, 16) and bs.shape == (A, nb + 2)
    # depth-sorted: valid rows have non-decreasing projection
    proj = np.asarray(jnp.einsum("apd,ad->ap", cand[..., :3] - origin[:, None],
                                 axis))
    valid = np.asarray(cand[..., 15]) > 0
    for a in range(A):
        pv = proj[a][valid[a]]
        assert np.all(np.diff(pv) >= -1e-6)
        # bin_start is a monotone prefix count ending at the valid count
        b = np.asarray(bs[a])
        assert np.all(np.diff(b) >= 0)
        assert b[-1] == valid[a].sum()


def test_prep_candidates_approx_topk_contract():
    """approx_topk keeps the output contract (depth-sorted valid-first,
    monotone prefix counts); on CPU lax.approx_max_k is exact, so the
    result must equal the exact path bit-for-bit there."""
    p_def, p_ori, F, dF = _ip_grid()
    pack = beam_bend.pack_ip_data_fast(p_def, p_ori, F, dF)
    A, P, nb = 3, 64, 34
    origin = jnp.tile(jnp.asarray([[0.0, 0.0, -2.5]]), (A, 1))
    axis = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (A, 1))
    args = (pack, p_def, origin, axis, jnp.full((A,), 0.02),
            jnp.full((A,), 1.5), jnp.full((A,), 3.5))
    kw = dict(n_cand=P, n_bins=nb, beam_margin=0.08)
    cand_a, bs_a, nd_a, *_ = tile_kernel.prep_candidates(
        *args, approx_topk=True, **kw)
    cand_e, bs_e, nd_e, *_ = tile_kernel.prep_candidates(*args, **kw)
    proj = np.asarray(jnp.einsum(
        "apd,ad->ap", cand_a[..., :3] - origin[:, None], axis))
    valid = np.asarray(cand_a[..., 15]) > 0
    for a in range(A):
        assert np.all(np.diff(proj[a][valid[a]]) >= -1e-6)
        assert np.all(np.diff(np.asarray(bs_a[a])) >= 0)
    if jax.default_backend() == "cpu":
        np.testing.assert_array_equal(np.asarray(cand_a),
                                      np.asarray(cand_e))
        np.testing.assert_array_equal(np.asarray(bs_a), np.asarray(bs_e))


def test_fused_static_matches_xla_path():
    """deformed=False: identical sampling/MLP/composite math -> the fused
    kernel must reproduce the round-1 XLA path almost exactly."""
    ist, pw = _settings(deformed=False)
    p_def, p_ori, F, dF = _ip_grid()
    pack_f = beam_bend.pack_ip_data_fast(p_def, p_ori, F, dF)
    pack_g = beam_bend.pack_ip_data(p_def, p_ori, F, dF)
    H = W = 64
    intr = (64.0, 64.0, W / 2, H / 2)
    out_old = interactive.render_frame(ist, pw, pack_g, p_def, _pose(), intr,
                                       H, W, jnp.float32(1.0))
    out_new = interactive.render_frame_fused(ist, pw, pack_f, p_def, _pose(),
                                             intr, H, W, jnp.float32(1.0))
    img_o = interactive.tiles_to_image(np.asarray(out_old["tiles_image"]),
                                       H, W, 16)
    img_n = interactive.tiles_to_image(np.asarray(out_new["tiles_image"]),
                                       H, W, 16)
    np.testing.assert_allclose(img_n, img_o, atol=5e-3)
    assert int(out_new["n_active"]) == int(out_old["n_active"])


def test_fused_translation_equivariance():
    """Translating the IP cloud AND the camera by the same vector must
    reproduce the rest-pose deformed frame (same property as the XLA-path
    test; the bending inverts the translation)."""
    c = (0.2, -0.1, 0.0)
    H = W = 64
    intr = (64.0, 64.0, W / 2, H / 2)
    ist, pw = _settings(dx=0.08, seek=2)

    def render(shift, cam_shift):
        p_def, p_ori, F, dF = _ip_grid(dx=0.08, shift=shift)
        pack = beam_bend.pack_ip_data_fast(p_def, p_ori, F, dF)
        out = interactive.render_frame_fused(
            ist, pw, pack, p_def, _pose(cam_shift), intr, H, W,
            jnp.float32(1.0))
        return interactive.tiles_to_image(np.asarray(out["tiles_image"]),
                                          H, W, 16)

    img_rest = render((0.0, 0.0, 0.0), (0.0, 0.0, 0.0))
    img_shift = render(c, c)
    p = psnr(img_shift, img_rest)
    assert p > 30.0, f"translation equivariance PSNR {p}"
    img_other = render(c, (0.0, 0.0, 0.0))
    assert psnr(img_other, img_rest) < p - 3.0


def test_capacity_overflow_is_counted_not_silent():
    """Adversarial densities must show up in the drop counters (round-1
    verdict: 'nothing counts or reports overflow')."""
    # beam capacity: P tiny vs a dense cloud
    ist, pw = _settings(dx=0.05, P=16)
    p_def, p_ori, F, dF = _ip_grid(dx=0.05)
    pack = beam_bend.pack_ip_data_fast(p_def, p_ori, F, dF)
    H = W = 32
    intr = (64.0, 64.0, W / 2, H / 2)
    out = interactive.render_frame_fused(ist, pw, pack, p_def, _pose(), intr,
                                         H, W, jnp.float32(1.0))
    assert int(out["dropped_beam"]) > 0
    assert np.all(np.isfinite(np.asarray(out["tiles_image"])))

    # window capacity: >Wn IPs packed into a few depth bins (long focal so
    # the tile beams are narrow and the depth bins line up with sample t)
    rng = np.random.RandomState(0)
    n = 200
    p = (0.01 * rng.randn(n, 3)).astype(np.float32)
    Fi = np.tile(np.eye(3, dtype=np.float32), (n, 1, 1))
    dFi = np.zeros((n, 3, 3, 3), np.float32)
    pack2 = beam_bend.pack_ip_data_fast(
        jnp.asarray(p), jnp.asarray(p), jnp.asarray(Fi), jnp.asarray(dFi))
    ist2, pw2 = _settings(dx=0.05, P=256)
    intr_long = (256.0, 256.0, W / 2, H / 2)
    out2 = interactive.render_frame_fused(
        ist2, pw2, pack2, jnp.asarray(p), _pose(), intr_long, H, W,
        jnp.float32(1.0))
    assert int(out2["dropped_window"]) + int(out2["dropped_beam"]) > 0
    assert np.all(np.isfinite(np.asarray(out2["tiles_image"])))


def test_tile_overflow_counted():
    """active_frac too small for the scene -> overflow tiles reported."""
    ist, pw = _settings(dx=0.1)
    ist = ist._replace(active_frac=0.1, tile_chunk=1)
    p_def, p_ori, F, dF = _ip_grid(dx=0.1)
    pack = beam_bend.pack_ip_data_fast(p_def, p_ori, F, dF)
    H = W = 64
    intr = (64.0, 64.0, W / 2, H / 2)
    out = interactive.render_frame_fused(ist, pw, pack, p_def, _pose(), intr,
                                         H, W, jnp.float32(1.0))
    assert int(out["n_tile_overflow"]) > 0


def _gate_scene():
    """Bbox-corner-heavy gating scene: a thin diagonal rod whose bbox is
    a large cube, so many bbox-hitting tiles have zero beam candidates."""
    n = 24
    tt = np.linspace(-0.45, 0.45, n).astype(np.float32)
    p = np.stack([tt, tt, tt], 1)
    F = np.tile(np.eye(3, dtype=np.float32), (n, 1, 1))
    dF = np.zeros((n, 3, 3, 3), np.float32)
    p_def = jnp.asarray(p)
    pack_f = beam_bend.pack_ip_data_fast(p_def, p_def, jnp.asarray(F),
                                         jnp.asarray(dF))
    pack_g = beam_bend.pack_ip_data(p_def, p_def, jnp.asarray(F),
                                    jnp.asarray(dF))
    ist, pw = _settings(dx=0.08, samples=16)
    ist = ist._replace(tile_chunk=2)
    H = W = 96
    intr = (96.0, 96.0, W / 2, H / 2)
    args = (_pose(), intr, H, W, jnp.float32(1.0))
    return p_def, F, dF, pack_f, pack_g, ist, pw, args


def _assert_gate_lossless(fn, ist, pw, pk, p_def, args, label):
    out_g = fn(ist._replace(gate_tiles=True), pw, pk, p_def, *args)
    out_u = fn(ist._replace(gate_tiles=False), pw, pk, p_def, *args)
    assert int(out_g["n_active"]) < int(out_u["n_active"]), label
    assert int(out_g["n_active"]) > 0, label
    np.testing.assert_array_equal(
        np.asarray(out_g["tiles_image"]), np.asarray(out_u["tiles_image"]),
        err_msg=f"{label} frame changed under gating")
    np.testing.assert_array_equal(
        np.asarray(out_g["tiles_ws"]), np.asarray(out_u["tiles_ws"]),
        err_msg=f"{label} ws changed under gating")


def test_gated_out_tiles_render_as_background():
    """Fast-tier arm of the gate_tiles losslessness contract, one compile:
    render UNGATED once, recompute the gate mask the renderer uses, and
    assert every tile the gate would drop composited to pure background
    (ws == 0) — which is exactly why dropping it is lossless. Also checks
    the gate actually bites on this bbox-corner-heavy scene. The on/off
    bit-identity twins (xla/fused/exact) run in the full tier."""
    p_def, F, dF, pack_f, pack_g, ist, pw, args = _gate_scene()
    pose, intr, H, W, bg = args
    out = interactive.render_frame(
        ist._replace(gate_tiles=False), pw, pack_g, p_def, *args)

    n_tiles = (H // ist.tile) * (W // ist.tile)
    tids = jnp.arange(n_tiles, dtype=jnp.int32)
    o, d_all = interactive._tile_rays(tids, ist, H, W, pose, intr)
    marg = 1e-3
    bbmin = jnp.min(p_def, axis=0) - marg
    bbmax = jnp.max(p_def, axis=0) + marg
    near_all, far_all = interactive._near_far(o, d_all, bbmin, bbmax,
                                              ist.min_near)
    hit = jnp.any(near_all < 1e30, axis=1)
    gate = interactive._tiles_with_candidates(
        ist, p_def, o, d_all, near_all, far_all, hit, intr)
    dropped = np.asarray(hit & ~gate)
    assert dropped.sum() > 0          # the gate bites
    assert int(np.asarray(hit & gate).sum()) > 0
    ws = np.asarray(out["tiles_ws"])
    im = np.asarray(out["tiles_image"])
    np.testing.assert_array_equal(ws[dropped], 0.0,
                                  err_msg="gated-out tile had coverage")
    np.testing.assert_array_equal(im[dropped], float(bg),
                                  err_msg="gated-out tile not background")


def test_candidate_gated_tile_activity_is_lossless_fused_exact():
    """Full-tier arms of the gating losslessness contract: bit-identical
    frames with gating on/off on the XLA, fused-Pallas, and exact-oracle
    paths, with act_n strictly shrinking."""
    p_def, F, dF, pack_f, pack_g, ist, pw, args = _gate_scene()
    _assert_gate_lossless(interactive.render_frame, ist, pw, pack_g,
                          p_def, args, "xla")
    _assert_gate_lossless(interactive.render_frame_fused, ist, pw, pack_f,
                          p_def, args, "fused")

    out_g = interactive.render_frame_exact(
        ist._replace(gate_tiles=True), pw, p_def, p_def, jnp.asarray(F),
        jnp.asarray(dF), *args)
    out_u = interactive.render_frame_exact(
        ist._replace(gate_tiles=False), pw, p_def, p_def, jnp.asarray(F),
        jnp.asarray(dF), *args)
    assert int(out_g["n_active"]) < int(out_u["n_active"])
    np.testing.assert_array_equal(
        np.asarray(out_g["tiles_image"]), np.asarray(out_u["tiles_image"]),
        err_msg="exact-oracle frame changed under gating")


def test_cut_split_matches_single_pass():
    """cut_split (round-5): the two-class cut frame (bend tiles = rays
    intersect cut_bounds; static tiles = bend-free kernel) must reproduce
    the single-pass cut frame exactly — the partition is positional, not
    approximate. The IP cloud sits off-center so plenty of tiles are
    static-only."""
    p_def, p_ori, F, dF = _ip_grid(r0=0.3, dx=0.08, shift=(0.45, 0.0, 0.0))
    # rest cloud must sit inside the cut box too (bent lookups)
    p_ori = p_def
    pack = beam_bend.pack_ip_data_fast(p_def, p_ori, F, dF)
    ist, pw = _settings(dx=0.08, seek=1, samples=16)
    ist = ist._replace(cut=True, bound=1.0, tile_chunk=2)
    cb = jnp.asarray([0.05, 0.85, -0.4, 0.4, -0.4, 0.4], jnp.float32)
    H = W = 64  # 16 tiles — enough for both classes; keeps the fast tier fast
    intr = (64.0, 64.0, W / 2, H / 2)
    args = (_pose(), intr, H, W, jnp.float32(1.0))

    out_s = interactive.render_frame_fused(
        ist._replace(cut_split=True), pw, pack, p_def, *args,
        cut_bounds=cb)
    out_1 = interactive.render_frame_fused(
        ist._replace(cut_split=False), pw, pack, p_def, *args,
        cut_bounds=cb)
    # the split must partition, not relabel: same total active count
    assert int(out_s["n_active"]) == int(out_1["n_active"]) > 0
    # both classes must be populated for the test to mean anything —
    # recompute the classifier the split uses
    n_tiles = (H // 16) * (W // 16)
    tids = jnp.arange(n_tiles, dtype=jnp.int32)
    o, d_all = interactive._tile_rays(tids, ist, H, W, _pose(), intr)
    cmin = jnp.stack([cb[0], cb[2], cb[4]])
    cmax = jnp.stack([cb[1], cb[3], cb[5]])
    cnear, _ = interactive._near_far(o, d_all, cmin, cmax, ist.min_near)
    n_bend = int(jnp.sum(jnp.any(cnear < 1e30, axis=1)))
    assert 0 < n_bend < int(out_1["n_active"]), n_bend
    np.testing.assert_array_equal(
        np.asarray(out_s["tiles_image"]), np.asarray(out_1["tiles_image"]),
        err_msg="cut-split changed the frame")
    np.testing.assert_array_equal(
        np.asarray(out_s["tiles_ws"]), np.asarray(out_1["tiles_ws"]))
    assert int(out_s["n_tile_overflow"]) == 0


def test_cut_static_cache_bit_exact():
    """render_static_cache (round-5 trex economics): a cut frame fed the
    camera-fixed static-background cache must be BIT-EXACT vs the uncached
    cut-split frame — same slots, same pixels, same counters. The cache
    holds the static-class pass, which depends only on (weights, pose,
    intrinsics, cut_bounds), never on the sim state."""
    p_def, p_ori, F, dF = _ip_grid(r0=0.3, dx=0.08, shift=(0.45, 0.0, 0.0))
    p_ori = p_def
    pack = beam_bend.pack_ip_data_fast(p_def, p_ori, F, dF)
    ist, pw = _settings(dx=0.08, seek=1, samples=16)
    ist = ist._replace(cut=True, bound=1.0, tile_chunk=2, cut_split=True)
    cb = jnp.asarray([0.05, 0.85, -0.4, 0.4, -0.4, 0.4], jnp.float32)
    H = W = 64
    intr = (64.0, 64.0, W / 2, H / 2)
    args = (_pose(), intr, H, W, jnp.float32(1.0))

    cache = interactive.render_static_cache(
        ist, pw, _pose(), intr, H, W, cb)
    assert int(cache["n"]) > 0, "no static tiles — test is vacuous"
    out_c = interactive.render_frame_fused(
        ist, pw, pack, p_def, *args, cut_bounds=cb, static_cache=cache)
    out_u = interactive.render_frame_fused(
        ist, pw, pack, p_def, *args, cut_bounds=cb)
    for k in ("tiles_image", "tiles_depth", "tiles_ws"):
        np.testing.assert_array_equal(
            np.asarray(out_c[k]), np.asarray(out_u[k]),
            err_msg=f"static cache changed {k}")
    for k in ("n_active", "n_tile_overflow", "dropped_beam",
              "dropped_window"):
        assert int(out_c[k]) == int(out_u[k]), k


def test_prep_candidates_tighten_margin():
    """tighten_margin crops [t0, t1] to the candidate projection span and
    falls back to the original range when a tile has no candidates."""
    p_def, p_ori, F, dF = _ip_grid(dx=0.1)
    pack = beam_bend.pack_ip_data_fast(p_def, p_ori, F, dF)
    A = 2
    origin = jnp.asarray([[0.0, 0.0, -2.5], [0.0, 0.0, -2.5]])
    # tile 0 points through the cloud; tile 1 misses it entirely
    axis = jnp.asarray([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
    t0 = jnp.full((A,), 0.5)
    t1 = jnp.full((A,), 5.0)
    cand, bs, nd, t0e, t1e = tile_kernel.prep_candidates(
        pack, p_def, origin, axis, jnp.full((A,), 0.02), t0, t1,
        n_cand=64, n_bins=34, beam_margin=0.08, tighten_margin=0.2)
    # tile 0: cloud spans z in [-0.45-eps, 0.45+eps] -> proj in ~[2.05, 2.95]
    assert float(t0e[0]) > 1.5 and float(t1e[0]) < 3.5
    assert float(t0e[0]) < 2.06 and float(t1e[0]) > 2.94  # span + margin kept
    # tile 1: no candidates -> untouched
    assert float(t0e[1]) == 0.5 and float(t1e[1]) == 5.0
    # every valid candidate lies inside the binned range
    valid = np.asarray(cand[0, :, 15]) > 0
    proj = np.asarray(cand[0, :, 2]) + 2.5    # axis = +z from z=-2.5
    assert np.all(proj[valid] >= float(t0e[0]) - 0.1)
    assert np.all(proj[valid] <= float(t1e[0]) + 0.1)
    assert int(np.asarray(bs)[0, -1]) == valid.sum()


def test_fused_tightened_frame_matches_untightened():
    """tighten_sampling concentrates the K samples on the object; the frame
    must stay close to the untightened one (same integrand support, finer
    quadrature) and corners must remain background."""
    ist, pw = _settings(dx=0.1)
    p_def, p_ori, F, dF = _ip_grid(dx=0.1, shift=(0.1, 0.0, 0.0))
    pack = beam_bend.pack_ip_data_fast(p_def, p_ori, F, dF)
    H = W = 64
    intr = (64.0, 64.0, W / 2, H / 2)
    out_a = interactive.render_frame_fused(
        ist, pw, pack, p_def, _pose(), intr, H, W, jnp.float32(1.0))
    out_b = interactive.render_frame_fused(
        ist._replace(tighten_sampling=True), pw, pack, p_def, _pose(), intr,
        H, W, jnp.float32(1.0))
    img_a = interactive.tiles_to_image(np.asarray(out_a["tiles_image"]), H, W)
    img_b = interactive.tiles_to_image(np.asarray(out_b["tiles_image"]), H, W)
    assert np.all(np.isfinite(img_b))
    assert abs(img_b[0, 0, 0] - 1.0) < 1e-5
    p = psnr(img_a, img_b)
    assert p > 25.0, f"tightened-vs-untightened PSNR {p}"
    # and it is not a no-op: some pixels must differ (finer quadrature)
    assert float(np.abs(img_a - img_b).max()) > 1e-4


def test_fused_vs_exact_bending_found_samples():
    """On found samples the fused kernel's mapped positions must agree with
    the exact 27-cell k-NN bending (ops/bending) for a pure translation:
    both invert it exactly."""
    shift = (0.15, 0.0, -0.1)
    p_def, p_ori, F, dF = _ip_grid(dx=0.1, shift=shift)
    pack = beam_bend.pack_ip_data_fast(p_def, p_ori, F, dF)
    A = 1
    origin = jnp.asarray([[0.0, 0.0, -2.5]]) + jnp.asarray(shift)[None]
    axis = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (A, 1))
    K = 32
    t0 = jnp.full((A,), 1.8)
    t1 = jnp.full((A,), 3.2)
    cand, bs, nd, _, _ = tile_kernel.prep_candidates(
        pack, p_def, origin, axis, jnp.full((A,), 0.02), t0, t1,
        n_cand=64, n_bins=K + 2, beam_margin=0.12)

    spec = network.make_spec(bound=1.0, backbone="mlp")
    params = network.init_params(jax.random.PRNGKey(0), spec)
    pw = field_kernel.pack_weights(params, spec)

    dirs = jnp.zeros((A, 8, 256), jnp.float32)
    d = jnp.asarray([0.01, -0.01, 1.0])
    d = d / jnp.linalg.norm(d)
    for i in range(3):
        dirs = dirs.at[:, i, :].set(d[i])
    tsc = jnp.asarray([[1.8, 3.2, 1.0, 0, 0, 0, 0, 0]], jnp.float32)
    pars = jnp.zeros((24,), jnp.float32)
    pars = pars.at[0:3].set(origin[0])
    pars = pars.at[3:6].set(-10.0).at[6:9].set(10.0)   # bbox: everything hits
    pars = pars.at[9].set(1e-2).at[10].set(1.0)
    pars = pars.at[11].set(0.105).at[12].set(0.05)

    out = tile_kernel.render_tiles(
        spec, pw, tsc, bs, pars, dirs, cand, K=K, Ks=8, Ksb=4, Wn=32,
        num_seek=3, deformed=True, interpret=True)
    # the deformed render through rays displaced by `shift` must equal the
    # static render of the rest cloud through undisplaced rays
    tsc_s = tsc
    pars_s = pars.at[0:3].set(jnp.asarray([0.0, 0.0, -2.5]))
    out_s = tile_kernel.render_tiles(
        spec, pw, tsc_s, bs, pars_s, dirs, cand, K=K, Ks=8, Ksb=4, Wn=32,
        num_seek=3, deformed=False, interpret=True)
    ws = np.asarray(out[0, 4, :])
    ws_s = np.asarray(out_s[0, 4, :])
    # deformed ws only accumulates where samples are found (inside the
    # cloud); static accumulates everywhere -> deformed <= static + eps,
    # and both must be substantial for rays through the object
    assert ws.max() > 0.1
    assert np.all(ws <= ws_s + 1e-3)


def test_reach_halo_beats_legacy_one_bin_halo_vs_exact():
    """Round-3 fidelity fix: each sample's candidate window must cover the
    world-space bend reach (~2*ip_dx), not a fixed +-1 bin. At high K the
    bins are much narrower than the reach, so the legacy 1-bin halo
    (bend_reach ~ 0, floored to 1 bin) misassigns nearest IPs; the
    reach-scaled window must land strictly closer to the exact
    brute-force oracle (tools/halo_probe*.py measured 25.6 -> 31+ dB at
    800x800; this pins the same ordering at test scale)."""
    from pienerf_tpu.train.metrics import psnr as psnr_fn
    spec = network.make_spec(bound=1.0, backbone="mlp",
                             compute_dtype="float32")
    params = network.init_params(jax.random.PRNGKey(1), spec)
    pw = field_kernel.pack_weights(params, spec)
    H = W = 32
    intr = (64.0, 64.0, W / 2, H / 2)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = (0, 0, -2.5)

    # non-rigid twist so nearest-IP assignment matters (a pure translation
    # is inverted exactly by ANY accepted candidate)
    p_ori_np = np.asarray(_ip_grid(dx=0.1)[1])
    ang = 0.9 * p_ori_np[:, 1]
    ca, sa = np.cos(ang), np.sin(ang)
    p_def_np = np.stack([
        ca * p_ori_np[:, 0] + sa * p_ori_np[:, 2],
        p_ori_np[:, 1],
        -sa * p_ori_np[:, 0] + ca * p_ori_np[:, 2]], 1).astype(np.float32)
    n = p_ori_np.shape[0]
    F = np.tile(np.eye(3, dtype=np.float32), (n, 1, 1))
    F[:, 0, 0] = ca; F[:, 0, 2] = sa
    F[:, 2, 0] = -sa; F[:, 2, 2] = ca
    dF = np.zeros((n, 3, 3, 3), np.float32)
    p_def, p_ori = jnp.asarray(p_def_np), jnp.asarray(p_ori_np)
    Fj, dFj = jnp.asarray(F), jnp.asarray(dF)
    pack = beam_bend.pack_ip_data_fast(p_def, p_ori, Fj, dFj)

    K = 64   # bins ~0.02 world << reach 0.21: the legacy halo starves
    # beam_margin pinned to the round-3 value: this test isolates the
    # WINDOW-halo ordering (reach-scaled vs legacy 1-bin); the round-5
    # auto-margin (margin_of) would otherwise flood this big-ip_dx config
    # past Wn=64 in both arms and blur the comparison.
    base = beam_bend.BeamBendSettings(num_seek_ip=3, max_iter_num=1,
                                      ip_dx=0.105, ips_per_tile=256,
                                      bin_capacity=8, beam_margin=0.08)
    ist = interactive.InteractiveSettings(
        spec=spec, bend=base, tile=16, samples=K, active_frac=1.0,
        tile_chunk=4, min_near=0.05, bend_window=64)

    out_e = interactive.render_frame_exact(
        ist, pw, p_def, p_ori, Fj, dFj, jnp.asarray(pose), intr, H, W,
        jnp.float32(1.0))
    img_e = interactive.tiles_to_image(out_e["tiles_image"], H, W, 16)

    def fused(reach):
        st = ist._replace(bend=base._replace(bend_reach=reach))
        out = interactive.render_frame_fused(
            st, pw, pack, p_def, jnp.asarray(pose), intr, H, W,
            jnp.float32(1.0))
        return interactive.tiles_to_image(out["tiles_image"], H, W, 16)

    p_new = psnr_fn(fused(0.0), img_e)       # auto reach = 2*ip_dx
    p_old = psnr_fn(fused(1e-6), img_e)      # legacy 1-bin halo
    assert p_new > p_old + 1.0, (p_new, p_old)
    assert p_new > 30.0, p_new


def test_block_tiles_batching_is_exact():
    """block_tiles>1 shares one Pallas grid step across B tiles (python-
    unrolled bodies). It must be EXACT vs the single-tile grid, including
    when B does not divide the active-slot count (the pad path)."""
    ist, pw = _settings(dx=0.1)
    p_def, p_ori, F, dF = _ip_grid(dx=0.1, shift=(0.1, 0.0, 0.0))
    pack = beam_bend.pack_ip_data_fast(p_def, p_ori, F, dF)
    H = W = 64
    intr = (64.0, 64.0, W / 2, H / 2)
    out_1 = interactive.render_frame_fused(
        ist, pw, pack, p_def, _pose(), intr, H, W, jnp.float32(1.0))
    # a_cap = 16 tiles at active_frac=1.0; B=3 does not divide it
    out_3 = interactive.render_frame_fused(
        ist._replace(block_tiles=3), pw, pack, p_def, _pose(), intr,
        H, W, jnp.float32(1.0))
    np.testing.assert_array_equal(np.asarray(out_1["tiles_image"]),
                                  np.asarray(out_3["tiles_image"]))
    np.testing.assert_array_equal(np.asarray(out_1["tiles_depth"]),
                                  np.asarray(out_3["tiles_depth"]))


def test_paired_mlp_co_scheduling_matches_unpaired():
    """The block-diagonal sigma||color pairing (pack_weights_paired +
    the pipelined pair chain) must reproduce the unpaired kernel's frame:
    the off-diagonal weight blocks are exactly zero, so each half's
    values are bit-identical; only the schedule changes. Covers deformed
    (with segment skips + early termination) and static modes."""
    ist, pw = _settings(dx=0.1)
    p_def, p_ori, F, dF = _ip_grid(dx=0.1, shift=(0.1, 0.0, 0.0))
    pack = beam_bend.pack_ip_data_fast(p_def, p_ori, F, dF)
    spec = ist.spec
    params = network.init_params(jax.random.PRNGKey(0), spec)
    pwp = field_kernel.pack_weights_paired(params, spec)
    assert pwp.shape == (max(spec.num_layers, spec.num_layers_color),
                         128, 128)
    H = W = 64
    intr = (64.0, 64.0, W / 2, H / 2)
    cb = jnp.asarray([-0.2, 0.3, -0.5, 0.5, -0.5, 0.5], jnp.float32)
    for st, kw in ((ist, {}), (ist._replace(deformed=False), {}),
                   (ist._replace(cut=True), {"cut_bounds": cb})):
        out_u = interactive.render_frame_fused(
            st, pw, pack, p_def, _pose(), intr, H, W, jnp.float32(1.0),
            **kw)
        out_p = interactive.render_frame_fused(
            st, pwp, pack, p_def, _pose(), intr, H, W, jnp.float32(1.0),
            **kw)
        a = np.asarray(out_u["tiles_image"])
        bb = np.asarray(out_p["tiles_image"])
        assert np.allclose(a, bb, atol=1e-6), (
            f"deformed={st.deformed}: max abs diff "
            f"{np.abs(a - bb).max()}")
        np.testing.assert_allclose(np.asarray(out_u["tiles_depth"]),
                                   np.asarray(out_p["tiles_depth"]),
                                   atol=1e-6)
