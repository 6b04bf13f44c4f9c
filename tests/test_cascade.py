"""Cascade>1 (bound=2) end-to-end coverage — the trex/LLFF config family
(BASELINE config 4: bound 2, dt_gamma 1/128, cut-bounds interactive;
reference raymarching.cu:371-382 mip selection, README.md:134).

Round-1 gap: every test pinned cascade=1; the multi-mip occupancy logic and
dt_gamma>0 rendering were unit-tested only."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from pienerf_tpu.models import network
from pienerf_tpu.ops import beam_bend, raymarch
from pienerf_tpu.ops import grid as gridlib
from pienerf_tpu.ops.pallas import field_kernel
from pienerf_tpu.render import interactive, renderer
from pienerf_tpu.train.metrics import psnr

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def _rays_at_x(x0, n=64):
    """n rays parallel to +z at world x = x0, y in a small fan."""
    o = jnp.tile(jnp.asarray([[x0, 0.0, -2.5]]), (n, 1))
    ys = jnp.linspace(-0.05, 0.05, n)
    d = jnp.stack([jnp.zeros(n), ys, jnp.ones(n)], axis=1)
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    return o, d


def _bitfield(cascade, levels_on):
    g = gridlib.init(cascade)
    h3 = gridlib.GRID_SIZE ** 3
    words = h3 // 32
    bf = np.zeros(cascade * words, np.uint32)
    for lv in levels_on:
        bf[lv * words:(lv + 1) * words] = 0xFFFFFFFF
    return jnp.asarray(bf)


def test_mip_level_picks_outer_cascade():
    # positions beyond |x|=1 must use mip 1 of a 2-cascade grid
    x0 = jnp.asarray([0.5, 1.5, 0.3, 1.01])
    x1 = jnp.zeros(4)
    x2 = jnp.zeros(4)
    dt = jnp.full((4,), 1e-3)
    lvl = raymarch.mip_level_c(x0, x1, x2, dt, cascade=2)
    np.testing.assert_array_equal(np.asarray(lvl), [0, 1, 0, 1])
    # large dt forces the coarser mip even near the origin
    lvl2 = raymarch.mip_level_c(jnp.zeros(1), jnp.zeros(1), jnp.zeros(1),
                                jnp.asarray([0.05]), cascade=2)
    assert int(lvl2[0]) == 1


def test_cascade2_outer_region_gated_by_level1_bits():
    """Rays marching entirely in |x| > 1 hit only mip-1 cells: clearing
    that level's bits must blank them while mip-0 rays are unaffected."""
    spec = network.make_spec(bound=2.0, backbone="mlp")
    params = network.init_params(jax.random.PRNGKey(0), spec)
    st = renderer.RenderSettings(bound=2.0, cascade=2, max_samples=32,
                                 max_steps=256, dt_gamma=0.0)
    ro_out, rd_out = _rays_at_x(1.5)
    ro_in, rd_in = _rays_at_x(0.0)

    both = _bitfield(2, [0, 1])
    only0 = _bitfield(2, [0])

    ws_out_full = renderer.render_rays(params, spec, st, both, ro_out,
                                       rd_out, jnp.float32(1.0))
    ws_out_gated = renderer.render_rays(params, spec, st, only0, ro_out,
                                        rd_out, jnp.float32(1.0))
    ws_in_gated = renderer.render_rays(params, spec, st, only0, ro_in,
                                       rd_in, jnp.float32(1.0))

    assert float(jnp.sum(ws_out_full["weights_sum"])) > 0.1
    assert float(jnp.sum(ws_out_gated["weights_sum"])) < 1e-6
    assert float(jnp.sum(ws_in_gated["weights_sum"])) > 0.1


def test_dt_gamma_render_end_to_end():
    """bound=2, dt_gamma=1/128 (the trex marching config) renders finite
    images; the adaptive lattice reaches the far bound in fewer samples
    than uniform stepping."""
    spec = network.make_spec(bound=2.0, backbone="mlp")
    params = network.init_params(jax.random.PRNGKey(0), spec)
    bf = _bitfield(2, [0, 1])
    ro, rd = _rays_at_x(0.3, n=32)

    st_g = renderer.RenderSettings(bound=2.0, cascade=2, max_samples=64,
                                   max_steps=512, dt_gamma=1.0 / 128)
    out = renderer.render_rays(params, spec, st_g, bf, ro, rd,
                               jnp.float32(1.0))
    img = np.asarray(out["image"])
    assert np.all(np.isfinite(img))
    assert float(jnp.sum(out["weights_sum"])) > 0.1

    # lattice coverage: with dt_gamma the march spans a longer t range for
    # the same sample count than dt_gamma=0
    t_g, dt_g = raymarch.t_lattice(jnp.asarray([0.5]), 256, 1.0 / 128,
                                   2 * raymarch.SQRT3 / 512,
                                   2 * raymarch.SQRT3 * 2 / 128)
    t_u, _ = raymarch.t_lattice(jnp.asarray([0.5]), 256, 0.0,
                                2 * raymarch.SQRT3 / 512, 1.0)
    assert float(t_g[0, -1]) > float(t_u[0, -1])


def _cut_scene():
    r0, dx = 0.45, 0.1
    c = np.arange(-r0, r0 + 1e-6, dx, dtype=np.float32)
    xx, yy, zz = np.meshgrid(c, c, c, indexing="ij")
    p = np.stack([xx.ravel(), yy.ravel(), zz.ravel()], 1)
    p = p[np.linalg.norm(p, axis=1) <= r0 + dx / 2]
    n = p.shape[0]
    F = np.tile(np.eye(3, dtype=np.float32), (n, 1, 1))
    dF = np.zeros((n, 3, 3, 3), np.float32)
    return jnp.asarray(p), jnp.asarray(F), jnp.asarray(dF)


def test_cut_bounds_interactive_end_to_end():
    """cut mode (reference raymarching.cu:1197-1212, with the y-typo fixed):
    inside cut_bounds the field bends with the sim; outside, the static
    scene renders. A shift applied to the IPs must change in-cut pixels and
    leave far-outside pixels at the static render."""
    spec = network.make_spec(bound=1.0, backbone="mlp")
    params = network.init_params(jax.random.PRNGKey(0), spec)
    pw = field_kernel.pack_weights(params, spec)
    p_ori, F, dF = _cut_scene()
    shift = jnp.asarray([0.25, 0.0, 0.0])
    p_def = p_ori + shift

    bst = beam_bend.BeamBendSettings(num_seek_ip=2, max_iter_num=1,
                                     ip_dx=0.105, ips_per_tile=128)
    H = W = 64
    intr = (64.0, 64.0, W / 2, H / 2)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = (0, 0, -2.5)
    pose_j = jnp.asarray(pose)
    cut_bounds = jnp.asarray([-1.0, 1.0, -1.0, 1.0, -1.0, 1.0])

    ist_cut = interactive.InteractiveSettings(
        spec=spec, bend=bst, tile=16, samples=32, active_frac=1.0,
        tile_chunk=4, min_near=0.05, deformed=True, cut=True, bound=1.0)
    pack = beam_bend.pack_ip_data_fast(p_def, p_ori, F, dF)
    out_cut = interactive.render_frame_fused(
        ist_cut, pw, pack, p_def, pose_j, intr, H, W, jnp.float32(1.0),
        cut_bounds)
    img_cut = interactive.tiles_to_image(
        np.asarray(out_cut["tiles_image"]), H, W, 16)

    # static render of the rest scene through the same march box
    ist_st = ist_cut._replace(deformed=False)
    out_st = interactive.render_frame_fused(
        ist_st, pw, pack, p_def, pose_j, intr, H, W, jnp.float32(1.0),
        cut_bounds)
    img_st = interactive.tiles_to_image(
        np.asarray(out_st["tiles_image"]), H, W, 16)

    assert np.all(np.isfinite(img_cut))
    # the deformed render must differ where the object moved
    assert float(np.abs(img_cut - img_st).max()) > 0.05

    # narrow cut box around the object: pixels far outside it must match
    # the static scene exactly (they never bend)
    cut_tight = jnp.asarray([-0.9, 0.9, -0.2, 0.2, -0.9, 0.9])
    out_t = interactive.render_frame_fused(
        ist_cut, pw, pack, p_def, pose_j, intr, H, W, jnp.float32(1.0),
        cut_tight)
    img_t = interactive.tiles_to_image(
        np.asarray(out_t["tiles_image"]), H, W, 16)
    # rows near the top of the image see only |y| > 0.2 world space
    np.testing.assert_allclose(img_t[:8], img_st[:8], atol=1e-4)

    # tighten_sampling must be a no-op in cut mode: the static scene
    # outside cut_bounds has density anywhere in the march box, so the
    # range-crop guard disables (render_frame_fused sets tighten_margin=0)
    out_tt = interactive.render_frame_fused(
        ist_cut._replace(tighten_sampling=True), pw, pack, p_def, pose_j,
        intr, H, W, jnp.float32(1.0), cut_tight)
    img_tt = interactive.tiles_to_image(
        np.asarray(out_tt["tiles_image"]), H, W, 16)
    np.testing.assert_allclose(img_tt, img_t, atol=1e-6)


def test_cascade2_golden_frame():
    """Deterministic cascade-2 regression frame (committed golden)."""
    spec = network.make_spec(bound=2.0, backbone="mlp")
    params = network.init_params(jax.random.PRNGKey(3), spec)
    bf = _bitfield(2, [0, 1])
    st = renderer.RenderSettings(bound=2.0, cascade=2, max_samples=32,
                                 max_steps=256, dt_gamma=1.0 / 128)
    n = 32 * 32
    ro = jnp.tile(jnp.asarray([[0.3, 0.0, -2.5]]), (n, 1))
    xs, ys = jnp.meshgrid(jnp.linspace(-0.4, 0.4, 32),
                          jnp.linspace(-0.4, 0.4, 32), indexing="ij")
    d = jnp.stack([xs.ravel(), ys.ravel(), jnp.ones(n)], axis=1)
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    out = renderer.render_rays(params, spec, st, bf, ro, d,
                               jnp.float32(1.0))
    img = np.asarray(out["image"]).reshape(32, 32, 3)

    path = os.path.join(GOLDEN_DIR, "cascade2_frame.npy")
    if not os.path.exists(path):   # first run generates the golden
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.save(path, img)
    golden = np.load(path)
    p = psnr(img, golden)
    assert p > 45.0, f"cascade-2 golden frame drifted: PSNR {p:.2f}"
