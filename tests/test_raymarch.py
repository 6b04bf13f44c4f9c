import jax
import jax.numpy as jnp
import numpy as np

from pienerf_tpu.ops import grid as gridlib
from pienerf_tpu.ops import raymarch as rm
from pienerf_tpu.ops.morton import morton3d_np


def test_packbits_roundtrip():
    rng = np.random.RandomState(0)
    density = rng.rand(1, 128**3).astype(np.float32)
    bf = gridlib.packbits(jnp.asarray(density), jnp.float32(0.5))
    codes = rng.randint(0, 128**3, size=500)
    got = np.asarray(gridlib.occupied(bf, jnp.zeros(500, jnp.int32),
                                      jnp.asarray(codes, jnp.int32)))
    np.testing.assert_array_equal(got, density[0, codes] > 0.5)


def test_t_lattice_matches_recurrence():
    for gamma in [0.0, 1.0 / 128.0, 1.0 / 64.0]:
        dt_min = 2 * rm.SQRT3 / 1024
        dt_max = 2 * rm.SQRT3 * 2 / 128
        t0 = np.array([0.2, 0.5, 1.7, 3.0], np.float32)
        S = 200
        t, dt = rm.t_lattice(jnp.asarray(t0), S, gamma, dt_min, dt_max)
        t = np.asarray(t)
        dt_got = np.asarray(dt)
        # sequential oracle
        for r in range(len(t0)):
            tc = float(t0[r])
            for i in range(S):
                np.testing.assert_allclose(t[r, i], tc, rtol=2e-4, atol=1e-5,
                                           err_msg=f"gamma={gamma} ray={r} i={i}")
                step = np.clip(tc * gamma, dt_min, dt_max)
                np.testing.assert_allclose(dt_got[r, i], step, rtol=2e-3,
                                           err_msg=f"gamma={gamma} ray={r} i={i}")
                tc += step


def test_compact_samples():
    rng = np.random.RandomState(1)
    valid = rng.rand(7, 40) > 0.7
    idx, mask = rm.compact_samples(jnp.asarray(valid), 5)
    idx, mask = np.asarray(idx), np.asarray(mask)
    for r in range(7):
        want = np.nonzero(valid[r])[0][:5]
        assert mask[r].sum() == len(want)
        np.testing.assert_array_equal(idx[r, : len(want)], want)


def test_composite_matches_oracle():
    rng = np.random.RandomState(2)
    n, k = 16, 32
    sigmas = rng.rand(n, k).astype(np.float32) * 30
    rgbs = rng.rand(n, k, 3).astype(np.float32)
    dts = np.full((n, k), 0.01, np.float32)
    ts = np.cumsum(dts, axis=1) + 0.5
    count = rng.randint(0, k + 1, n)
    mask = np.arange(k)[None, :] < count[:, None]
    ws, dep, img = rm.composite(
        jnp.asarray(sigmas), jnp.asarray(rgbs), jnp.asarray(dts),
        jnp.asarray(ts), jnp.asarray(mask), 1e-2,
    )
    ws0, dep0, img0 = rm.composite_np(sigmas, rgbs, dts, ts, mask, 1e-2)
    np.testing.assert_allclose(np.asarray(ws), ws0, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dep), dep0, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(img), img0, rtol=1e-4, atol=1e-5)


def test_near_far():
    rays_o = jnp.asarray([[0.0, 0.0, -3.0], [0.0, 0.0, -3.0], [5.0, 5.0, 5.0]])
    rays_d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 1.0, 0.0], [1.0, 0.0, 0.0]])
    aabb = jnp.asarray([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0])
    nears, fars = rm.near_far_from_aabb(rays_o, rays_d, aabb, 0.2)
    np.testing.assert_allclose(np.asarray(nears[0]), 2.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(fars[0]), 4.0, rtol=1e-6)
    assert float(nears[1]) > 1e30 and float(nears[2]) > 1e30  # misses


def _sphere_bitfield(bound=1.0, r0=0.5):
    """Occupancy bitfield for a centered sphere of radius r0 (cascade=1)."""
    H = gridlib.GRID_SIZE
    g = np.arange(H)
    xx, yy, zz = np.meshgrid(g, g, g, indexing="ij")
    centers = (np.stack([xx, yy, zz], -1) + 0.5) / H * 2 * bound - bound
    inside = np.linalg.norm(centers, axis=-1) <= r0 + 2 * bound / H
    codes = morton3d_np(xx.ravel(), yy.ravel(), zz.ravel())
    density = np.zeros((1, H**3), np.float32)
    density[0, codes] = inside.ravel().astype(np.float32)
    return gridlib.packbits(jnp.asarray(density), jnp.float32(0.5))


def test_march_and_composite_analytic_sphere():
    """Constant-density sphere: pixel transmittance = exp(-sigma * chord)."""
    bound, r0, sigma0 = 1.0, 0.5, 8.0
    bf = _sphere_bitfield(bound, r0)

    # rays along +z through varying impact parameter b
    bs = np.linspace(0.0, 0.7, 15, dtype=np.float32)
    rays_o = jnp.asarray(np.stack([bs, np.zeros_like(bs), np.full_like(bs, -3.0)], -1))
    rays_d = jnp.asarray(np.tile([0.0, 0.0, 1.0], (15, 1)).astype(np.float32))
    aabb = jnp.asarray([-bound] * 3 + [bound] * 3, jnp.float32)
    nears, fars = rm.near_far_from_aabb(rays_o, rays_d, aabb, 0.2)

    max_steps = 1024
    t, dt, valid = rm.march_lattice(rays_o, rays_d, nears, fars, bf,
                                    bound, 1, max_steps, 0.0, max_steps)
    idx, mask = rm.compact_samples(valid, 512)
    rows = jnp.arange(15)[:, None]
    ts, dts = t[rows, idx], dt[rows, idx]
    xs = rays_o[:, None, :] + ts[..., None] * rays_d[:, None, :]

    # analytic density/color at samples
    inside = jnp.linalg.norm(xs, axis=-1) <= r0
    sigmas = jnp.where(inside, sigma0, 0.0)
    rgbs = jnp.broadcast_to(jnp.asarray([1.0, 0.5, 0.25]), xs.shape)

    ws, dep, img = rm.composite(sigmas, rgbs, dts, ts, mask, T_thresh=1e-4)
    ws = np.asarray(ws)

    chord = 2.0 * np.sqrt(np.maximum(r0**2 - bs**2, 0.0))
    want = 1.0 - np.exp(-sigma0 * chord)
    np.testing.assert_allclose(ws, want, atol=0.04)
    # color where opaque
    img = np.asarray(img)
    hit = want > 0.5
    np.testing.assert_allclose(img[hit, 0] / ws[hit], 1.0, atol=1e-3)


def test_occupancy_update_marks_sphere():
    bound, r0 = 1.0, 0.4
    g = gridlib.init(cascade=1)

    def density_fn(x):
        return jnp.where(jnp.linalg.norm(x, axis=-1) <= r0, 20.0, 0.0)

    g = gridlib.update(g, density_fn, bound, density_thresh=10.0,
                       rng=jax.random.PRNGKey(0))
    assert int(g.iter_density) == 1
    d = np.asarray(g.density)
    assert (d > 10).sum() > 1000
    frac = (d > 10).mean()
    # sphere volume fraction of the [-1,1]^3 cube ~ 3.3%
    assert 0.01 < frac < 0.1

    # partial updates keep previously-seen occupancy alive via EMA
    g._replace(iter_density=jnp.asarray(20, jnp.int32))
    g2 = gridlib.update(g._replace(iter_density=jnp.asarray(20, jnp.int32)),
                        density_fn, bound, 10.0, jax.random.PRNGKey(1))
    d2 = np.asarray(g2.density)
    assert (d2 > 10).sum() >= (d > 10).sum() * 0.9


def test_mark_untrained():
    g = gridlib.init(cascade=1)
    g = g._replace(density=jnp.zeros_like(g.density))
    # one camera at +z looking toward -z (ngp convention: z axis = view dir)
    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = 3.0
    pose[:3, :3] = np.diag([1.0, 1.0, -1.0]).astype(np.float32)  # looks at -z
    intr = (800.0, 800.0, 100.0, 100.0)  # narrow fov: frustum half-width 0.375 at the cube
    g2 = gridlib.mark_untrained(g, pose[None], intr, bound=1.0)
    d = np.asarray(g2.density)
    assert (d == -1).any() and (d == 0).any()
