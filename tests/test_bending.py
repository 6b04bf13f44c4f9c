import jax
import jax.numpy as jnp
import numpy as np

from pienerf_tpu.ops import bending as bend_ops
from pienerf_tpu.ops import spatial_hash as sh


def test_build_table_matches_naive():
    rng = np.random.RandomState(0)
    pts = rng.uniform(-1, 1, size=(200, 3)).astype(np.float32)
    layout = sh.make_layout(bound=1.0, hgs=0.25, max_per_cell=32)
    table, counts = sh.build_table(layout, jnp.asarray(pts))
    table, counts = np.asarray(table), np.asarray(counts)

    bbmin = np.asarray(layout.bbmin)
    cid = np.floor((pts - bbmin) / layout.hgs).astype(np.int64)
    r0, r1, _ = layout.resolution
    lin = cid[:, 2] * (r1 * r0) + cid[:, 1] * r0 + cid[:, 0]
    for c in np.unique(lin):
        want = set(np.nonzero(lin == c)[0].tolist())
        got = set(int(i) for i in table[c] if i >= 0)
        assert got == want
        assert counts[c] == len(want)


def test_gather_neighborhood_contains_close_points():
    rng = np.random.RandomState(1)
    pts = rng.uniform(-0.9, 0.9, size=(300, 3)).astype(np.float32)
    layout = sh.make_layout(bound=1.0, hgs=0.2, max_per_cell=64)
    table, _ = sh.build_table(layout, jnp.asarray(pts))
    q = rng.uniform(-0.8, 0.8, size=(50, 3)).astype(np.float32)
    g = sh.cell_of(layout, jnp.asarray(q))
    cand = np.asarray(sh.gather_neighborhood(layout, table, g))
    for i in range(50):
        close = np.nonzero(np.linalg.norm(pts - q[i], axis=1) < layout.hgs)[0]
        got = set(int(c) for c in cand[i] if c >= 0)
        assert set(close.tolist()) <= got


def test_find_closest_ips_matches_bruteforce():
    rng = np.random.RandomState(2)
    pts = rng.uniform(-0.9, 0.9, size=(400, 3)).astype(np.float32)
    layout = sh.make_layout(bound=1.0, hgs=0.3, max_per_cell=64)
    table, _ = sh.build_table(layout, jnp.asarray(pts))
    q = rng.uniform(-0.5, 0.5, size=(30, 3)).astype(np.float32)
    ids, dist = bend_ops.find_closest_ips(
        layout, table, jnp.asarray(pts), jnp.asarray(q), k=3)
    ids = np.asarray(ids)
    for i in range(30):
        d = np.linalg.norm(pts - q[i], axis=1)
        want_idx = np.argsort(d)[:3]
        # only guaranteed when true NNs are within one cell
        if d[want_idx[-1]] < layout.hgs:
            np.testing.assert_array_equal(ids[i], want_idx)


def test_newton_inverts_quadratic_map():
    rng = np.random.RandomState(3)
    M, k = 20, 2
    pk = rng.uniform(-0.2, 0.2, size=(M, k, 3)).astype(np.float32)
    # modest deformation: F = I + 0.2 eps, dF small symmetric in (c, j)
    F = np.tile(np.eye(3, dtype=np.float32), (M, k, 1, 1))
    F += 0.2 * rng.randn(M, k, 3, 3).astype(np.float32)
    dF_raw = 0.3 * rng.randn(M, k, 3, 3, 3).astype(np.float32)
    dF = 0.5 * (dF_raw + dF_raw.transpose(0, 1, 4, 3, 2))  # sym in (j, c)

    p_star = pk + rng.uniform(-0.04, 0.04, size=(M, k, 3)).astype(np.float32)
    q = p_star - pk
    dFq = np.einsum("mkjdc,mkj->mkdc", dF, q)
    phi = pk + np.einsum("mkdc,mkc->mkd", F, q) + 0.5 * np.einsum(
        "mkdc,mkc->mkd", dFq, q)
    # choose sample x = phi(p*) for candidate 0 of each row
    x = phi[:, 0, :]
    # deformed IP positions: phi at the IP itself is pk (q=0) -> p_def = pk
    p_rest, _ = bend_ops.newton_invert(
        jnp.asarray(x), jnp.asarray(pk), jnp.asarray(pk),
        jnp.asarray(F), jnp.asarray(dF), max_iter=20,
    )
    got = np.asarray(p_rest)[:, 0, :]
    np.testing.assert_allclose(got, p_star[:, 0, :], atol=1e-4)


def test_bend_points_identity_map_is_identity():
    rng = np.random.RandomState(4)
    # IPs on a grid covering [-0.5, 0.5]^3
    g = np.arange(-0.5, 0.51, 0.1, dtype=np.float32)
    xx, yy, zz = np.meshgrid(g, g, g, indexing="ij")
    p = np.stack([xx.ravel(), yy.ravel(), zz.ravel()], 1)
    n = p.shape[0]
    F = np.tile(np.eye(3, dtype=np.float32), (n, 1, 1))
    dF = np.zeros((n, 3, 3, 3), np.float32)

    layout = sh.make_layout(bound=1.0, hgs=0.12, max_per_cell=8)
    table, _ = sh.build_table(layout, jnp.asarray(p))
    st = bend_ops.BendSettings(num_seek_ip=3, max_iter_num=2, ip_dx=0.105)

    x = rng.uniform(-0.4, 0.4, size=(64, 3)).astype(np.float32)
    x_rest, found = bend_ops.bend_points(
        layout, st, table, jnp.asarray(p), jnp.asarray(p),
        jnp.asarray(F), jnp.asarray(dF), jnp.asarray(x),
        jnp.asarray([-1.0, -1.0, -1.0]), jnp.asarray([1.0, 1.0, 1.0]),
    )
    assert np.asarray(found).all()
    np.testing.assert_allclose(np.asarray(x_rest), x, atol=1e-5)


def test_bend_points_translation():
    """Rigid translation: x_rest = x - c wherever IPs are found."""
    c = np.array([0.15, -0.1, 0.05], np.float32)
    g = np.arange(-0.5, 0.51, 0.1, dtype=np.float32)
    xx, yy, zz = np.meshgrid(g, g, g, indexing="ij")
    p_ori = np.stack([xx.ravel(), yy.ravel(), zz.ravel()], 1)
    p_def = p_ori + c
    n = p_ori.shape[0]
    F = np.tile(np.eye(3, dtype=np.float32), (n, 1, 1))
    dF = np.zeros((n, 3, 3, 3), np.float32)

    layout = sh.make_layout(bound=1.0, hgs=0.12, max_per_cell=8)
    table, _ = sh.build_table(layout, jnp.asarray(p_def))
    st = bend_ops.BendSettings(num_seek_ip=3, max_iter_num=2, ip_dx=0.105)

    rng = np.random.RandomState(5)
    x = (rng.uniform(-0.3, 0.3, size=(64, 3)) + c).astype(np.float32)
    x_rest, found = bend_ops.bend_points(
        layout, st, table, jnp.asarray(p_def), jnp.asarray(p_ori),
        jnp.asarray(F), jnp.asarray(dF), jnp.asarray(x),
        jnp.asarray(p_def.min(0) - 1e-3), jnp.asarray(p_def.max(0) + 1e-3),
    )
    fnd = np.asarray(found)
    assert fnd.mean() > 0.9
    np.testing.assert_allclose(np.asarray(x_rest)[fnd], (x - c)[fnd], atol=1e-5)
