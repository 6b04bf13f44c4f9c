import numpy as np

from pienerf_tpu.sim import gmls


def _fd_grad(f, p, eps=1e-6):
    g = np.zeros(3)
    for j in range(3):
        e = np.zeros(3)
        e[j] = eps
        g[j] = (f(p + e) - f(p - e)) / (2 * eps)
    return g


def test_weight_grad_hessian_fd():
    rng = np.random.RandomState(0)
    r = 0.7
    q = rng.randn(3) * 0.1
    for _ in range(5):
        p = q + rng.randn(3) * 0.2
        w, dw, ddw = gmls.kernel_weight(r, p, q)

        def f(pp):
            return gmls.kernel_weight(r, pp, q)[0]

        np.testing.assert_allclose(dw, _fd_grad(f, p), atol=1e-6)
        for j in range(3):
            def fj(pp, j=j):
                return gmls.kernel_weight(r, pp, q)[1][j]
            np.testing.assert_allclose(ddw[j], _fd_grad(fj, p), atol=1e-5)


def test_weight_compact_support():
    r = 0.5
    p = np.array([1.0, 0.0, 0.0])
    q = np.zeros(3)
    w, dw, ddw = gmls.kernel_weight(r, p, q)
    assert w == 0 and np.all(dw == 0) and np.all(ddw == 0)


def test_basis_grad_hess_fd():
    rng = np.random.RandomState(1)
    p = rng.randn(3)
    eps = 1e-6
    dP = gmls.basis_grad(p)
    for j in range(3):
        e = np.zeros(3)
        e[j] = eps
        fd = (gmls.basis(p + e) - gmls.basis(p - e)) / (2 * eps)
        np.testing.assert_allclose(dP[j], fd, atol=1e-6)
    ddP = gmls.basis_hess()
    for j in range(3):
        for k in range(3):
            e = np.zeros(3)
            e[k] = eps
            fd = (gmls.basis_grad(p + e)[j] - gmls.basis_grad(p - e)[j]) / (2 * eps)
            np.testing.assert_allclose(ddP[j, k], fd, atol=1e-6)


def _setup_lattice(rng, n_entities=40):
    """Kernel nodes on a 3x3x3 lattice; entities near the center cell."""
    g = np.arange(3, dtype=np.float64)
    kx, ky, kz = np.meshgrid(g, g, g, indexing="ij")
    kernel_pos = np.stack([kx.ravel(), ky.ravel(), kz.ravel()], axis=1)  # [27,3]
    kdx = 1.0

    pos = 1.0 + rng.rand(n_entities, 3)  # inside the center cell [1,2]^3
    base = np.floor(pos).astype(np.int64)  # == 1
    corners = np.array([[(s >> 2) & 1, (s >> 1) & 1, s & 1] for s in range(8)])
    cell = base[:, None, :] + corners[None]  # [N,8,3]
    topo = (cell[..., 0] * 9 + cell[..., 1] * 3 + cell[..., 2]).astype(np.int32)
    return pos, topo, kernel_pos, kdx


def _quad_field(c):
    """phi(p) = c @ P(p) for coefficient matrix c [3,10]; plus grad/hess."""
    def phi(p):
        return gmls.basis(p) @ c.T                     # [...,3]

    def grad(p):
        return np.einsum("...ja,da->...dj", gmls.basis_grad(p), c)  # [...,3dim,3j]

    def hess(p):
        return np.einsum("jka,da->djk", gmls.basis_hess(), c)  # [3dim,3,3]
    return phi, grad, hess


def _dof_from_field(kernel_pos, c):
    """Generalized nodal coordinates representing the exact quadratic field."""
    K = kernel_pos.shape[0]
    dof = np.zeros((K, 10, 3))
    dof[:, 0, :] = gmls.basis(kernel_pos) @ c.T
    grads = np.einsum("kja,da->kdj", gmls.basis_grad(kernel_pos), c)  # [K,3d,3j]
    for j in range(3):
        dof[:, 1 + j, :] = grads[:, :, j]
    hess = np.einsum("jka,da->djk", gmls.basis_hess(), c)  # [3d,3,3]
    for j in range(3):
        for k in range(j, 3):
            dof[:, gmls.quad_slot(j, k), :] = hess[:, j, k]
    return dof


def test_gmls_reproduces_quadratic_field():
    rng = np.random.RandomState(2)
    pos, topo, kernel_pos, kdx = _setup_lattice(rng)
    Nx, dNx, ddNx = gmls.shape_functions(pos, topo, kernel_pos, kdx)

    c = rng.randn(3, 10)
    phi, grad, hess = _quad_field(c)
    dof = _dof_from_field(kernel_pos, c)
    dof_g = dof[topo]  # [N,8,10,3]

    # value reproduction
    val = np.einsum("nia,niad->nd", Nx, dof_g)
    np.testing.assert_allclose(val, phi(pos), rtol=1e-9, atol=1e-9)

    # gradient reproduction: F[d, j] = d phi_d / d p_j
    F = np.einsum("nija,niad->ndj", dNx, dof_g)
    np.testing.assert_allclose(F, grad(pos), rtol=1e-8, atol=1e-8)

    # second-derivative reproduction
    H = np.einsum("nijka,niad->ndjk", ddNx, dof_g)
    want = np.broadcast_to(hess(pos), H.shape)
    np.testing.assert_allclose(H, want, rtol=1e-7, atol=1e-7)


def test_gmls_identity_map_gives_F_identity():
    """The solver's rest configuration: dof = identity map => phi(p)=p, F=I."""
    rng = np.random.RandomState(3)
    pos, topo, kernel_pos, kdx = _setup_lattice(rng)
    Nx, dNx, ddNx = gmls.shape_functions(pos, topo, kernel_pos, kdx)

    K = kernel_pos.shape[0]
    dof = np.zeros((K, 10, 3))
    dof[:, 0, :] = kernel_pos
    for j in range(3):
        dof[:, 1 + j, j] = 1.0
    dof_g = dof[topo]

    val = np.einsum("nia,niad->nd", Nx, dof_g)
    np.testing.assert_allclose(val, pos, atol=1e-9)
    F = np.einsum("nija,niad->ndj", dNx, dof_g)
    np.testing.assert_allclose(F, np.broadcast_to(np.eye(3), F.shape), atol=1e-8)
    H = np.einsum("nijka,niad->ndjk", ddNx, dof_g)
    np.testing.assert_allclose(H, 0.0, atol=1e-7)
