"""Batched 3x3 SVD via vectorized Jacobi eigendecomposition.

jnp.linalg.svd lowers to a LAPACK-style path that costs ~90 ms for a few
thousand 3x3 problems on TPU. The corotated stress only needs R = U V^T and
U f(S) V^T, so we eigendecompose F^T F with a fixed number of branchless
cyclic Jacobi sweeps and recover U = F V S^{-1}.

Everything is written in scalar COMPONENT form (15 independent [N] arrays)
— one long elementwise chain that XLA fuses into a handful of VPU kernels.
A matrix-form ([N, 3, 3] einsum) variant measured slower than the LAPACK
path because each tiny rotation became its own kernel launch.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _rot(a, v, p, q):
    """One Jacobi rotation zeroing A[p, q]. a: dict of 6 sym components,
    v: dict of 9 eigenvector-matrix components (column-major keys (i, j))."""
    app = a[(p, p)]
    aqq = a[(q, q)]
    apq = a[(p, q)]
    theta = 0.5 * jnp.arctan2(2.0 * apq, app - aqq)
    c = jnp.cos(theta)
    s = jnp.sin(theta)
    cc, ss, cs = c * c, s * s, c * s

    r = 3 - p - q  # the untouched index
    arp = a[(min(r, p), max(r, p))]
    arq = a[(min(r, q), max(r, q))]

    # A' = J^T A J with J = I except J[pp]=J[qq]=c, J[qp]=s, J[pq]=-s
    a_new = dict(a)
    a_new[(p, p)] = cc * app + 2.0 * cs * apq + ss * aqq
    a_new[(q, q)] = ss * app - 2.0 * cs * apq + cc * aqq
    a_new[(p, q)] = jnp.zeros_like(apq)
    a_new[(min(r, p), max(r, p))] = c * arp + s * arq
    a_new[(min(r, q), max(r, q))] = -s * arp + c * arq

    v_new = dict(v)
    for i in range(3):
        vip, viq = v[(i, p)], v[(i, q)]
        v_new[(i, p)] = c * vip + s * viq
        v_new[(i, q)] = -s * vip + c * viq
    return a_new, v_new


def eigh3x3(A: jax.Array, sweeps: int = 6) -> Tuple[jax.Array, jax.Array]:
    """Symmetric 3x3 eigendecomposition of [..., 3, 3].

    Returns (eigvals [..., 3], eigvecs [..., 3, 3], columns = vectors),
    unordered."""
    a = {(i, j): A[..., i, j] for i in range(3) for j in range(i, 3)}
    one = jnp.ones_like(a[(0, 0)])
    zero = jnp.zeros_like(one)
    v = {(i, j): (one if i == j else zero) for i in range(3) for j in range(3)}

    for _ in range(sweeps):
        for p, q in ((0, 1), (0, 2), (1, 2)):
            a, v = _rot(a, v, p, q)

    w = jnp.stack([a[(0, 0)], a[(1, 1)], a[(2, 2)]], axis=-1)
    V = jnp.stack(
        [jnp.stack([v[(i, j)] for j in range(3)], axis=-1) for i in range(3)],
        axis=-2,
    )
    return w, V


def corotated_delta(F, eps: float = 1e-12):
    """Corotated stress factors in pure component form.

    F: 3x3 nested tuple/list of [N] arrays, F[i][j] = d phi_i / d p_j.
    Returns (dR, dV): 3x3 nested tuples of [N] arrays with
    dR = U V^T - I (rotation part minus identity) and
    dV = U diag(proj(S)) V^T - I (volume-invariant projected stretch minus
    identity), where proj is the reference's 3-step Gauss-Newton det=1
    projection (simulator/func_utils.py:22-40).

    This is the sim iteration's hot path: everything stays 15-ish [N]
    component arrays that XLA fuses into a few VPU kernels — no [N, 3, 3]
    intermediates (whose trailing dims pad 42x on TPU, PERF.md).
    """
    # A = F^T F (symmetric, 6 components)
    a = {}
    for i in range(3):
        for j in range(i, 3):
            a[(i, j)] = sum(F[k][i] * F[k][j] for k in range(3))
    one = jnp.ones_like(a[(0, 0)])
    zero = jnp.zeros_like(one)
    v = {(i, j): (one if i == j else zero) for i in range(3) for j in range(3)}
    for _ in range(6):
        for p, q in ((0, 1), (0, 2), (1, 2)):
            a, v = _rot(a, v, p, q)
    w = [a[(0, 0)], a[(1, 1)], a[(2, 2)]]

    # descending sort network on (w, V columns)
    def cswap(i, j):
        swap = w[i] < w[j]
        w[i], w[j] = (jnp.where(swap, w[j], w[i]),
                      jnp.where(swap, w[i], w[j]))
        for r in range(3):
            vi, vj = v[(r, i)], v[(r, j)]
            v[(r, i)] = jnp.where(swap, vj, vi)
            v[(r, j)] = jnp.where(swap, vi, vj)

    cswap(0, 1)
    cswap(0, 2)
    cswap(1, 2)

    S = [jnp.sqrt(jnp.clip(wc, 0.0, None)) for wc in w]

    # U = F V S^{-1}
    U = [[None] * 3 for _ in range(3)]
    for i in range(3):
        for c in range(3):
            fv = sum(F[i][j] * v[(j, c)] for j in range(3))
            U[i][c] = fv / jnp.maximum(S[c], eps)

    # volume-invariant projection of S (3 fixed Gauss-Newton steps)
    D = [zero, zero, zero]
    for _ in range(3):
        s0, s1, s2 = (S[0] + D[0], S[1] + D[1], S[2] + D[2])
        C = s0 * s1 * s2 - 1.0
        dC = [s1 * s2, s0 * s2, s0 * s1]
        coef = (sum(dC[c] * D[c] for c in range(3)) - C) \
            / sum(dC[c] * dC[c] for c in range(3))
        D = [coef * dC[c] for c in range(3)]
    Sp = [S[c] + D[c] for c in range(3)]

    dR = tuple(
        tuple(sum(U[i][c] * v[(j, c)] for c in range(3))
              - (1.0 if i == j else 0.0) for j in range(3))
        for i in range(3))
    dV = tuple(
        tuple(sum(U[i][c] * Sp[c] * v[(j, c)] for c in range(3))
              - (1.0 if i == j else 0.0) for j in range(3))
        for i in range(3))
    return dR, dV


def svd3x3(F: jax.Array, eps: float = 1e-12
           ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Batched SVD of [..., 3, 3]. Returns (U, S [..., 3], Vt).

    Singular values sorted descending. U, V are orthogonal but not forced
    to proper rotations (matching jnp.linalg.svd / the reference's warp
    svd3 behavior for the corotated use)."""
    A = jnp.einsum("...ji,...jk->...ik", F, F)                  # F^T F
    w, V = eigh3x3(A)

    # sort descending via a fixed 3-element sorting network
    def cswap(w, V, i, j):
        swap = w[..., i] < w[..., j]
        wi = jnp.where(swap, w[..., j], w[..., i])
        wj = jnp.where(swap, w[..., i], w[..., j])
        w = w.at[..., i].set(wi).at[..., j].set(wj)
        vi = jnp.where(swap[..., None], V[..., :, j], V[..., :, i])
        vj = jnp.where(swap[..., None], V[..., :, i], V[..., :, j])
        V = V.at[..., :, i].set(vi).at[..., :, j].set(vj)
        return w, V

    w, V = cswap(w, V, 0, 1)
    w, V = cswap(w, V, 0, 2)
    w, V = cswap(w, V, 1, 2)

    S = jnp.sqrt(jnp.clip(w, 0.0, None))
    # true-f32 contraction: DEFAULT matmul precision is bf16 on TPU, which
    # is not accurate enough for the integrator (see solver._HI)
    FV = jnp.einsum("...ij,...jk->...ik", F, V,
                    precision=jax.lax.Precision.HIGHEST)
    U = FV / jnp.maximum(S[..., None, :], eps)
    return U, S, jnp.swapaxes(V, -1, -2)
