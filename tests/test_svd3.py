import jax.numpy as jnp
import numpy as np

from pienerf_tpu.sim.svd3 import eigh3x3, svd3x3


def _random_F(n=200, seed=0, scale=0.4):
    rng = np.random.RandomState(seed)
    return (np.tile(np.eye(3, dtype=np.float32), (n, 1, 1))
            + scale * rng.randn(n, 3, 3).astype(np.float32))


def test_eigh3x3_reconstructs():
    rng = np.random.RandomState(1)
    B = rng.randn(100, 3, 3).astype(np.float32)
    A = B @ B.transpose(0, 2, 1)
    w, V = eigh3x3(jnp.asarray(A))
    w, V = np.asarray(w), np.asarray(V)
    rec = np.einsum("nij,nj,nkj->nik", V, w, V)
    np.testing.assert_allclose(rec, A, rtol=1e-3, atol=1e-3)
    # orthogonality
    eye = np.einsum("nji,njk->nik", V, V)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (100, 1, 1)), atol=1e-5)


def test_svd3x3_reconstructs_and_matches_numpy():
    F = _random_F()
    U, S, Vt = svd3x3(jnp.asarray(F))
    U, S, Vt = np.asarray(U), np.asarray(S), np.asarray(Vt)
    rec = np.einsum("nij,nj,njk->nik", U, S, Vt)
    np.testing.assert_allclose(rec, F, rtol=8e-3, atol=8e-3)
    # singular values match numpy (descending)
    S_np = np.linalg.svd(F, compute_uv=False)
    np.testing.assert_allclose(S, S_np, rtol=1e-3, atol=1e-4)
    # U orthogonal
    eye = np.einsum("nji,njk->nik", U, U)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (200, 1, 1)), atol=1e-2)


def test_svd3x3_polar_rotation_matches_numpy():
    """R = U V^T must equal the polar rotation from numpy's SVD."""
    F = _random_F(n=100, seed=2, scale=0.3)
    U, S, Vt = svd3x3(jnp.asarray(F))
    R = np.asarray(U) @ np.asarray(Vt)
    Un, Sn, Vtn = np.linalg.svd(F)
    Rn = Un @ Vtn
    np.testing.assert_allclose(R, Rn, atol=5e-3)
