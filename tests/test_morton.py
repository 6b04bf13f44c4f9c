import jax.numpy as jnp
import numpy as np

from pienerf_tpu.ops.morton import morton3d, morton3d_invert, morton3d_np


def _morton_ref(x, y, z):
    """Bit-by-bit oracle."""
    out = 0
    for b in range(10):
        out |= ((x >> b) & 1) << (3 * b)
        out |= ((y >> b) & 1) << (3 * b + 1)
        out |= ((z >> b) & 1) << (3 * b + 2)
    return out


def test_morton_matches_oracle():
    rng = np.random.RandomState(0)
    xyz = rng.randint(0, 128, size=(256, 3))
    got = np.asarray(morton3d(xyz[:, 0], xyz[:, 1], xyz[:, 2]))
    want = np.array([_morton_ref(*r) for r in xyz])
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(morton3d_np(xyz[:, 0], xyz[:, 1], xyz[:, 2]), want)


def test_morton_roundtrip():
    rng = np.random.RandomState(1)
    xyz = rng.randint(0, 1024, size=(512, 3))
    code = morton3d(xyz[:, 0], xyz[:, 1], xyz[:, 2])
    x, y, z = morton3d_invert(code)
    np.testing.assert_array_equal(np.asarray(x), xyz[:, 0])
    np.testing.assert_array_equal(np.asarray(y), xyz[:, 1])
    np.testing.assert_array_equal(np.asarray(z), xyz[:, 2])


def test_morton_dense_is_permutation():
    g = jnp.arange(16)
    xx, yy, zz = jnp.meshgrid(g, g, g, indexing="ij")
    code = morton3d(xx.ravel(), yy.ravel(), zz.ravel())
    assert len(set(np.asarray(code).tolist())) == 16**3
