"""3D Morton (Z-order) encoding, vectorized for JAX.

The occupancy grid is stored in Morton-linearized order so that the density
grid layout matches released reference checkpoints bit-for-bit
(reference: raymarching/src/raymarching.cu:56-81).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _u32(x):
    return jnp.uint32(x)


def _expand_bits(v):
    """Spread the low 10 bits of v so there are two zero bits between each.

    Shift/or/and only — the multiply-based variant the reference uses
    (raymarching.cu:56-63) hits the TPU VPU's slow emulated u32 multiply
    (~2 G/s); shifts run at full vector rate."""
    v = (v | (v << _u32(16))) & _u32(0xFF0000FF)
    v = (v | (v << _u32(8))) & _u32(0x0F00F00F)
    v = (v | (v << _u32(4))) & _u32(0xC30C30C3)
    v = (v | (v << _u32(2))) & _u32(0x49249249)
    return v


def morton3d(x, y, z):
    """Interleave 10-bit x, y, z into a 30-bit Morton code (int32 arrays)."""
    x = jnp.asarray(x, jnp.uint32)
    y = jnp.asarray(y, jnp.uint32)
    z = jnp.asarray(z, jnp.uint32)
    code = _expand_bits(x) | (_expand_bits(y) << 1) | (_expand_bits(z) << 2)
    return code.astype(jnp.int32)


def _compact_bits(x):
    x = x & _u32(0x49249249)
    x = (x | (x >> 2)) & _u32(0xC30C30C3)
    x = (x | (x >> 4)) & _u32(0x0F00F00F)
    x = (x | (x >> 8)) & _u32(0xFF0000FF)
    x = (x | (x >> 16)) & _u32(0x0000FFFF)
    return x


def morton3d_invert(code):
    """Inverse of morton3d: code -> (x, y, z)."""
    code = jnp.asarray(code, jnp.uint32)
    x = _compact_bits(code)
    y = _compact_bits(code >> 1)
    z = _compact_bits(code >> 2)
    return x.astype(jnp.int32), y.astype(jnp.int32), z.astype(jnp.int32)


# numpy twins for host-side/one-time work and for tests
def morton3d_np(x, y, z):
    x, y, z = (np.asarray(a, np.uint32) for a in (x, y, z))

    def expand(v):
        v = (v * np.uint32(0x00010001)) & np.uint32(0xFF0000FF)
        v = (v * np.uint32(0x00000101)) & np.uint32(0x0F00F00F)
        v = (v * np.uint32(0x00000011)) & np.uint32(0xC30C30C3)
        v = (v * np.uint32(0x00000005)) & np.uint32(0x49249249)
        return v

    with np.errstate(over="ignore"):
        return (expand(x) | (expand(y) << np.uint32(1)) | (expand(z) << np.uint32(2))).astype(np.int32)
