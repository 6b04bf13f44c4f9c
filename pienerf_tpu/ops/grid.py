"""Cascaded occupancy grid: storage, maintenance, and lookups.

Layout matches reference checkpoints: density [cascade, 128^3] float32 in
Morton (Z-curve) order (reference: nerf/renderer.py:100-113). The bitfield is
packed into uint32 words (bit i of word w = cell w*32 + i) instead of the
reference's uint8 — same linear order, wider loads.

Maintenance mirrors nerf/renderer.py:456-547: EMA decay max(grid*decay, new),
mean-density threshold, full updates for the first 16 iterations then partial
updates. Partial updates sample uniform random cells (the reference
additionally resamples occupied cells, renderer.py:499-525; uniform coverage
at 2x count has the same refresh effect and keeps shapes static).
"""

from __future__ import annotations


from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pienerf_tpu.ops.morton import morton3d, morton3d_invert

GRID_SIZE = 128


class OccupancyGrid(NamedTuple):
    density: jax.Array       # [cascade, H^3] f32, Morton order; -1 = untrained
    bitfield: jax.Array      # [cascade * H^3 // 32] uint32
    mean_density: jax.Array  # f32 scalar
    iter_density: jax.Array  # int32 scalar


def init(cascade: int) -> OccupancyGrid:
    h3 = GRID_SIZE**3
    return OccupancyGrid(
        density=jnp.zeros((cascade, h3), jnp.float32),
        bitfield=jnp.zeros(cascade * h3 // 32, jnp.uint32),
        mean_density=jnp.zeros((), jnp.float32),
        iter_density=jnp.zeros((), jnp.int32),
    )


def packbits(density: jax.Array, thresh: jax.Array) -> jax.Array:
    """density [CAS, H^3] -> uint32 bitfield [CAS*H^3//32]
    (reference raymarching.cu:271-292, widened to 32-bit words)."""
    bits = (density.reshape(-1, 32) > thresh).astype(jnp.uint32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(bits << shifts[None, :], axis=1, dtype=jnp.uint32)


def occupied(bitfield: jax.Array, level: jax.Array, code: jax.Array) -> jax.Array:
    """Bit test at Morton code(s) for cascade level(s). Shapes broadcast."""
    index = level.astype(jnp.uint32) * jnp.uint32(GRID_SIZE**3) + code.astype(jnp.uint32)
    word = bitfield[(index >> jnp.uint32(5)).astype(jnp.int32)]
    return (word >> (index & jnp.uint32(31))) & jnp.uint32(1) > 0


def _eval_cascade_chunk(density_fn, coords, cas_bound, half_grid, noise):
    """Density at jittered cell centers of one cascade chunk.

    Deliberately not jitted here: density_fn changes identity per call (it
    closes over current params), so the caller supplies an already-jitted
    density_fn and this wrapper stays trace-free.
    """
    xyz = (2.0 * coords.astype(jnp.float32) / (GRID_SIZE - 1) - 1.0)
    xyz = xyz * (cas_bound - half_grid) + noise * half_grid
    return density_fn(xyz)


def update(
    grid: OccupancyGrid,
    density_fn: Callable[[jax.Array], jax.Array],
    bound: float,
    density_thresh: float,
    rng: jax.Array,
    decay: float = 0.95,
    chunk: int = 2**18,
    full_threshold: int = 16,
) -> OccupancyGrid:
    """Refresh the density grid + bitfield (reference renderer.py:456-547).

    density_fn: [M, 3] world positions -> [M] sigma (already density-scaled).
    Host-orchestrated; inner evals are jitted by the caller's density_fn.
    """
    cascade = grid.density.shape[0]
    h3 = GRID_SIZE**3
    full = int(grid.iter_density) < full_threshold

    tmp = -jnp.ones_like(grid.density)

    if full:
        codes = jnp.arange(h3, dtype=jnp.int32)
        xs, ys, zs = morton3d_invert(codes)
        coords_all = jnp.stack([xs, ys, zs], axis=-1)           # [h3, 3]
        for cas in range(cascade):
            cas_bound = min(2**cas, bound)
            half = cas_bound / GRID_SIZE
            vals = []
            for s in range(0, h3, chunk):
                coords = coords_all[s:s + chunk]
                rng, k = jax.random.split(rng)
                noise = jax.random.uniform(k, coords.shape, minval=-1, maxval=1)
                vals.append(
                    _eval_cascade_chunk(density_fn, coords, cas_bound, half, noise)
                )
            tmp = tmp.at[cas, :].set(jnp.concatenate(vals))
    else:
        n = h3 // 2
        for cas in range(cascade):
            rng, k1, k2 = jax.random.split(rng, 3)
            coords = jax.random.randint(k1, (n, 3), 0, GRID_SIZE, jnp.int32)
            codes = morton3d(coords[:, 0], coords[:, 1], coords[:, 2])
            cas_bound = min(2**cas, bound)
            half = cas_bound / GRID_SIZE
            noise = jax.random.uniform(k2, coords.shape, minval=-1, maxval=1)
            sig = _eval_cascade_chunk(density_fn, coords, cas_bound, half, noise)
            tmp = tmp.at[cas, codes].set(sig)

    valid = (grid.density >= 0) & (tmp >= 0)
    density = jnp.where(valid, jnp.maximum(grid.density * decay, tmp),
                        grid.density)
    mean_density = jnp.mean(jnp.clip(density, 0.0, None))
    thresh = jnp.minimum(mean_density, density_thresh)
    return OccupancyGrid(
        density=density,
        bitfield=packbits(density, thresh),
        mean_density=mean_density,
        iter_density=grid.iter_density + 1,
    )


def mark_untrained(grid: OccupancyGrid, poses: np.ndarray,
                   intrinsics: np.ndarray, bound: float) -> OccupancyGrid:
    """Mark cells invisible from every training camera as -1
    (reference renderer.py:391-453). Host/numpy one-time pass."""
    cascade = grid.density.shape[0]
    h3 = GRID_SIZE**3
    fx, fy, cx, cy = intrinsics
    poses = np.asarray(poses, np.float32)

    codes = np.arange(h3, dtype=np.int64)
    xs_, ys_, zs_ = morton3d_invert(jnp.asarray(codes, jnp.int32))
    coords = np.stack([np.asarray(xs_), np.asarray(ys_), np.asarray(zs_)], -1)
    world = 2.0 * coords.astype(np.float32) / (GRID_SIZE - 1) - 1.0    # [-1,1]

    density = np.asarray(grid.density).copy()
    B = poses.shape[0]
    for cas in range(cascade):
        cas_bound = min(2**cas, bound)
        half = cas_bound / GRID_SIZE
        pts = world * (cas_bound - half)
        count = np.zeros(h3, np.int64)
        for b0 in range(0, B, 16):
            ps = poses[b0:b0 + 16]
            cam = pts[None] - ps[:, None, :3, 3]
            cam = np.einsum("bnj,bjk->bnk", cam, ps[:, :3, :3])
            mask_z = cam[..., 2] > 0
            mask_x = np.abs(cam[..., 0]) < cx / fx * cam[..., 2] + half * 2
            mask_y = np.abs(cam[..., 1]) < cy / fy * cam[..., 2] + half * 2
            count += (mask_z & mask_x & mask_y).sum(0)
        density[cas, count == 0] = -1

    return grid._replace(density=jnp.asarray(density))
