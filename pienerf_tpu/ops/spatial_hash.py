"""Uniform-grid spatial hash over deformed integration points.

The reference builds a CSR (pig_cnt / pig_bgn / pig_idx) with two atomic
passes every frame (reference: nerf/utils.py:355-443). Variable-length CSR
is hostile to static shapes, so we build a dense cell table
[n_cells, max_per_cell] of point indices (-1 padded) with one sort — fully
jittable, deterministic, rebuilt per frame inside the frame function.

The grid covers a static domain (the scene box inflated by 5%) so its
resolution — and every downstream shape — is compile-time constant; the
per-frame deformed bounding box only affects ray near/far values.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class HashGridLayout(NamedTuple):
    """Static layout (hashable)."""
    bbmin: Tuple[float, float, float]
    hgs: float
    resolution: Tuple[int, int, int]
    max_per_cell: int

    @property
    def n_cells(self) -> int:
        r = self.resolution
        return r[0] * r[1] * r[2]


def make_layout(bound: float, hgs: float, max_per_cell: int = 16,
                margin: float = 0.05) -> HashGridLayout:
    lo = -bound * (1.0 + margin)
    size = 2.0 * bound * (1.0 + margin)
    res = int(np.ceil(size / hgs))
    return HashGridLayout(
        bbmin=(lo, lo, lo), hgs=float(hgs), resolution=(res, res, res),
        max_per_cell=int(max_per_cell),
    )


def cell_of(layout: HashGridLayout, p: jax.Array) -> jax.Array:
    """Integer cell coords of points [..., 3], clamped into the grid."""
    bbmin = jnp.asarray(layout.bbmin, jnp.float32)
    g = jnp.floor((p - bbmin) / layout.hgs).astype(jnp.int32)
    res = jnp.asarray(layout.resolution, jnp.int32)
    return jnp.clip(g, 0, res - 1)


def cell_index(layout: HashGridLayout, g: jax.Array) -> jax.Array:
    """Linear cell id; z-major like the reference (utils.py:419):
    gid = g2 * res1 * res0 + g1 * res0 + g0."""
    r0, r1, _ = layout.resolution
    return (g[..., 2] * (r1 * r0) + g[..., 1] * r0 + g[..., 0]).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("layout",))
def build_table(layout: HashGridLayout, points: jax.Array
                ) -> Tuple[jax.Array, jax.Array]:
    """Build the dense cell table for points [n, 3].

    Returns (table [n_cells, max_per_cell] int32 point ids with -1 padding,
    counts [n_cells] int32 — counts may exceed max_per_cell; extra points
    are dropped from the table).
    """
    n = points.shape[0]
    cid = cell_index(layout, cell_of(layout, points))          # [n]
    order = jnp.argsort(cid)
    cid_sorted = cid[order]
    # rank within the cell: position minus first occurrence of this cid
    first = jnp.searchsorted(cid_sorted, cid_sorted, side="left")
    rank = jnp.arange(n, dtype=jnp.int32) - first.astype(jnp.int32)

    table = jnp.full((layout.n_cells, layout.max_per_cell), -1, jnp.int32)
    keep = rank < layout.max_per_cell
    table = table.at[
        jnp.where(keep, cid_sorted, layout.n_cells),
        jnp.where(keep, rank, 0),
    ].set(order.astype(jnp.int32), mode="drop")
    counts = jnp.zeros(layout.n_cells, jnp.int32).at[cid].add(1, mode="drop")
    return table, counts


@functools.partial(jax.jit, static_argnames=("layout",))
def dilated_occupancy(layout: HashGridLayout, counts: jax.Array) -> jax.Array:
    """3^3-dilated boolean cell occupancy [n_cells] — 'is any IP within one
    cell of here'. Used to prefilter lattice points before the expensive
    bending solve."""
    r0, r1, r2 = layout.resolution
    occ = (counts > 0).reshape(r2, r1, r0)                     # z, y, x order

    # separable dilation: max over shifts -1, 0, +1 per axis
    def dilate(a, axis):
        lo = jnp.roll(a, 1, axis=axis)
        hi = jnp.roll(a, -1, axis=axis)
        # roll wraps; zero the wrapped slabs
        idx = [slice(None)] * 3
        idx[axis] = 0
        lo = lo.at[tuple(idx)].set(False)
        idx[axis] = -1
        hi = hi.at[tuple(idx)].set(False)
        return a | lo | hi

    out = occ
    for axis in range(3):
        out = dilate(out, axis)
    return out.reshape(-1)


def gather_neighborhood(layout: HashGridLayout, table: jax.Array,
                        g: jax.Array) -> jax.Array:
    """Candidate point ids from the 27-cell neighborhood of cells g [M, 3].

    Returns [M, 27 * max_per_cell] int32 (-1 = empty slot / out of grid).
    Mirrors the reference's cell + 26-neighbor search
    (raymarching.cu:986-1119).
    """
    res = jnp.asarray(layout.resolution, jnp.int32)
    offs = jnp.asarray(
        [[dx, dy, dz] for dz in (-1, 0, 1) for dy in (-1, 0, 1)
         for dx in (-1, 0, 1)], jnp.int32,
    )                                                          # [27, 3]
    ng = g[:, None, :] + offs[None]                            # [M, 27, 3]
    in_grid = jnp.all((ng >= 0) & (ng < res), axis=-1)         # [M, 27]
    cid = cell_index(layout, jnp.clip(ng, 0, res - 1))         # [M, 27]
    cand = table[cid]                                          # [M, 27, mpc]
    cand = jnp.where(in_grid[..., None], cand, -1)
    return cand.reshape(g.shape[0], -1)
