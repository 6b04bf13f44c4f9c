"""Quadratic ray bending: map deformed-space samples back to rest space.

The novel PIE-NeRF operation (reference: raymarching/src/raymarching.cu:
930-1489). For each deformed-space sample x:

1. find the k nearest deformed integration points (IPs) via the 27-cell
   spatial-hash neighborhood (k = num_seek_IP in 1..3),
2. per IP, Newton-solve the quadratic Taylor expansion of the deformation
   map for the rest-space offset q:
       F q + 1/2 (dF . q) q = x - p_def_k
   with Jacobian J = F + (dF . q)   [using symmetry of dF in its derivative
   indices], rejecting IPs whose solution moved more than IP_dx per axis,
3. inverse-distance blend the valid rest-space positions.

Conventions (match sim/solver.py): F[d, c] = d phi_d / d p_c,
dF[j, d, c] = d^2 phi_d / (d p_c d p_j), so (dF . q)[d, c] =
sum_j dF[j, d, c] q_j.

Documented divergences from the reference CUDA kernel (all in the direction
of correctness):
- IDW weights use deformed-space distances |x - p_def_k|; the reference
  mixes frames by using rest positions against the deformed sample
  (raymarching.cu:1340-1371).
- Rejected IPs are excluded from the blend; the reference decrements its
  count but still blends a positional prefix (raymarching.cu:1316-1319).
- The reference's cut-bounds test reuses `x` for the y-interval
  (raymarching.cu:1210); we test y against cut_bounds[2:4] as intended.

Everything is fully vectorized and branchless: fixed 27-cell gathers, k<=3
iterative min-extraction instead of a sort, Newton with a static iteration
bound and convergence masking.
"""

from __future__ import annotations


from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from pienerf_tpu.ops import spatial_hash as sh

# Newton inversion is the exactness reference for the flagship kernel;
# DEFAULT f32 matmul precision on TPU is a single bf16 pass, which would
# silently truncate F/q to ~3 decimal digits (see sim/solver._HI).
_HI = jax.lax.Precision.HIGHEST


def _inv3x3(A: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Batched closed-form 3x3 inverse. Returns (A_inv, ok mask)."""
    a = A
    c00 = a[..., 1, 1] * a[..., 2, 2] - a[..., 1, 2] * a[..., 2, 1]
    c01 = a[..., 1, 2] * a[..., 2, 0] - a[..., 1, 0] * a[..., 2, 2]
    c02 = a[..., 1, 0] * a[..., 2, 1] - a[..., 1, 1] * a[..., 2, 0]
    det = a[..., 0, 0] * c00 + a[..., 0, 1] * c01 + a[..., 0, 2] * c02
    ok = jnp.abs(det) > 1e-20
    inv_det = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
    adj = jnp.stack([
        jnp.stack([c00,
                   a[..., 0, 2] * a[..., 2, 1] - a[..., 0, 1] * a[..., 2, 2],
                   a[..., 0, 1] * a[..., 1, 2] - a[..., 0, 2] * a[..., 1, 1]], -1),
        jnp.stack([c01,
                   a[..., 0, 0] * a[..., 2, 2] - a[..., 0, 2] * a[..., 2, 0],
                   a[..., 0, 2] * a[..., 1, 0] - a[..., 0, 0] * a[..., 1, 2]], -1),
        jnp.stack([c02,
                   a[..., 0, 1] * a[..., 2, 0] - a[..., 0, 0] * a[..., 2, 1],
                   a[..., 0, 0] * a[..., 1, 1] - a[..., 0, 1] * a[..., 1, 0]], -1),
    ], -2)
    return inv_det[..., None, None] * adj, ok


def _topk_smallest(cand: jax.Array, d2: jax.Array, k: int
                   ) -> Tuple[jax.Array, jax.Array]:
    """k smallest by iterative min-extraction (k small). cand/d2: [M, C]."""
    ids, dists = [], []
    rows = jnp.arange(cand.shape[0])
    for _ in range(k):
        j = jnp.argmin(d2, axis=1)
        best = d2[rows, j]
        ids.append(jnp.where(jnp.isfinite(best), cand[rows, j], -1))
        dists.append(jnp.sqrt(jnp.where(jnp.isfinite(best), best, 0.0)))
        d2 = d2.at[rows, j].set(jnp.inf)
    return jnp.stack(ids, axis=1), jnp.stack(dists, axis=1)


def find_closest_ips(
    layout: sh.HashGridLayout,
    table: jax.Array,
    p_def: jax.Array,            # [nIP, 3]
    x: jax.Array,                # [M, 3]
    k: int,
) -> Tuple[jax.Array, jax.Array]:
    """Exact k nearest IPs among the 27-cell neighborhood of each x.

    Returns (ids [M, k] int32 with -1 for missing, dist [M, k]).
    Gathers the full neighborhood per sample — use only for modest M; the
    render path uses the per-cell candidate cache below.
    """
    g = sh.cell_of(layout, x)
    cand = sh.gather_neighborhood(layout, table, g)            # [M, C]
    valid = cand >= 0
    pc = p_def[jnp.clip(cand, 0, None)]                        # [M, C, 3]
    d2 = jnp.sum((pc - x[:, None, :]) ** 2, axis=-1)
    d2 = jnp.where(valid, d2, jnp.inf)
    return _topk_smallest(cand, d2, k)


def build_cell_candidates(
    layout: sh.HashGridLayout,
    table: jax.Array,
    p_def: jax.Array,            # [nIP, 3]
    k_cand: int = 8,
) -> jax.Array:
    """Per-frame cache: the k_cand IPs nearest to each CELL CENTER, drawn
    from the cell's 27-neighborhood. [n_cells, k_cand] int32, -1 padded.

    Shrinks the per-sample k-NN from 27 * max_per_cell gathered candidates
    (the reference kernel re-walks all 27 cells per sample,
    raymarching.cu:986-1119) to k_cand cached ones. Approximation: a
    sample's true nearest IP is assumed to be among the k_cand nearest to
    its cell center — sound for k_cand >= ~8 given IP spacing ~ cell size.
    """
    r0, r1, r2 = layout.resolution
    gz, gy, gx = jnp.meshgrid(
        jnp.arange(r2), jnp.arange(r1), jnp.arange(r0), indexing="ij"
    )
    cells = jnp.stack([gx.ravel(), gy.ravel(), gz.ravel()], -1)  # [n_cells,3]
    bbmin = jnp.asarray(layout.bbmin, jnp.float32)
    centers = bbmin + (cells.astype(jnp.float32) + 0.5) * layout.hgs

    cand = sh.gather_neighborhood(layout, table, cells)          # [n_cells, C]
    valid = cand >= 0
    pc = p_def[jnp.clip(cand, 0, None)]
    d2 = jnp.sum((pc - centers[:, None, :]) ** 2, axis=-1)
    d2 = jnp.where(valid, d2, jnp.inf)
    ids, _ = _topk_smallest(cand, d2, k_cand)
    return ids


def find_closest_ips_cached(
    layout: sh.HashGridLayout,
    cell_cand: jax.Array,        # [n_cells, k_cand]
    p_def: jax.Array,            # [nIP, 3]
    x: jax.Array,                # [M, 3]
    k: int,
) -> Tuple[jax.Array, jax.Array]:
    """k nearest IPs per sample using the per-cell candidate cache."""
    cid = sh.cell_index(layout, sh.cell_of(layout, x))          # [M]
    cand = cell_cand[cid]                                        # [M, kc]
    valid = cand >= 0
    pc = p_def[jnp.clip(cand, 0, None)]
    d2 = jnp.sum((pc - x[:, None, :]) ** 2, axis=-1)
    d2 = jnp.where(valid, d2, jnp.inf)
    return _topk_smallest(cand, d2, k)


def newton_invert(
    x: jax.Array,                # [M, 3] deformed sample
    p_ori_k: jax.Array,          # [M, k, 3] rest IP positions
    p_def_k: jax.Array,          # [M, k, 3] deformed IP positions
    F_k: jax.Array,              # [M, k, 3, 3]
    dF_k: jax.Array,             # [M, k, 3, 3, 3]
    max_iter: int,
) -> Tuple[jax.Array, jax.Array]:
    """Per-(sample, IP) Newton solve for the rest-space point
    (raymarching.cu:1256-1324). Returns (p_rest [M, k, 3], ok [M, k])."""
    q_target = x[:, None, :] - p_def_k                          # [M, k, 3]
    q = jnp.zeros_like(q_target)                                # rest offset

    def body(_, carry):
        q, alive = carry
        dFq = jnp.einsum("mkjdc,mkj->mkdc", dF_k, q, precision=_HI)
        J = F_k + dFq
        J_inv, ok = _inv3x3(J)
        # residual g(q) = F q + 1/2 (dF.q) q - q_target
        Fq = jnp.einsum("mkdc,mkc->mkd", F_k, q, precision=_HI)
        dFq_q = jnp.einsum("mkdc,mkc->mkd", dFq, q, precision=_HI)
        r = Fq + 0.5 * dFq_q - q_target
        dq = jnp.einsum("mkdc,mkc->mkd", J_inv, r, precision=_HI)
        step_ok = ok & alive
        q_new = jnp.where(step_ok[..., None], q - dq, q)
        converged = jnp.sum(dq * dq, axis=-1) < 1e-12
        alive = alive & ok & ~converged
        return q_new, alive

    alive0 = jnp.ones(q.shape[:-1], bool)
    q, _ = jax.lax.fori_loop(0, max_iter, body, (q, alive0))
    return p_ori_k + q, jnp.ones(q.shape[:-1], bool)


class BendSettings(NamedTuple):
    """Static bending configuration."""
    num_seek_ip: int = 3
    max_iter_num: int = 1
    ip_dx: float = 0.0525          # sim.dx * 1.05 (main_gui.py:56)
    cut: bool = False


def bend_points(
    layout: sh.HashGridLayout,
    settings: BendSettings,
    table: jax.Array,
    p_def: jax.Array,            # [nIP, 3]
    p_ori: jax.Array,            # [nIP, 3]
    F: jax.Array,                # [nIP, 3, 3]
    dF: jax.Array,               # [nIP, 3, 3, 3]
    x: jax.Array,                # [M, 3] deformed-space samples
    bbmin: jax.Array,            # [3] deformed bbox (dynamic values)
    bbmax: jax.Array,            # [3]
    cell_cand: Optional[jax.Array] = None,   # [n_cells, k_cand] cache
) -> Tuple[jax.Array, jax.Array]:
    """Map deformed samples to rest space. Returns (x_rest [M,3], found [M]).

    found=False means no usable IP: the caller treats the sample as empty
    space (the reference skips it, raymarching.cu:1212-1254). Pass
    cell_cand (from build_cell_candidates) to use the cached k-NN path.
    """
    k = settings.num_seek_ip
    if cell_cand is not None:
        ids, dist = find_closest_ips_cached(layout, cell_cand, p_def, x, k)
    else:
        ids, dist = find_closest_ips(layout, table, p_def, x, k)  # [M, k]
    has = ids >= 0
    safe = jnp.clip(ids, 0, None)

    pd = p_def[safe]                                            # [M, k, 3]
    po = p_ori[safe]
    Fk = F[safe]
    dFk = dF[safe]

    # reject IPs on/outside the deformed bbox (raymarching.cu:1243-1251)
    inside = jnp.all((pd > bbmin) & (pd < bbmax), axis=-1)
    has = has & inside

    p_rest, _ = newton_invert(x, po, pd, Fk, dFk, settings.max_iter_num)

    # reject diverged solutions: moved more than ip_dx per axis
    moved = jnp.abs(p_rest - po)
    ok = has & jnp.all(moved <= settings.ip_dx, axis=-1)        # [M, k]

    # inverse-distance blend of valid candidates (deformed-space distances)
    w = jnp.where(ok, 1.0 / jnp.maximum(dist, 1e-8), 0.0)       # [M, k]
    wsum = jnp.sum(w, axis=1)
    found = wsum > 0
    w = w / jnp.maximum(wsum, 1e-30)[:, None]
    x_rest = jnp.einsum("mk,mkd->md", w, p_rest, precision=_HI)
    x_rest = jnp.where(found[:, None], x_rest, x)
    return x_rest, found
