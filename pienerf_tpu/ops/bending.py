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

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from pienerf_tpu.ops import spatial_hash as sh


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


def find_closest_ips(
    layout: sh.HashGridLayout,
    table: jax.Array,
    p_def: jax.Array,            # [nIP, 3]
    x: jax.Array,                # [M, 3]
    k: int,
) -> Tuple[jax.Array, jax.Array]:
    """k nearest IPs among the 27-cell neighborhood of each x.

    Returns (ids [M, k] int32 with -1 for missing, dist [M, k]).
    Iterative min-extraction — no sort (k <= 3).
    """
    g = sh.cell_of(layout, x)
    cand = sh.gather_neighborhood(layout, table, g)            # [M, C]
    valid = cand >= 0
    pc = p_def[jnp.clip(cand, 0, None)]                        # [M, C, 3]
    d2 = jnp.sum((pc - x[:, None, :]) ** 2, axis=-1)
    d2 = jnp.where(valid, d2, jnp.inf)

    ids = []
    dists = []
    for _ in range(k):
        j = jnp.argmin(d2, axis=1)                             # [M]
        rows = jnp.arange(x.shape[0])
        best = d2[rows, j]
        ids.append(jnp.where(jnp.isfinite(best), cand[rows, j], -1))
        dists.append(jnp.sqrt(jnp.where(jnp.isfinite(best), best, 0.0)))
        d2 = d2.at[rows, j].set(jnp.inf)
    return jnp.stack(ids, axis=1), jnp.stack(dists, axis=1)


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
        dFq = jnp.einsum("mkjdc,mkj->mkdc", dF_k, q)            # (dF . q)
        J = F_k + dFq
        J_inv, ok = _inv3x3(J)
        # residual g(q) = F q + 1/2 (dF.q) q - q_target
        Fq = jnp.einsum("mkdc,mkc->mkd", F_k, q)
        dFq_q = jnp.einsum("mkdc,mkc->mkd", dFq, q)
        r = Fq + 0.5 * dFq_q - q_target
        dq = jnp.einsum("mkdc,mkc->mkd", J_inv, r)
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
) -> Tuple[jax.Array, jax.Array]:
    """Map deformed samples to rest space. Returns (x_rest [M,3], found [M]).

    found=False means no usable IP: the caller treats the sample as empty
    space (the reference skips it, raymarching.cu:1212-1254).
    """
    k = settings.num_seek_ip
    ids, dist = find_closest_ips(layout, table, p_def, x, k)   # [M, k]
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
    x_rest = jnp.einsum("mk,mkd->md", w, p_rest)
    x_rest = jnp.where(found[:, None], x_rest, x)
    return x_rest, found
