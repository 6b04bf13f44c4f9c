"""Occupancy-guided ray marching and volume compositing, TPU-native.

Key observation: the reference CUDA march (raymarching.cu:315-493, 704-813)
always advances t on a fixed recurrence ``t += clamp(t * dt_gamma, dt_min,
dt_max)`` — the empty-space DDA "skip" only avoids *occupancy tests* at
lattice points, never changes which t values can be visited. The visited t
sequence is therefore a closed-form lattice computable in parallel:

  phase 1 (t*gamma < dt_min):  arithmetic, step dt_min
  phase 2 (dt_min..dt_max):    geometric, ratio (1 + gamma)
  phase 3 (t*gamma > dt_max):  arithmetic, step dt_max

So instead of sequential per-ray marching with atomic compaction, we evaluate
occupancy at every lattice point of every ray at once (bit tests, VPU-cheap),
then rank-compact the occupied points into a fixed [N, K] sample buffer with
a cumsum + scatter (no sort). Compositing is a masked exclusive-scan over the
sample axis — exactly the math whose hand-written CUDA backward the reference
carries (raymarching.cu:646-685); here XLA differentiates it directly.
"""

from __future__ import annotations


from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pienerf_tpu.ops.grid import GRID_SIZE, occupied
from pienerf_tpu.ops.morton import morton3d

SQRT3 = 1.7320508075688772
BIG = jnp.float32(3.4e38)  # miss sentinel (reference uses FLT_MAX)


def near_far_from_aabb(rays_o: jax.Array, rays_d: jax.Array, aabb: jax.Array,
                       min_near: float = 0.2) -> Tuple[jax.Array, jax.Array]:
    """Slab test (reference raymarching.cu:92-160). aabb = [6] min/max.

    Misses return (BIG, BIG).
    """
    inv_d = 1.0 / rays_d
    t0 = (aabb[None, :3] - rays_o) * inv_d
    t1 = (aabb[None, 3:] - rays_o) * inv_d
    tmin = jnp.minimum(t0, t1)
    tmax = jnp.maximum(t0, t1)
    near = jnp.max(tmin, axis=-1)
    far = jnp.min(tmax, axis=-1)
    miss = near > far
    near = jnp.maximum(near, min_near)
    return jnp.where(miss, BIG, near), jnp.where(miss, BIG, far)


def sph_from_ray(rays_o: jax.Array, rays_d: jax.Array, radius: float
                 ) -> jax.Array:
    """Ray -> background-sphere intersection in normalized spherical coords
    (reference raymarching.cu:163-229): returns [N, 2] (theta, phi)/pi in
    [-1, 1]."""
    # solve |o + t d|^2 = radius^2 for the far root
    b = jnp.sum(rays_o * rays_d, -1)
    c = jnp.sum(rays_o * rays_o, -1) - radius * radius
    disc = jnp.maximum(b * b - c, 0.0)
    t = -b + jnp.sqrt(disc)
    p = rays_o + t[:, None] * rays_d
    theta = jnp.arctan2(jnp.sqrt(p[:, 0] ** 2 + p[:, 2] ** 2), p[:, 1])  # [0, pi]
    phi = jnp.arctan2(p[:, 2], p[:, 0])                                   # [-pi, pi]
    return jnp.stack([2.0 * theta / jnp.pi - 1.0, phi / jnp.pi], axis=-1)


def t_lattice(t0: jax.Array, n_steps: int, dt_gamma: float, dt_min: float,
              dt_max: float) -> Tuple[jax.Array, jax.Array]:
    """Closed form of the reference's t recurrence (see module doc).

    t0: [N] start values. Returns (t [N, S], dt [N, S]) with
    t[:, 0] = t0 and t[:, i+1] = t[:, i] + clamp(t[:, i]*gamma, dt_min, dt_max).
    """
    i = jnp.arange(n_steps, dtype=jnp.float32)[None, :]
    t0 = t0[:, None]
    if dt_gamma <= 0:
        t = t0 + i * dt_min
        dt = jnp.full_like(t, dt_min)
        return t, dt

    g = dt_gamma
    ta = dt_min / g           # below: arithmetic dt_min
    tb = dt_max / g           # above: arithmetic dt_max
    log1pg = np.log1p(g)

    # number of dt_min steps to reach ta
    n1 = jnp.ceil(jnp.maximum(ta - t0, 0.0) / dt_min)
    t1 = t0 + n1 * dt_min     # first t in the geometric phase
    # number of geometric steps from t1 to tb
    n2 = jnp.ceil(jnp.maximum(jnp.log(jnp.maximum(tb / t1, 1.0)), 0.0) / log1pg)
    t2 = t1 * jnp.exp(n2 * log1pg)

    t_arith = t0 + i * dt_min
    t_geom = t1 * jnp.exp((i - n1) * log1pg)
    t_tail = t2 + (i - n1 - n2) * dt_max
    t = jnp.where(i < n1, t_arith, jnp.where(i < n1 + n2, t_geom, t_tail))
    dt = jnp.clip(t * g, dt_min, dt_max)
    return t, dt


def mip_level(x: jax.Array, dt: jax.Array, cascade: int) -> jax.Array:
    """max(mip_from_pos, mip_from_dt) (reference raymarching.cu:42-55)."""
    mx = jnp.max(jnp.abs(x), axis=-1)
    _, e_pos = jnp.frexp(mx)
    _, e_dt = jnp.frexp(dt * GRID_SIZE * 0.5)
    lvl = jnp.maximum(jnp.maximum(e_pos, e_dt), 0)
    return jnp.minimum(lvl, cascade - 1).astype(jnp.int32)


def mip_level_c(x0, x1, x2, dt: jax.Array, cascade: int) -> jax.Array:
    """Componentwise mip_level (keeps batch dims minormost — no [..., 3])."""
    mx = jnp.maximum(jnp.abs(x0), jnp.maximum(jnp.abs(x1), jnp.abs(x2)))
    _, e_pos = jnp.frexp(mx)
    _, e_dt = jnp.frexp(dt * GRID_SIZE * 0.5)
    lvl = jnp.maximum(jnp.maximum(e_pos, e_dt), 0)
    return jnp.minimum(lvl, cascade - 1).astype(jnp.int32)


def occupancy_at_c(bitfield, x0, x1, x2, dt, bound: float, cascade: int):
    """Occupancy bit at componentwise world positions (any batch shape)."""
    lvl = mip_level_c(x0, x1, x2, dt, cascade)
    mip_bound = jnp.minimum(jnp.exp2(lvl.astype(jnp.float32)), bound)
    inv = 1.0 / mip_bound

    def cellc(c):
        return jnp.clip(0.5 * (c * inv + 1.0) * GRID_SIZE, 0,
                        GRID_SIZE - 1).astype(jnp.int32)

    from pienerf_tpu.ops.grid import occupied
    from pienerf_tpu.ops.morton import morton3d
    code = morton3d(cellc(x0), cellc(x1), cellc(x2))
    return occupied(bitfield, lvl, code)


def march_lattice(
    rays_o: jax.Array,          # [N, 3]
    rays_d: jax.Array,          # [N, 3]
    nears: jax.Array,           # [N]
    fars: jax.Array,            # [N]
    bitfield: jax.Array,        # packed occupancy
    bound: float,
    cascade: int,
    n_steps: int,
    dt_gamma: float,
    max_steps: int,
    noise: jax.Array | None = None,   # [N] in [0,1] (perturb)
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Evaluate the full t-lattice and occupancy for every ray in parallel.

    Returns (t [N, S], dt [N, S], valid [N, S] bool). ``valid`` requires
    t < far and the containing occupancy cell's bit set.
    """
    dt_min = 2.0 * SQRT3 / max_steps
    dt_max = 2.0 * SQRT3 * (1 << (cascade - 1)) / GRID_SIZE

    t0 = nears
    if noise is not None:
        t0 = t0 + jnp.clip(t0 * dt_gamma, dt_min, dt_max) * noise
    t, dt = t_lattice(t0, n_steps, dt_gamma, dt_min, dt_max)

    # componentwise positions (batch dims minormost — see hash_encoder doc)
    xc = [jnp.clip(rays_o[:, i, None] + t * rays_d[:, i, None],
                   -bound, bound) for i in range(3)]
    occ = occupancy_at_c(bitfield, xc[0], xc[1], xc[2], dt, bound, cascade)

    valid = occ & (t < fars[:, None])
    return t, dt, valid


def compact_samples(valid: jax.Array, k: int
                    ) -> Tuple[jax.Array, jax.Array]:
    """First-k-valid compaction along the sample axis, static shapes.

    valid: [N, S] bool. Returns (idx [N, K] int32 lattice indices, mask
    [N, K] bool). Rank-scatter (cumsum + one scatter), no sort — this
    replaces the reference's atomic global sample counter
    (raymarching.cu:408-409).
    """
    n, s = valid.shape
    rank = jnp.cumsum(valid, axis=1) - 1                       # [N, S]
    take = valid & (rank < k)
    rows = jnp.broadcast_to(jnp.arange(n)[:, None], (n, s))
    src = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None, :], (n, s))
    idx = jnp.zeros((n, k), jnp.int32)
    idx = idx.at[rows, jnp.where(take, rank, k)].set(
        jnp.where(take, src, 0), mode="drop"
    )
    count = jnp.sum(take, axis=1)
    mask = jnp.arange(k)[None, :] < count[:, None]
    return idx, mask


def composite(
    sigmas: jax.Array,        # [N, K]
    rgbs: jax.Array,          # [N, K, 3]
    dts: jax.Array,           # [N, K] marching deltas
    ts: jax.Array,            # [N, K] sample positions along the ray
    mask: jax.Array,          # [N, K] bool
    T_thresh: float = 1e-2,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Transmittance compositing over the sample axis, fully vectorized.

    Matches reference semantics (raymarching.cu:504-580): alpha =
    1 - exp(-sigma * dt); a sample contributes iff all *previous* samples
    left transmittance >= T_thresh. Returns (weights_sum [N], depth [N],
    image [N, 3]). Depth uses absolute sample positions (divergence from the
    reference's delta-accumulated variant; documented in render/renderer.py).
    """
    tau = jnp.where(mask, sigmas * dts, 0.0)                   # [N, K]
    # exclusive cumulative optical depth -> T before each sample
    cum = jnp.cumsum(tau, axis=1)
    T_excl = jnp.exp(-(cum - tau))
    alpha = 1.0 - jnp.exp(-tau)
    # include while the post-sample transmittance of the previous sample
    # is still >= T_thresh
    T_post_prev = jnp.concatenate(
        [jnp.ones_like(T_excl[:, :1]), jnp.exp(-cum[:, :-1])], axis=1
    )
    include = (T_post_prev >= T_thresh) & mask
    w = jnp.where(include, alpha * T_excl, 0.0)                # [N, K]

    weights_sum = jnp.sum(w, axis=1)
    depth = jnp.sum(w * ts, axis=1)
    image = jnp.sum(w[..., None] * rgbs, axis=1)
    return weights_sum, depth, image


def composite_np(sigmas, rgbs, dts, ts, mask, T_thresh=1e-2):
    """Sequential numpy oracle mirroring raymarching.cu:504-580."""
    n, k = sigmas.shape
    ws = np.zeros(n)
    depth = np.zeros(n)
    image = np.zeros((n, 3))
    for i in range(n):
        T = 1.0
        for j in range(k):
            if not mask[i, j]:
                continue
            alpha = 1.0 - np.exp(-sigmas[i, j] * dts[i, j])
            wgt = alpha * T
            image[i] += wgt * rgbs[i, j]
            depth[i] += wgt * ts[i, j]
            ws[i] += wgt
            T *= 1.0 - alpha
            if T < T_thresh:
                break
    return ws, depth, image
