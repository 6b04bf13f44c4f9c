"""Multiresolution hash-grid encoder (Instant-NGP style), TPU-native.

Bit-exact index semantics with the reference CUDA encoder so released
checkpoints import cleanly (reference: gridencoder/src/gridencoder.cu:51-135,
gridencoder/grid.py:97-134):

- per-level scale  = exp2(level * log2(per_level_scale)) * base_res - 1
- resolution       = ceil(scale) + 1
- sample position  = x * scale + 0.5 (align_corners=False)
- dense index (stride over resolution+1) when (res+1)^D fits the level's
  hashmap, else xor-hash with primes {1, 2654435761, 805459861}
- index % hashmap_size, where hashmap_size is the 8-aligned per-level size
- inputs outside [0, 1] produce zeros

TPU layout note: every internal array keeps the BATCH dimension minormost
([L, 8, N], [C, L, N], ...). TPU tiles the two minormost dims to (8, 128);
a batch-major layout like [N, L, 8, 3] pads its tiny trailing dims to 128
lanes and inflates HBM footprint ~16-40x (observed: a [1M, 16, 8, 3] corner
intermediate compiled to a 24 GB allocation). Batch-last keeps every
intermediate exact-size. Embedding channels are gathered separately from
strided component views for the same reason.

The forward pass is C batched gathers over [L, 8, N] corner indices plus a
trilinear reduce — XLA fuses the interpolation and differentiates the gather
into a deterministic scatter-add (the reference uses atomicAdd,
gridencoder.cu:249-340, which is nondeterministic).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

_PRIMES = (1, 2654435761, 805459861)

Coords = Union[jax.Array, Tuple[jax.Array, ...]]


class HashGridSpec(NamedTuple):
    """Static layout of a hash grid (host-side; all fields hashable)."""
    num_levels: int
    level_dim: int
    base_resolution: int
    log2_hashmap_size: int
    input_dim: int
    per_level_scale: float
    offsets: Tuple[int, ...]          # [L+1] cumulative parameter offsets
    resolutions: Tuple[int, ...]      # [L] per-level grid resolution
    interpolation: str = "linear"

    @property
    def total_params(self) -> int:
        return self.offsets[-1]

    @property
    def output_dim(self) -> int:
        return self.num_levels * self.level_dim


def make_spec(input_dim: int = 3, num_levels: int = 16, level_dim: int = 2,
              base_resolution: int = 16, log2_hashmap_size: int = 19,
              desired_resolution: float | None = 2048,
              per_level_scale: float = 2.0,
              interpolation: str = "linear") -> HashGridSpec:
    """Parameter layout; matches gridencoder/grid.py:97-134 exactly."""
    if desired_resolution is not None:
        per_level_scale = float(
            np.exp2(np.log2(desired_resolution / base_resolution) / (num_levels - 1))
        )
    max_params = 2**log2_hashmap_size
    offsets = [0]
    resolutions = []
    offset = 0
    for lvl in range(num_levels):
        resolution = int(np.ceil(base_resolution * per_level_scale**lvl))
        params_in_level = min(max_params, (resolution + 1) ** input_dim)
        params_in_level = int(np.ceil(params_in_level / 8) * 8)
        offset += params_in_level
        offsets.append(offset)
        resolutions.append(resolution)
    return HashGridSpec(
        num_levels=num_levels,
        level_dim=level_dim,
        base_resolution=base_resolution,
        log2_hashmap_size=log2_hashmap_size,
        input_dim=input_dim,
        per_level_scale=per_level_scale,
        offsets=tuple(offsets),
        resolutions=tuple(resolutions),
        interpolation=interpolation,
    )


def init_params(rng: jax.Array, spec: HashGridSpec,
                dtype=jnp.float32) -> jax.Array:
    """Embedding table [total_params, level_dim], U(-1e-4, 1e-4)
    (gridencoder/grid.py:141-143)."""
    return jax.random.uniform(
        rng, (spec.total_params, spec.level_dim), dtype,
        minval=-1e-4, maxval=1e-4,
    )


def _level_constants(spec: HashGridSpec):
    """Per-level scalars as stacked arrays for vectorized-over-level encode."""
    S = math.log2(spec.per_level_scale)
    H = spec.base_resolution
    scales = np.exp2(np.arange(spec.num_levels) * S) * H - 1.0
    res = np.ceil(scales).astype(np.int64) + 1                 # kernel's `resolution`
    hashmap_sizes = np.diff(np.asarray(spec.offsets))
    # dense addressing when the full (res+1)^D lattice fits the level table
    dense = (res + 1).astype(object) ** spec.input_dim <= hashmap_sizes
    return (
        jnp.asarray(scales, jnp.float32),
        jnp.asarray(res, jnp.uint32),
        jnp.asarray(hashmap_sizes, jnp.uint32),
        jnp.asarray(np.asarray(spec.offsets[:-1]), jnp.uint32),
        jnp.asarray(dense.astype(bool)),
    )


def _axis_tables(spec: HashGridSpec):
    """Per-(level, axis) index-contribution lookup tables.

    The TPU VPU emulates u32 multiplies at ~2 G/s, so computing the hash
    (coord * prime) or the dense stride (coord * (res+1)^a) per corner is a
    bottleneck. Both are functions of a coordinate <= res+1, so we
    precompute T[axis][level, coord] once (host) and replace the multiplies
    with cheap gathers (~100+ G/s on TPU). Axis 0 needs no table: prime[0]
    and the dense x-stride are both 1.

    For hashed levels the modulo target is always the (power-of-two)
    2^log2_hashmap_size, so `% hashmap` becomes an AND; for dense levels the
    index is already in range (gridencoder.cu:67-86 semantics preserved).
    """
    S = math.log2(spec.per_level_scale)
    H = spec.base_resolution
    L = spec.num_levels
    scales = np.exp2(np.arange(L) * S) * H - 1.0
    res = (np.ceil(scales).astype(np.int64) + 1)
    hashmap_sizes = np.diff(np.asarray(spec.offsets))
    dense = (res + 1).astype(object) ** spec.input_dim <= hashmap_sizes

    width = int(res.max()) + 2
    coords = np.arange(width, dtype=np.uint64)
    tables = []
    for axis in range(1, spec.input_dim):
        t = np.zeros((L, width), np.uint32)
        for lvl in range(L):
            if dense[lvl]:
                stride = (res[lvl] + 1) ** axis
                t[lvl] = (coords * np.uint64(stride)).astype(np.uint32)
            else:
                t[lvl] = (coords * np.uint64(_PRIMES[axis])).astype(np.uint32)
        tables.append(t.reshape(-1))
    # hash mask: 2^log2-1 for hashed levels; all-ones (no-op) for dense
    mask = np.full(L, 0xFFFFFFFF, np.uint32)
    for lvl in range(L):
        if not dense[lvl]:
            assert (hashmap_sizes[lvl] & (hashmap_sizes[lvl] - 1)) == 0, (
                "hashed level size must be a power of two")
            mask[lvl] = np.uint32(hashmap_sizes[lvl] - 1)
    return ([jnp.asarray(t) for t in tables], jnp.asarray(mask), width)


def _components(inputs: Coords, d: int):
    """Batch-component views of the input positions: d arrays of shape [N]."""
    if isinstance(inputs, (tuple, list)):
        assert len(inputs) == d
        return [jnp.asarray(c, jnp.float32).reshape(-1) for c in inputs]
    return [inputs[..., i].astype(jnp.float32).reshape(-1) for i in range(d)]


def encode(embeddings: jax.Array, spec: HashGridSpec, inputs: Coords,
           bound: float = 1.0, feature_major: bool = False) -> jax.Array:
    """Encode positions.

    inputs: [N, D] in [-bound, bound] (or a tuple of D component arrays).
    Returns [N, L * C] (or [L * C, N] when feature_major) in the embeddings'
    dtype. OOB inputs yield zeros (gridencoder.cu:113-135).
    """
    D = spec.input_dim
    comps = _components(inputs, D)
    comps = [(c + bound) / (2.0 * bound) for c in comps]        # [0, 1]
    n = comps[0].shape[0]

    scales, res, hmap, offs, dense = _level_constants(spec)
    L = spec.num_levels
    C = spec.level_dim

    oob = comps[0] < -1.0  # init false
    for c in comps:
        oob = oob | (c < 0.0) | (c > 1.0)                       # [N]

    # per-component lattice coords/fractions: [L, N]
    pos_grid = []
    frac = []
    for c in comps:
        p = c[None, :] * scales[:, None] + 0.5
        pg = jnp.floor(p)
        f = p - pg
        if spec.interpolation == "smoothstep":
            f = f * f * (3.0 - 2.0 * f)
        pos_grid.append(pg.astype(jnp.uint32))
        frac.append(f)

    # corner indices [8, L, N]: per-axis contributions come from precomputed
    # lookup tables (see _axis_tables) — no u32 multiplies, no array modulo
    tables, mask, width = _axis_tables(spec)
    corner_bits = [
        [(corner >> dd) & 1 for dd in range(D)] for corner in range(2**D)
    ]
    lvl_base = (jnp.arange(L, dtype=jnp.uint32) * jnp.uint32(width))[:, None]

    # contributions T[axis][level, coord] and T[axis][level, coord+1]: [L, N]
    contrib = [[pos_grid[0], pos_grid[0] + jnp.uint32(1)]]      # axis 0: identity
    for dd in range(1, D):
        flat = (lvl_base + pos_grid[dd]).astype(jnp.int32)
        t0 = tables[dd - 1][flat]
        t1 = tables[dd - 1][(flat + 1)]
        contrib.append([t0, t1])

    combined = []
    for corner in range(2**D):
        c0 = contrib[0][corner_bits[corner][0]]
        acc_dense = c0
        acc_hash = c0
        for dd in range(1, D):
            cdd = contrib[dd][corner_bits[corner][dd]]
            acc_dense = acc_dense + cdd
            acc_hash = acc_hash ^ cdd
        ci = jnp.where(dense[:, None], acc_dense,
                       acc_hash & mask[:, None])
        combined.append(ci[None])
    idx = jnp.concatenate(combined, axis=0)                     # [8, L, N]
    idx = (idx + offs[None, :, None]).astype(jnp.int32)

    # corner weights [8, L, N]
    w = []
    for corner in range(2**D):
        wc = jnp.ones((L, n), embeddings.dtype)
        for dd in range(D):
            f = frac[dd].astype(embeddings.dtype)
            wc = wc * (f if corner_bits[corner][dd] else (1.0 - f))
        w.append(wc[None])
    w = jnp.concatenate(w, axis=0)

    # per-channel gathers keep every array batch-minormost
    outs = []
    for ch in range(C):
        e = embeddings[:, ch]                                   # [total]
        feats = e[idx]                                          # [8, L, N]
        outs.append(jnp.sum(w * feats, axis=0))                 # [L, N]
    out = jnp.stack(outs, axis=1)                               # [L, C, N]
    out = jnp.where(oob[None, None, :], 0.0, out)
    out = out.reshape(L * C, n)
    if feature_major:
        return out
    return out.T


def _grid_index_of(spec: HashGridSpec, pos_grid, axis_delta=None):
    """Grid index [L, N] of integer lattice coords (list of D [L, N] u32
    arrays), optionally shifted by +-1 along one axis: axis_delta =
    (axis, +1|-1). Same table machinery as encode()'s corner indices."""
    D = spec.input_dim
    L = spec.num_levels
    tables, mask, width = _axis_tables(spec)
    _, _, _, offs, dense = _level_constants(spec)
    lvl_base = (jnp.arange(L, dtype=jnp.uint32) * jnp.uint32(width))[:, None]

    acc_dense = None
    acc_hash = None
    for dd in range(D):
        delta = 0
        if axis_delta is not None and axis_delta[0] == dd:
            delta = axis_delta[1]
        if dd == 0:
            # axis 0: prime is 1 and the dense x-stride is 1 — identity
            c = pos_grid[0] + jnp.uint32(delta) if delta >= 0 else \
                pos_grid[0] - jnp.uint32(-delta)
            cd = ch = c
        else:
            flat = (lvl_base + pos_grid[dd]).astype(jnp.int32) + delta
            cd = ch = tables[dd - 1][flat]
        acc_dense = cd if acc_dense is None else acc_dense + cd
        acc_hash = ch if acc_hash is None else acc_hash ^ ch
    idx = jnp.where(dense[:, None], acc_dense, acc_hash & mask[:, None])
    return (idx + offs[:, None]).astype(jnp.int32)


def grad_total_variation(embeddings: jax.Array, spec: HashGridSpec,
                         inputs: Coords, weight: float = 1e-7,
                         bound: float = 1.0) -> jax.Array:
    """Total-variation gradient accumulated at sampled lattice cells.

    TPU-native equivalent of the reference's unused-in-training TV kernel
    (gridencoder/src/gridencoder.cu:506-636, grid.py:165-185): for each
    sample's floor cell, per channel, add

        weight/(2D) * sum_d (e[c] - e[c +- 1_d]) * rsqrt(sum_d (.)^2 + 1e-9)

    at the cell's table row — an L2-normalized TV descent direction. The
    CUDA kernel scatters with atomicAdd (nondeterministic); here the
    scatter is a deterministic `.at[].add`. Returns a [total_params, C]
    array to ADD to the embeddings' gradient before the optimizer step
    (the reference mutates `embeddings.grad` in place).

    OOB inputs contribute nothing. Neighbors past the lattice ends
    ([0, resolution] per axis) are skipped exactly as the kernel's
    `cur_d < resolution` / `cur_d > 0` guards do.
    """
    D = spec.input_dim
    L = spec.num_levels
    C = spec.level_dim
    comps = _components(inputs, D)
    comps = [(c + bound) / (2.0 * bound) for c in comps]
    n = comps[0].shape[0]

    oob = comps[0] < -1.0
    for c in comps:
        oob = oob | (c < 0.0) | (c > 1.0)

    scales, res, _, _, _ = _level_constants(spec)
    pos_grid = []
    for c in comps:
        p = c[None, :] * scales[:, None] + 0.5
        pos_grid.append(jnp.floor(p).astype(jnp.uint32))

    center = _grid_index_of(spec, pos_grid)                     # [L, N]
    e = embeddings.astype(jnp.float32)
    ec = e[center]                                              # [L, N, C]

    results = jnp.zeros((L, n, C), jnp.float32)
    idelta = jnp.zeros((L, n, C), jnp.float32)
    for d in range(D):
        cur = pos_grid[d]
        # right neighbor: cur_d < resolution
        ok_r = (cur < res[:, None])[..., None]
        idx_r = _grid_index_of(spec, pos_grid, axis_delta=(d, +1))
        gv = jnp.where(ok_r, ec - e[idx_r], 0.0)
        results = results + gv
        idelta = idelta + gv * gv
        # left neighbor: cur_d > 0
        ok_l = (cur > 0)[..., None]
        idx_l = _grid_index_of(spec, pos_grid, axis_delta=(d, -1))
        gv = jnp.where(ok_l, ec - e[idx_l], 0.0)
        results = results + gv
        idelta = idelta + gv * gv

    w = weight / (2.0 * D)
    vals = w * results * jax.lax.rsqrt(idelta + 1e-9)
    vals = jnp.where(oob[None, :, None], 0.0, vals)

    grad = jnp.zeros(embeddings.shape, jnp.float32)
    grad = grad.at[center.reshape(-1)].add(
        vals.reshape(-1, C), mode="drop")
    return grad.astype(embeddings.dtype)


# ---------------------------------------------------------------------------
# numpy oracle (used by tests to pin down index semantics)
# ---------------------------------------------------------------------------

def encode_np(embeddings: np.ndarray, spec: HashGridSpec, inputs: np.ndarray,
              bound: float = 1.0) -> np.ndarray:
    """Scalar-loop oracle mirroring gridencoder.cu line by line."""
    D = spec.input_dim
    S = math.log2(spec.per_level_scale)
    H = spec.base_resolution
    N = inputs.shape[0]
    out = np.zeros((N, spec.num_levels, spec.level_dim), np.float64)
    x = (np.asarray(inputs, np.float64) + bound) / (2 * bound)

    for n in range(N):
        if np.any(x[n] < 0) or np.any(x[n] > 1):
            continue
        for lvl in range(spec.num_levels):
            hashmap_size = spec.offsets[lvl + 1] - spec.offsets[lvl]
            scale = np.exp2(lvl * S) * H - 1.0
            resolution = int(np.ceil(scale)) + 1
            pos = x[n] * scale + 0.5
            pg = np.floor(pos).astype(np.uint64)
            fr = pos - pg
            for c in range(2**D):
                wgt = 1.0
                loc = np.zeros(D, np.uint64)
                for d in range(D):
                    if (c >> d) & 1:
                        wgt *= fr[d]
                        loc[d] = pg[d] + 1
                    else:
                        wgt *= 1 - fr[d]
                        loc[d] = pg[d]
                # get_grid_index (gridencoder.cu:67-86)
                stride = 1
                index = 0
                for d in range(D):
                    if stride > hashmap_size:
                        break
                    index += int(loc[d]) * stride
                    stride *= resolution + 1
                if stride > hashmap_size:
                    index = 0
                    for d in range(D):
                        index ^= (int(loc[d]) * _PRIMES[d]) & 0xFFFFFFFF
                    index &= 0xFFFFFFFF
                index = index % hashmap_size + spec.offsets[lvl]
                out[n, lvl] += wgt * embeddings[index]
    return out.reshape(N, spec.num_levels * spec.level_dim)


def tv_grad_np(embeddings: np.ndarray, spec: HashGridSpec, inputs: np.ndarray,
               weight: float = 1e-7, bound: float = 1.0) -> np.ndarray:
    """Scalar-loop oracle mirroring kernel_grad_tv (gridencoder.cu:506-611)
    line by line (align_corners=False, hash gridtype)."""
    D = spec.input_dim
    S = math.log2(spec.per_level_scale)
    H = spec.base_resolution
    C = spec.level_dim
    x = (np.asarray(inputs, np.float64) + bound) / (2 * bound)
    grad = np.zeros_like(np.asarray(embeddings, np.float64))

    def grid_index(loc, hashmap_size, resolution):
        stride = 1
        index = 0
        for d in range(D):
            if stride > hashmap_size:
                break
            index += int(loc[d]) * stride
            stride *= resolution + 1
        if stride > hashmap_size:
            index = 0
            for d in range(D):
                index ^= (int(loc[d]) * _PRIMES[d]) & 0xFFFFFFFF
            index &= 0xFFFFFFFF
        return index % hashmap_size

    w = weight / (2 * D)
    for n in range(x.shape[0]):
        if np.any(x[n] < 0) or np.any(x[n] > 1):
            continue
        for lvl in range(spec.num_levels):
            hashmap_size = spec.offsets[lvl + 1] - spec.offsets[lvl]
            scale = np.exp2(lvl * S) * H - 1.0
            resolution = int(np.ceil(scale)) + 1
            pos_grid = np.floor(x[n] * scale + 0.5).astype(np.int64)
            index = grid_index(pos_grid, hashmap_size, resolution) \
                + spec.offsets[lvl]
            results = np.zeros(C)
            idelta = np.zeros(C)
            for d in range(D):
                cur = pos_grid[d]
                if cur < resolution:
                    pos_grid[d] = cur + 1
                    ir = grid_index(pos_grid, hashmap_size, resolution) \
                        + spec.offsets[lvl]
                    gv = embeddings[index] - embeddings[ir]
                    results += gv
                    idelta += gv * gv
                if cur > 0:
                    pos_grid[d] = cur - 1
                    il = grid_index(pos_grid, hashmap_size, resolution) \
                        + spec.offsets[lvl]
                    gv = embeddings[index] - embeddings[il]
                    results += gv
                    idelta += gv * gv
                pos_grid[d] = cur
            grad[index] += w * results / np.sqrt(idelta + 1e-9)
    return grad
