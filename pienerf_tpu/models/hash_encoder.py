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

The forward pass is one batched gather over [N, L, 8] corner indices plus a
trilinear reduce — XLA fuses the interpolation and differentiates the gather
into a deterministic scatter-add (the reference uses atomicAdd,
gridencoder.cu:249-340, which is nondeterministic).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_PRIMES = (1, 2654435761, 805459861)


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


def _corner_bits(d: int) -> np.ndarray:
    return np.array(
        [[(c >> i) & 1 for i in range(d)] for c in range(2**d)], np.int64
    )


def encode(embeddings: jax.Array, spec: HashGridSpec, inputs: jax.Array,
           bound: float = 1.0) -> jax.Array:
    """Encode positions.

    inputs: [N, D] in [-bound, bound]; returns [N, L * C] in the embeddings'
    dtype. OOB inputs yield zeros (gridencoder.cu:113-135).
    """
    D = spec.input_dim
    x = (inputs.astype(jnp.float32) + bound) / (2.0 * bound)   # [0, 1]

    scales, res, hmap, offs, dense = _level_constants(spec)
    L = spec.num_levels
    C = spec.level_dim

    oob = jnp.any((x < 0.0) | (x > 1.0), axis=-1)              # [N]

    pos = x[:, None, :] * scales[None, :, None] + 0.5          # [N, L, D]
    pos_grid = jnp.floor(pos)
    frac = pos - pos_grid
    if spec.interpolation == "smoothstep":
        frac = frac * frac * (3.0 - 2.0 * frac)
    pos_grid = pos_grid.astype(jnp.uint32)                     # [N, L, D]

    bits = jnp.asarray(_corner_bits(D), jnp.uint32)            # [8, D]
    corners = pos_grid[:, :, None, :] + bits[None, None, :, :]  # [N, L, 8, D]

    # dense index: stride 1, (res+1), (res+1)^2 ...
    side = (res + jnp.uint32(1))[None, :, None]                # [1, L, 1]
    dense_idx = corners[..., 0]
    stride = side
    for d in range(1, D):
        dense_idx = dense_idx + corners[..., d] * stride
        stride = stride * side

    # hash index: xor of coordinate * prime (uint32 wraparound)
    hash_idx = corners[..., 0] * jnp.uint32(_PRIMES[0])
    for d in range(1, D):
        hash_idx = hash_idx ^ (corners[..., d] * jnp.uint32(_PRIMES[d]))

    idx = jnp.where(dense[None, :, None], dense_idx, hash_idx)
    idx = idx % hmap[None, :, None] + offs[None, :, None]      # [N, L, 8]

    feats = embeddings[idx.astype(jnp.int32)]                  # [N, L, 8, C]

    w = jnp.ones(frac.shape[:2] + (2**D,), feats.dtype)        # [N, L, 8]
    fr = frac.astype(feats.dtype)
    for d in range(D):
        wd = jnp.where(bits[None, None, :, d] == 1, fr[:, :, None, d],
                       1.0 - fr[:, :, None, d])
        w = w * wd

    out = jnp.sum(w[..., None] * feats, axis=2)                # [N, L, C]
    out = jnp.where(oob[:, None, None], 0.0, out)
    return out.reshape(inputs.shape[0], L * C)


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
