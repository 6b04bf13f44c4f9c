"""Camera ray generation (reference: nerf/utils.py:55-138).

Pixel-center convention (i + 0.5), normalized directions, cam2world poses.
Pure jnp so it can live inside jitted render/train steps.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def get_rays_full(pose: jax.Array, intrinsics, H: int, W: int
                  ) -> Tuple[jax.Array, jax.Array]:
    """All H*W rays for one pose. Returns (rays_o [HW,3], rays_d [HW,3])."""
    fx, fy, cx, cy = intrinsics
    j, i = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32) + 0.5,
        jnp.arange(W, dtype=jnp.float32) + 0.5,
        indexing="ij",
    )
    dirs = jnp.stack(
        [(i.ravel() - cx) / fx, (j.ravel() - cy) / fy, jnp.ones(H * W)],
        axis=-1,
    )
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    rays_d = dirs @ pose[:3, :3].T
    rays_o = jnp.broadcast_to(pose[:3, 3], rays_d.shape)
    return rays_o, rays_d


def get_rays_sampled(pose: jax.Array, intrinsics, H: int, W: int,
                     inds: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Rays at flat pixel indices [N] (training subset sampling)."""
    fx, fy, cx, cy = intrinsics
    px = (inds % W).astype(jnp.float32) + 0.5
    py = (inds // W).astype(jnp.float32) + 0.5
    dirs = jnp.stack(
        [(px - cx) / fx, (py - cy) / fy, jnp.ones_like(px)], axis=-1
    )
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    rays_d = dirs @ pose[:3, :3].T
    rays_o = jnp.broadcast_to(pose[:3, 3], rays_d.shape)
    return rays_o, rays_d


def sample_patch_indices(rng: jax.Array, H: int, W: int, n: int,
                         patch_size: int) -> jax.Array:
    """Flat pixel indices for n // p^2 random p x p patches (LPIPS-style
    patch training, reference nerf/utils.py:83-98: random top-left corners
    expanded with a patch meshgrid; error-map sampling is bypassed in patch
    mode, as in the reference)."""
    p = patch_size
    n_patch = max(n // (p * p), 1)
    k1, k2 = jax.random.split(rng)
    x0 = jax.random.randint(k1, (n_patch,), 0, H - p)
    y0 = jax.random.randint(k2, (n_patch,), 0, W - p)
    pi, pj = jnp.meshgrid(jnp.arange(p), jnp.arange(p), indexing="ij")
    ix = x0[:, None] + pi.reshape(-1)[None, :]          # [np, p^2]
    iy = y0[:, None] + pj.reshape(-1)[None, :]
    return (ix * W + iy).reshape(-1).astype(jnp.int32)


def sample_pixel_indices(rng: jax.Array, H: int, W: int, n: int,
                         error_map: Optional[jax.Array] = None,
                         ) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Uniform (or error-map-weighted) pixel index sampling
    (reference nerf/utils.py:100-125)."""
    if error_map is None:
        return jax.random.randint(rng, (n,), 0, H * W, jnp.int32), None
    k1, k2 = jax.random.split(rng)
    # weighted sample on the fixed 128x128 error grid, then jitter up
    coarse = jax.random.categorical(
        k1, jnp.log(error_map + 1e-8), shape=(n,)
    )
    cx_, cy_ = coarse // 128, coarse % 128
    sx, sy = H / 128.0, W / 128.0
    u = jax.random.uniform(k2, (n, 2))
    ix = jnp.clip((cx_ * sx + u[:, 0] * sx).astype(jnp.int32), 0, H - 1)
    iy = jnp.clip((cy_ * sy + u[:, 1] * sy).astype(jnp.int32), 0, W - 1)
    return ix * W + iy, coarse
