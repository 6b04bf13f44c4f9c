"""Static (undeformed) radiance-field rendering.

Replaces the reference's run_cuda host loop with alive-ray compaction
(reference: nerf/renderer.py:267-388) by a fully static-shape pipeline:

  1. near/far slab test
  2. parallel analytic lattice march + occupancy bit tests   (ops/raymarch)
  3. rank-compaction of occupied samples into an [N, K] buffer
  4. one batched network evaluation over all samples (MXU-dense)
  5. masked exclusive-scan compositing with early-termination mask

Training and inference share the same jitted core; inference simply uses a
larger K and tiles the image in fixed-size ray chunks.

Depth semantics: we return sum(w_k * t_k) with t_k the absolute sample
parameter (the reference accumulates post-step deltas from the march start,
renderer.py:326/381 — a quirk that double-subtracts `near` for training
renders; ours is the geometrically meaningful expected hit distance, then
normalized the same way).
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pienerf_tpu.models import network
from pienerf_tpu.ops import raymarch
from pienerf_tpu.ops.grid import OccupancyGrid


class RenderSettings(NamedTuple):
    """Static rendering configuration (hashable -> jit cache key)."""
    bound: float = 1.0
    cascade: int = 1
    min_near: float = 0.2
    density_scale: float = 1.0
    dt_gamma: float = 0.0
    max_steps: int = 1024
    T_thresh: float = 1e-2
    max_samples: int = 64          # K: compacted samples per ray
    bg_radius: float = -1.0


@functools.partial(jax.jit, static_argnames=("spec", "settings", "perturb"))
def render_rays(
    params,
    spec: network.NetworkSpec,
    settings: RenderSettings,
    bitfield: jax.Array,
    rays_o: jax.Array,            # [N, 3]
    rays_d: jax.Array,            # [N, 3]
    bg_color: jax.Array,          # [] or [N, 3]
    rng: Optional[jax.Array] = None,
    perturb: bool = False,
) -> Dict[str, jax.Array]:
    """Render a batch of rays. Returns image [N,3], depth [N], weights_sum [N]."""
    st = settings
    n = rays_o.shape[0]
    aabb = jnp.array([-st.bound] * 3 + [st.bound] * 3, jnp.float32)
    nears, fars = raymarch.near_far_from_aabb(rays_o, rays_d, aabb, st.min_near)

    noise = None
    if perturb:
        assert rng is not None
        noise = jax.random.uniform(rng, (n,))

    t, dt, valid = raymarch.march_lattice(
        rays_o, rays_d, nears, fars, bitfield,
        st.bound, st.cascade, st.max_steps, st.dt_gamma, st.max_steps,
        noise=noise,
    )
    t = jax.lax.stop_gradient(t)
    idx, mask = raymarch.compact_samples(valid, st.max_samples)

    rows = jnp.arange(n)[:, None]
    ts = t[rows, idx]                                   # [N, K]
    dts = dt[rows, idx]
    k = st.max_samples

    # componentwise sample positions / dirs (batch-minormost, flattened)
    xs = tuple(
        jnp.clip(rays_o[:, i, None] + ts * rays_d[:, i, None],
                 -st.bound, st.bound).reshape(n * k) for i in range(3)
    )
    ds = tuple(
        jnp.broadcast_to(rays_d[:, i, None], (n, k)).reshape(n * k)
        for i in range(3)
    )
    sigmas, rgbs = network.forward(params, spec, xs, ds)
    sigmas = (sigmas * st.density_scale).reshape(n, k)
    rgbs = rgbs.reshape(n, k, 3)

    ws, depth, image = raymarch.composite(
        sigmas, rgbs, dts, ts, mask, st.T_thresh
    )

    if st.bg_radius > 0:
        sph = raymarch.sph_from_ray(rays_o, rays_d, st.bg_radius)
        bg = network.background(params, spec, sph, rays_d)
    else:
        bg = jnp.broadcast_to(jnp.asarray(bg_color, jnp.float32), (n, 3))
    image = image + (1.0 - ws)[:, None] * bg
    depth_n = jnp.clip(depth - nears, 0.0, None) / jnp.maximum(fars - nears, 1e-6)

    return {"image": image, "depth": depth_n, "depth_raw": depth,
            "weights_sum": ws}


def render_image(
    params,
    spec: network.NetworkSpec,
    settings: RenderSettings,
    grid: OccupancyGrid,
    pose: np.ndarray,
    intrinsics,
    H: int,
    W: int,
    bg_color: float = 1.0,
    chunk: int = 65536,
) -> Dict[str, np.ndarray]:
    """Full-frame render, tiled in fixed-size ray chunks (host loop)."""
    from pienerf_tpu.data.rays import get_rays_full

    rays_o, rays_d = get_rays_full(jnp.asarray(pose, jnp.float32), intrinsics, H, W)
    n = H * W
    # don't pad small frames up to a huge chunk; round to a power of two
    chunk = min(chunk, max(256, 1 << (n - 1).bit_length()))
    if spec.backbone == "hashgrid":
        # the hashgrid encode materializes [8, L, rays*K] corner arrays:
        # a 65536-ray chunk at K=256 is a 25 GB HBM program (measured OOM
        # on the 16 GB chip); 8192 keeps the peak ~1 GB
        chunk = min(chunk, 8192)
    imgs, deps, wss = [], [], []
    bg = jnp.asarray(bg_color, jnp.float32)
    for s in range(0, n, chunk):
        ro = rays_o[s:s + chunk]
        rd = rays_d[s:s + chunk]
        pad = chunk - ro.shape[0]
        if pad:
            ro = jnp.pad(ro, ((0, pad), (0, 0)), constant_values=1.0)
            rd = jnp.pad(rd, ((0, pad), (0, 0)), constant_values=1.0)
        out = render_rays(params, spec, settings, grid.bitfield, ro, rd, bg)
        take = chunk - pad
        imgs.append(np.asarray(out["image"][:take]))
        deps.append(np.asarray(out["depth_raw"][:take]))
        wss.append(np.asarray(out["weights_sum"][:take]))
    return {
        "image": np.concatenate(imgs).reshape(H, W, 3),
        "depth": np.concatenate(deps).reshape(H, W),
        "weights_sum": np.concatenate(wss).reshape(H, W),
    }
