"""Procedural test scene: an analytic radiance field + rendered GT images.

No dataset files ship with the repo, so correctness and benchmark flows use
this analytic scene: a soft-edged sphere whose color varies with position.
GT images come from dense numpy ray integration (independent of the JAX
rendering stack), so training against them validates the whole pipeline.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import numpy as np


def sphere_sigma(x: np.ndarray, r0: float = 0.5, sigma0: float = 40.0,
                 sharp: float = 40.0) -> np.ndarray:
    """Soft sphere density: sigma0 * sigmoid(sharp * (r0 - |x|))."""
    r = np.linalg.norm(x, axis=-1)
    return sigma0 / (1.0 + np.exp(np.clip(-sharp * (r0 - r), -60.0, 60.0)))


def sphere_rgb(x: np.ndarray) -> np.ndarray:
    """Position-dependent albedo in [0.1, 0.9]."""
    return 0.5 + 0.4 * np.sin(np.asarray(x) * np.array([3.0, 5.0, 7.0]))


# --- "hard" scene: high-frequency texture + self-occlusion ----------------
#
# The smooth sphere is the friendliest possible input for a Fourier-MLP
# prior (round-3 review): low-frequency geometry, no occlusion between
# surfaces, albedo at wavenumbers 3-7. This scene exists to stress the
# opposite regime with a still purely-analytic field:
#   - geometry: four overlapping lobes at different depths (a ray from most
#     orbit poses crosses 2-3 surface sheets -> real self-occlusion and
#     disocclusion edges), surfaces displaced by a wavenumber-(9,11,13)
#     bump field (sharp silhouettes move at high spatial frequency),
#   - albedo: wavenumbers (17, 23, 29) plus a phase-modulation term, far
#     above the sphere scene's (3, 5, 7).
# All ops are elementwise + exp, identical under numpy and jax.numpy: the
# `xp` arg lets tools/quality_run.py run the SAME function on device while
# tests validate it against this numpy oracle.

_HARD_CENTERS = np.array([
    [0.22, 0.02, 0.10],
    [-0.25, 0.12, -0.20],
    [0.00, -0.26, 0.24],
    [-0.04, 0.28, -0.02],
])
_HARD_RADII = np.array([0.34, 0.27, 0.23, 0.19])


def hard_sigma(x, sigma0: float = 60.0, sharp: float = 60.0, xp=np):
    """Soft union of four bump-displaced lobes (see module comment)."""
    x = xp.asarray(x)
    bump = (0.05 * xp.sin(9.0 * x[..., 0]) * xp.sin(11.0 * x[..., 1])
            * xp.sin(13.0 * x[..., 2]))
    # occupancy union: 1 - prod(1 - occ_k), smooth everywhere
    one_minus = None
    for k in range(_HARD_CENTERS.shape[0]):
        d = x - xp.asarray(_HARD_CENTERS[k], dtype=x.dtype)
        r = xp.sqrt(xp.sum(d * d, axis=-1))
        occ = 1.0 / (1.0 + xp.exp(xp.clip(
            -sharp * (_HARD_RADII[k] + bump - r), -60.0, 60.0)))
        one_minus = (1.0 - occ) if one_minus is None else one_minus * (1.0 - occ)
    return sigma0 * (1.0 - one_minus)


def hard_rgb(x, xp=np):
    """High-frequency albedo: wavenumbers (17, 23, 29) + phase modulation."""
    x = xp.asarray(x)
    base = xp.sin(x * xp.asarray([17.0, 23.0, 29.0], dtype=x.dtype))
    mod = xp.sin(7.0 * x[..., 0] * x[..., 1] + 11.0 * x[..., 2])[..., None]
    return 0.5 + 0.35 * base + 0.1 * mod


SCENES = {
    "sphere": (sphere_sigma, sphere_rgb),
    "hard": (lambda x, xp=np: hard_sigma(x, xp=xp),
             lambda x, xp=np: hard_rgb(x, xp=xp)),
}


def scene_field(scene: str, xs, xp=np):
    """(sigma, rgb) of a named analytic scene, under numpy or jax.numpy."""
    if scene == "sphere":
        if xp is np:
            return sphere_sigma(xs), sphere_rgb(xs)
        r = xp.sqrt(xp.sum(xs * xs, axis=-1))
        sig = 40.0 / (1.0 + xp.exp(xp.clip(-40.0 * (0.5 - r), -60.0, 60.0)))
        rgb = 0.5 + 0.4 * xp.sin(xs * xp.asarray([3.0, 5.0, 7.0],
                                                 dtype=xs.dtype))
        return sig, rgb
    if scene == "hard":
        return hard_sigma(xs, xp=xp), hard_rgb(xs, xp=xp)
    raise ValueError(f"unknown scene {scene!r} (have: sphere, hard)")


def _look_at(eye: np.ndarray) -> np.ndarray:
    """cam2world with +z = viewing direction (matches ray conventions)."""
    fwd = -eye / np.linalg.norm(eye)
    up = np.array([0.0, 1.0, 0.0])
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    up2 = np.cross(right, fwd)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 0] = right
    pose[:3, 1] = -up2
    pose[:3, 2] = fwd
    pose[:3, 3] = eye
    return pose


def orbit_poses(n: int, radius: float = 2.5, seed: int = 0) -> np.ndarray:
    rng = np.random.RandomState(seed)
    poses = []
    for i in range(n):
        theta = np.pi / 3 + rng.rand() * np.pi / 3
        phi = 2 * np.pi * i / n + rng.rand() * 0.1
        eye = radius * np.array([
            np.sin(theta) * np.cos(phi),
            np.cos(theta),
            np.sin(theta) * np.sin(phi),
        ])
        poses.append(_look_at(eye.astype(np.float64)))
    return np.stack(poses)


def render_gt(pose: np.ndarray, intrinsics, H: int, W: int,
              n_steps: int = 400, bound: float = 1.0,
              bg: float = 1.0, scene: str = "sphere") -> np.ndarray:
    """Dense quadrature volume rendering of an analytic scene (numpy)."""
    fx, fy, cx, cy = intrinsics
    j, i = np.meshgrid(np.arange(H) + 0.5, np.arange(W) + 0.5, indexing="ij")
    dirs = np.stack([(i - cx) / fx, (j - cy) / fy, np.ones_like(i)], -1)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    rays_d = (dirs.reshape(-1, 3) @ pose[:3, :3].T).astype(np.float64)
    rays_o = np.broadcast_to(pose[:3, 3].astype(np.float64), rays_d.shape)

    # slab test against the bound cube; clamp to a finite range so grazing
    # rays (|dir component| ~ 1e-7 -> t ~ 1e7+) cannot push samples to
    # magnitudes where f32 trig NaNs (observed at 800x800: ~200 ppm of
    # edge rays). Legit samples satisfy |x| <= ~3 at these camera radii,
    # so the clamps are exact no-ops on every contributing sample.
    inv = 1.0 / rays_d
    t0 = (-bound - rays_o) * inv
    t1 = (bound - rays_o) * inv
    near = np.minimum(np.maximum(np.minimum(t0, t1).max(-1), 0.05), 1e3)
    far = np.minimum(np.maximum(np.maximum(t0, t1).min(-1), near + 1e-6),
                     1e3 + 1e-3)

    ts = near[:, None] + (far - near)[:, None] * (
        (np.arange(n_steps) + 0.5) / n_steps)[None, :]
    dt = ((far - near) / n_steps)[:, None]
    xs = rays_o[:, None, :] + ts[..., None] * rays_d[:, None, :]
    xs = np.clip(xs, -4.0 * bound - 4.0, 4.0 * bound + 4.0)
    sig, rgb = scene_field(scene, xs)
    tau = sig * dt
    T = np.exp(-np.cumsum(tau, axis=1) + tau)
    alpha = 1.0 - np.exp(-tau)
    w = alpha * T
    img = (w[..., None] * rgb).sum(1) + (1 - w.sum(1))[:, None] * bg
    return img.reshape(H, W, 3).astype(np.float32)


@dataclass
class SyntheticDataset:
    poses: np.ndarray
    images: np.ndarray
    intrinsics: Tuple[float, float, float, float]
    H: int
    W: int


def make_dataset(n_views: int = 16, H: int = 64, W: int = 64,
                 seed: int = 0, scene: str = "sphere") -> SyntheticDataset:
    focal = 0.9 * H
    intr = (focal, focal, W / 2.0, H / 2.0)
    poses = orbit_poses(n_views, seed=seed)
    images = np.stack([render_gt(p, intr, H, W, scene=scene) for p in poses])
    return SyntheticDataset(poses=poses.astype(np.float32), images=images,
                            intrinsics=intr, H=H, W=W)


def scene_points(scene: str, dx: float = 0.05, thresh: float = 0.5,
                 bound: float = 0.7) -> np.ndarray:
    """Physics point cloud for an analytic scene: lattice points where the
    occupancy 1 - exp(-sigma/ ~) clears `thresh` (the role of
    main_sample.py's density threshold for real checkpoints)."""
    c = np.arange(-bound, bound + 1e-6, dx)
    xx, yy, zz = np.meshgrid(c, c, c, indexing="ij")
    pts = np.stack([xx.ravel(), yy.ravel(), zz.ravel()], 1)
    sig, _ = scene_field(scene, pts)
    occ = 1.0 - np.exp(-sig * dx)
    return pts[occ > thresh]
