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
              bg: float = 1.0) -> np.ndarray:
    """Dense quadrature volume rendering of the analytic scene (numpy)."""
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
    sig = sphere_sigma(xs)
    rgb = sphere_rgb(xs)
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
                 seed: int = 0) -> SyntheticDataset:
    focal = 0.9 * H
    intr = (focal, focal, W / 2.0, H / 2.0)
    poses = orbit_poses(n_views, seed=seed)
    images = np.stack([render_gt(p, intr, H, W) for p in poses])
    return SyntheticDataset(poses=poses.astype(np.float32), images=images,
                            intrinsics=intr, H=H, W=W)
