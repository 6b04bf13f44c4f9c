"""Adaptive uniform sampling: trained field -> physics point cloud.

Port of the reference sampler (reference: main_sample.py:30-308): a regular
sub_res^3 lattice over the scene (or clamped cut_bounds), density queried as
occupancy 1 - exp(-sigma / 128), density-gradient-driven boundary
refinement, thresholding, and per-point volume estimation vp = hgs^3 /
points-in-cell. Atomic prefix sums become a cumsum; the per-cell volume
loop (main_sample.py:196-199) becomes one gather.

Offline tool — runs the plain XLA field path.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pienerf_tpu.config import PieNeRFConfig
from pienerf_tpu.io.ply import write_ply
from pienerf_tpu.models import network


class AdaptiveUniformSampling:
    def __init__(self, cfg: PieNeRFConfig, params, spec: network.NetworkSpec):
        self.cfg = cfg
        self.params = params
        self.spec = spec
        self.bound = cfg.bound
        self.threshold = cfg.density_threshold
        self.res = cfg.sub_res
        self.grid_size = 2 * self.bound / self.res
        self._density = jax.jit(
            lambda x: 1.0 - jnp.exp(-network.density(params, spec, x)[0] / 128.0)
        )

    def get_density(self, x: np.ndarray, chunk: int = 2**18) -> np.ndarray:
        out = []
        for s in range(0, x.shape[0], chunk):
            out.append(np.asarray(self._density(jnp.asarray(x[s:s + chunk],
                                                            jnp.float32))))
        return np.concatenate(out)

    def get_point_volumes(self, pts: np.ndarray) -> np.ndarray:
        """vp = hgs^3 / points-in-cell (main_sample.py:181-200)."""
        hgs = self.cfg.hash_grid_size
        bbmin = pts.min(0) - 1e-3
        bbmax = pts.max(0) + 1e-3
        res = np.ceil((bbmax - bbmin) / hgs).astype(np.int64)
        g = np.floor((pts - bbmin) / hgs).astype(np.int64)
        gid = g[:, 2] * res[1] * res[0] + g[:, 1] * res[0] + g[:, 0]
        counts = np.bincount(gid, minlength=int(res.prod()))
        return (hgs**3 / counts[gid]).astype(np.float64)

    def sample(self, write_path: Optional[str] = None, seed: int = 0
               ) -> Dict[str, np.ndarray]:
        cfg = self.cfg
        res = self.res
        rng = np.random.RandomState(seed)

        # --- regular lattice (main_sample.py:202-223)
        if cfg.cut:
            cb = list(cfg.cut_bounds)
            for i in (0, 2, 4):
                cb[i] = max(cb[i], -cfg.bound)
            for i in (1, 3, 5):
                cb[i] = min(cb[i], cfg.bound)
            xs = np.linspace(cb[0], cb[1], res)
            ys = np.linspace(cb[2], cb[3], res)
            zs = np.linspace(cb[4], cb[5], res)
        else:
            xs = ys = zs = np.linspace(-cfg.bound, cfg.bound, res)
        gx, gy, gz = np.meshgrid(xs, ys, zs, indexing="ij")
        grid_pts = np.stack([gx.ravel(), gy.ravel(), gz.ravel()], -1)
        grid_density = self.get_density(grid_pts).reshape(res, res, res)

        # --- density gradient across cell corners -> subdivision counts
        #     (main_sample.py:100-140): cells are [res-1]^3 with 8 corners
        d = grid_density
        c000 = d[:-1, :-1, :-1]
        c001 = d[:-1, :-1, 1:]
        c010 = d[:-1, 1:, :-1]
        c011 = d[:-1, 1:, 1:]
        c100 = d[1:, :-1, :-1]
        c101 = d[1:, :-1, 1:]
        c110 = d[1:, 1:, :-1]
        c111 = d[1:, 1:, 1:]
        grad_x = (c100 + c101 + c110 + c111) - (c000 + c001 + c010 + c011)
        grad_y = (c010 + c011 + c110 + c111) - (c000 + c001 + c100 + c101)
        grad_z = (c001 + c011 + c101 + c111) - (c000 + c010 + c100 + c110)
        grad_norm = np.sqrt(grad_x**2 + grad_y**2 + grad_z**2)

        cell_extent = self.grid_size
        sub_dims = (cell_extent * cfg.sub_coeff * res * grad_norm).astype(np.int64)
        sub_dims[grad_norm == 0] = 0

        # --- fill boundary cells with sub_dim^3 scaled random points
        #     (main_sample.py:71-97); cumsum replaces the atomic prefix sum
        cells = np.argwhere(sub_dims > 0)
        dims = sub_dims[cells[:, 0], cells[:, 1], cells[:, 2]]
        counts = dims**3
        total = int(counts.sum())
        if total > 0:
            max_dim = int(dims.max())
            shared_block = rng.rand(max_dim**3, 3)  # one shared random block
            mins = np.stack([xs[cells[:, 0]], ys[cells[:, 1]], zs[cells[:, 2]]], -1)
            step = np.array([xs[1] - xs[0], ys[1] - ys[0], zs[1] - zs[0]])
            pnts_add = np.concatenate([
                mins[i] + shared_block[: counts[i]] * step
                for i in range(len(cells))
            ]) if len(cells) else np.zeros((0, 3))
        else:
            pnts_add = np.zeros((0, 3))

        # --- union with half-cell-shifted lattice, threshold
        pts = np.concatenate(
            [pnts_add, grid_pts + 0.5 * 2 * cfg.bound / res], axis=0)
        density = self.get_density(pts)
        pts = pts[density > self.threshold]
        assert pts.shape[0] > 0, "No points sampled, check params!"

        vols = self.get_point_volumes(pts)
        if write_path:
            write_ply(write_path, pts.astype(np.float64), vp=vols)
        return {"points": pts, "volumes": vols}
