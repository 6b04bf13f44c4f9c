"""Headline benchmark: coupled sim + deformed-render FPS at 800x800.

Mirrors BASELINE.json config 3 (the chair interactive demo:
--max_iter_num 1 --num_seek_IP 3 --sim_dx 0.05, 800x800). No scene assets
ship with either repo, so the standard synthetic sphere scene provides an
equivalent-compute stand-in: ~6k integration points at sim_dx=0.05, full
occupancy-grid march, bending with 3-IP seek, network evaluation and
compositing per frame.

Reference baseline: the CUDA implementation's interactive budget is 80 ms/
frame at dynamically-DOWNSCALED resolution (reference nerf/gui.py:606-611,
i.e. 12.5 FPS below 800x800); we report FPS at full 800x800 against that
12.5 FPS target.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np


def build_scene(on_tpu: bool):
    import jax
    import jax.numpy as jnp

    from pienerf_tpu.config import PieNeRFConfig
    from pienerf_tpu.models import network
    from pienerf_tpu.ops import grid as gridlib
    from pienerf_tpu.render import pipeline
    from pienerf_tpu.sim import solver as sim

    r0 = 0.45
    dx = 0.05 if on_tpu else 0.1
    cfg = PieNeRFConfig(
        bound=1.0, sim_dx=dx, num_seek_IP=3, max_iter_num=1,
        max_steps=1024 if on_tpu else 128, dt_gamma=0.0,
        train_max_samples=32, min_near=0.05, T_thresh=1e-2,
    ).finalize()

    spec = network.make_spec(bound=cfg.bound)
    params = network.init_params(jax.random.PRNGKey(0), spec)

    g = gridlib.init(cascade=1)

    def density_fn(x):
        return jnp.where(jnp.linalg.norm(x, axis=-1) <= r0, 50.0, 0.0)

    g = gridlib.update(g, density_fn, cfg.bound, density_thresh=10.0,
                       rng=jax.random.PRNGKey(1))

    c = np.arange(-r0, r0 + 1e-6, dx, dtype=np.float64)
    xx, yy, zz = np.meshgrid(c, c, c, indexing="ij")
    pts = np.stack([xx.ravel(), yy.ravel(), zz.ravel()], 1)
    pts = pts[np.linalg.norm(pts, axis=1) <= r0]
    n = pts.shape[0]

    consts, state, aux = sim.sim_init(
        pos=pts, mass=np.full(n, 0.1), mu=np.full(n, 1e5),
        lam=np.full(n, 1e5), is_pin=np.zeros(n, bool),
        dt=cfg.sim_dt, iters=cfg.sim_iters,
        bbox=np.array([2.0, 2.0, 2.0]), kres=7, dx=dx,
        gravity=(0.0, 0.0, 0.0), stiff=cfg.sim_stiff,
        base=np.array([-1.0, -1.0, -1.0]),
    )
    fset = pipeline.make_frame_settings(spec, cfg, dx)
    return cfg, spec, params, g, consts, state, fset


def main() -> None:
    import jax
    import jax.numpy as jnp

    from pienerf_tpu.data.rays import get_rays_full
    from pienerf_tpu.render import pipeline

    on_tpu = jax.devices()[0].platform != "cpu"
    H = W = 800 if on_tpu else 64
    chunk = 16384 if on_tpu else 4096
    n_frames = 10 if on_tpu else 2

    cfg, spec, params, g, consts, state, fset = build_scene(on_tpu)

    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = (0, 0, -2.5)
    focal = 1.2 * H
    rays_o, rays_d = get_rays_full(jnp.asarray(pose),
                                   (focal, focal, W / 2, H / 2), H, W)
    n = H * W
    pad = (-n) % chunk
    if pad:
        rays_o = jnp.pad(rays_o, ((0, pad), (0, 0)), constant_values=1.0)
        rays_d = jnp.pad(rays_d, ((0, pad), (0, 0)), constant_values=1.0)
    ro_chunks = rays_o.reshape(-1, chunk, 3)
    rd_chunks = rays_d.reshape(-1, chunk, 3)

    from pienerf_tpu.render import deformed as dren
    from pienerf_tpu.sim import solver as sim

    bg = jnp.float32(1.0)
    no_force = jnp.asarray(-1, jnp.int32)
    f0 = jnp.zeros(3, jnp.float32)

    def run_frame(state):
        state = sim.sim_step(consts, state)
        p_def, F, dF = sim.get_ip_info(consts, state)
        cell_cand, near_obj = dren.prepare_frame(fset.deformed, p_def)
        outs = []
        for i in range(ro_chunks.shape[0]):
            out = dren.render_rays_deformed(
                params, spec, fset.deformed, g.bitfield,
                p_def, consts.ip_pos, F, dF,
                ro_chunks[i], rd_chunks[i], bg,
                None, cell_cand, near_obj,
            )
            outs.append(out["image"])
        return state, outs

    # warmup / compile
    state, outs = run_frame(state)
    jax.block_until_ready(outs[-1])
    state, outs = run_frame(state)
    jax.block_until_ready(outs[-1])

    t0 = time.perf_counter()
    for _ in range(n_frames):
        state, outs = run_frame(state)
    jax.block_until_ready(outs[-1])
    dt = (time.perf_counter() - t0) / n_frames
    fps = 1.0 / dt

    baseline_fps = 12.5  # reference 80 ms/frame interactive budget
    print(json.dumps({
        "metric": f"coupled sim+deformed-render FPS @ {H}x{W} "
                  f"(sphere stand-in for chair demo)",
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / baseline_fps, 3),
    }))


if __name__ == "__main__":
    main()
