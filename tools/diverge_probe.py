"""Probe the constant-force divergence seen at the bench scene: f32 vs f64,
constant vs spring force, ||ddof|| profile. CPU-only for determinism."""
import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp
from pienerf_tpu.sim import solver as sim


def scene(dx, r0=0.45):
    c = np.arange(-r0, r0 + 1e-6, dx)
    xx, yy, zz = np.meshgrid(c, c, c, indexing="ij")
    pts = np.stack([xx.ravel(), yy.ravel(), zz.ravel()], 1)
    return pts[np.linalg.norm(pts, axis=1) <= r0]


def run(dx, dtype, force, steps=100, spring=False, label="", pin=False,
        substeps=1, iters=10):
    pts = scene(dx)
    n = pts.shape[0]
    is_pin = pts[:, 2] < -0.3 if pin else np.zeros(n, bool)
    consts, state, aux = sim.sim_init(
        pts, np.full(n, 0.1), np.full(n, 1e5), np.full(n, 1e5),
        is_pin, dt=1e-2 / substeps, iters=iters,
        bbox=np.array([2.0, 2.0, 2.0]), kres=7, dx=dx,
        gravity=(0., 0., 0.), stiff=1e5, base=np.array([-1., -1., -1.]),
        dtype=dtype)
    vid = (int(np.argmax(aux["ip_pos"][:, 2])) if pin
           else aux["n_ip"] // 2)
    norms = []
    for i in range(steps):
        p_ip = consts.ip_pos[vid] + jnp.einsum(
            "ia,iad->d", consts.IP_Nx[vid],
            state.ddof[consts.IP_kernel[vid]])
        if spring:
            target = consts.ip_pos[vid] + jnp.asarray([0.25, 0., 0.], dtype)
            f = jnp.clip(force * (target - p_ip), -5e5, 5e5)
        else:
            f = jnp.asarray([force, 0., 0.], dtype)
        state = sim.update_force(consts, state, jnp.int32(vid), f)
        for _ in range(substeps):
            state = sim.sim_step(consts, state)
        if (i + 1) % 10 == 0:
            norms.append((i + 1, float(jnp.linalg.norm(state.ddof)),
                          float(jnp.linalg.norm(p_ip - consts.ip_pos[vid]))))
    print(f"{label} dx={dx} {np.dtype(dtype).name} pin={pin} sub={substeps} "
          f"{'spring' if spring else 'const'} f={force:g}: " +
          " ".join(f"{s}:{v:.3g}/{d:.2f}" for s, v, d in norms), flush=True)


if __name__ == "__main__":
    run(0.05, jnp.float32, 1e5, spring=True, pin=True, steps=100,
        substeps=4, label="N")
    run(0.05, jnp.float64, 3e5, spring=True, pin=True, steps=100,
        substeps=4, label="O")
    run(0.05, jnp.float32, 3e5, spring=True, pin=True, steps=100,
        substeps=1, label="P")  # iters=10 baseline for comparison vs Q
    run(0.05, jnp.float32, 3e5, spring=True, pin=True, steps=100,
        substeps=1, label="Q", iters=40)
