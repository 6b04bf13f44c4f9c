"""Does the local-global scheme destabilize at SMALLER dt? (observed: the
verify cube under gravity sags normally at dt=1e-2 but blows up at 5e-3)."""
import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
from pienerf_tpu.sim import solver as sim


def cube():
    g = np.linspace(0.3, 0.7, 8) - 0.5
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    p = np.stack([x.ravel(), y.ravel(), z.ravel()], 1)
    n = len(p)
    return (p, np.full(n, 0.1), np.full(n, 1e4), np.full(n, 1e4),
            (p[:, 1] > 0.15))


def run(dt, t_end=0.6, iters=10, label=""):
    p, m, mu, lam, pin = cube()
    consts, state, aux = sim.sim_init(
        p, m, mu, lam, pin, dt=dt, iters=iters,
        bbox=np.array([1.0, 1.0, 1.0]), kres=4, dx=0.2,
        gravity=(0.0, -9.8, 0.0), stiff=1e5,
        base=np.array([-0.5, -0.5, -0.5]))
    steps = int(round(t_end / dt))
    out = []
    for i in range(steps):
        state = sim.sim_step(consts, state)
        if (i + 1) % max(1, steps // 6) == 0:
            pos = sim.point_positions(consts, state)
            out.append((round((i + 1) * dt, 3),
                        float(jnp.min(pos[:, 1])),
                        float(jnp.linalg.norm(state.ddof))))
    print(f"{label} dt={dt:g} iters={iters}: " +
          " ".join(f"t{t}:ymin={y:.2f}|n={nn:.3g}" for t, y, nn in out),
          flush=True)


if __name__ == "__main__":
    run(1e-2, label="A")
    run(5e-3, label="B")
    run(2.5e-3, label="C")
    run(5e-3, iters=20, label="D")
