"""TPU matmul-precision hypothesis: the verify cube at dt=5e-3 blows up on
TPU (fine on CPU). DEFAULT f32 matmul precision on TPU is one-pass bf16;
test DEFAULT vs HIGHEST on the same trajectory."""
import sys
import numpy as np
import jax
import jax.numpy as jnp

mode = sys.argv[1] if len(sys.argv) > 1 else "default"
if mode == "highest":
    jax.config.update("jax_default_matmul_precision", "highest")

from pienerf_tpu.sim import solver as sim

g = np.linspace(0.3, 0.7, 8) - 0.5
x, y, z = np.meshgrid(g, g, g, indexing="ij")
p = np.stack([x.ravel(), y.ravel(), z.ravel()], 1)
n = len(p)
consts, state, aux = sim.sim_init(
    p, np.full(n, 0.1), np.full(n, 1e4), np.full(n, 1e4), p[:, 1] > 0.15,
    dt=5e-3, iters=10, bbox=np.array([1.0, 1.0, 1.0]), kres=4, dx=0.2,
    gravity=(0.0, -9.8, 0.0), stiff=1e5, base=np.array([-0.5, -0.5, -0.5]))

@jax.jit
def loop(cs, st, r):
    return jax.lax.fori_loop(0, r, lambda i, s: sim.sim_step(cs, s), st)

for chunk in range(6):
    state = loop(consts, state, 20)
    pos = sim.point_positions(consts, state)
    print(f"{mode} t={round((chunk+1)*20*5e-3,2)} "
          f"ymin={float(jnp.min(pos[:,1])):.2f} "
          f"n={float(jnp.linalg.norm(state.ddof)):.3g}", flush=True)
