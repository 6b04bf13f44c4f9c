import time
import numpy as np
import jax, jax.numpy as jnp
from pienerf_tpu.sim import solver as sim

r0, dx = 0.45, 0.05
c = np.arange(-r0, r0+1e-6, dx)
xx, yy, zz = np.meshgrid(c, c, c, indexing="ij")
pts = np.stack([xx.ravel(), yy.ravel(), zz.ravel()], 1)
pts = pts[np.linalg.norm(pts, axis=1) <= r0]
n = pts.shape[0]
consts, state, aux = sim.sim_init(
    pts, np.full(n, 0.1), np.full(n, 1e5), np.full(n, 1e5),
    np.zeros(n, bool), dt=1e-2, iters=10,
    bbox=np.array([2.0,2.0,2.0]), kres=7, dx=dx,
    gravity=(0.,0.,0.), stiff=1e5, base=np.array([-1.,-1.,-1.]))

@jax.jit
def sim_loop(st, r):
    def body(i, s):
        return sim.sim_step(consts, s)
    return jax.lax.fori_loop(0, r, body, st)

# rest state
st2 = sim_loop(state, 5); jax.block_until_ready(st2.ddof)
t0=time.perf_counter(); st2 = sim_loop(st2, 50); _=float(jnp.sum(st2.ddof))
print(f"rest-state: {50/(time.perf_counter()-t0):.1f} steps/s")

# deformed state (after force)
state_f = sim.update_force(consts, state, jnp.int32(n//2), jnp.asarray([2e3,0,0], jnp.float32))
st3 = sim_loop(state_f, 20); jax.block_until_ready(st3.ddof)
t0=time.perf_counter(); st3 = sim_loop(st3, 50); _=float(jnp.sum(st3.ddof))
print(f"deformed: {50/(time.perf_counter()-t0):.1f} steps/s")
print("ddof norm:", float(jnp.linalg.norm(st3.ddof)), "finite:", bool(jnp.isfinite(st3.ddof).all()))
