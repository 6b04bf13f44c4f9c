"""Measure sim_step at 10k+ IPs (ROADMAP item 7).

The dense B assembly operator is [3*nIP, 10*nK]; at 3k IPs / kres=7 it is
~25 MB and two matmuls per iteration are cheap. This tool measures how the
step scales to 10k-30k IPs (denser sim_dx and/or larger kres) and prints the
per-structure memory so we can decide whether a sparse/Pallas path is needed.
"""
import time
import numpy as np
import jax, jax.numpy as jnp
from pienerf_tpu.sim import solver as sim


def scene(dx, r0=0.45):
    c = np.arange(-r0, r0 + 1e-6, dx)
    xx, yy, zz = np.meshgrid(c, c, c, indexing="ij")
    pts = np.stack([xx.ravel(), yy.ravel(), zz.ravel()], 1)
    return pts[np.linalg.norm(pts, axis=1) <= r0]


def bench(dx, kres, iters=10):
    pts = scene(dx)
    n = pts.shape[0]
    # pinned bottom cap: an unpinned body under sustained force is a free
    # body that drifts out of the domain and overflows (tools/diverge_probe)
    is_pin = pts[:, 2] < -0.3
    t_init = time.perf_counter()
    consts, state, aux = sim.sim_init(
        pts, np.full(n, 0.1), np.full(n, 1e5), np.full(n, 1e5),
        is_pin, dt=1e-2, iters=iters,
        bbox=np.array([2.0, 2.0, 2.0]), kres=kres, dx=dx,
        gravity=(0., 0., 0.), stiff=1e5, base=np.array([-1., -1., -1.]))
    t_init = time.perf_counter() - t_init
    n_ip, n_k = aux["n_ip"], aux["n_k"]
    mb = lambda a: a.size * a.dtype.itemsize / 1e6

    @jax.jit
    def sim_loop(cs, st, r):
        # consts as an ARGUMENT: closing over it bakes the B operator into
        # the HLO as a constant (233MB+ compile payloads through the tunnel).
        return jax.lax.fori_loop(0, r, lambda i, s: sim.sim_step(cs, s), st)

    state = sim.update_force(consts, state, jnp.int32(n_ip // 2),
                             jnp.asarray([2e2, 0, 0], jnp.float32))
    st = sim_loop(consts, state, 5)
    jax.block_until_ready(st.ddof)
    reps = 50
    t0 = time.perf_counter()
    st = sim_loop(consts, st, reps)
    _ = float(jnp.sum(st.ddof))
    dt_step = (time.perf_counter() - t0) / reps
    print(f"dx={dx:.3f} kres={kres}: nIP={n_ip} nK={n_k} "
          f"Dc={mb(consts.Dc):.0f}MB Ginv={mb(consts.global_inv):.0f}MB "
          f"init={t_init:.1f}s step={dt_step*1e3:.2f}ms "
          f"({1/dt_step:.0f} steps/s) finite={bool(jnp.isfinite(st.ddof).all())}")


if __name__ == "__main__":
    import sys
    configs = [(0.05, 7), (0.035, 7), (0.025, 7), (0.025, 9)]
    if len(sys.argv) > 1:
        configs = [(float(sys.argv[1]), int(sys.argv[2]))]
    for dx, kres in configs:
        bench(dx, kres)
