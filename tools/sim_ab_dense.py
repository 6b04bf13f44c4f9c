"""A/B the cell-chunked assembly operator against the round-3 dense B at
small IP counts (round-4 review item 7: solver_steps_per_s fell 643 ->
474 at the same 3k-IP bench scene when the chunked operator landed; the
chunked form was built for 50k IPs and nothing priced it at 3k).

The dense operator is reconstructed here from SimConstants.IP_dNx /
IP_kernel (the same data sim_init used to build it through round 3,
commit 515975e^), applied with the identical delta-form elastic math
(solver.rhs_elastic_delta semantics), and parity-checked against the
chunked rhs before timing. Timing protocol: chained sim states through a
scan of steps (one host sync per arm), distinct inputs per call —
PERF.md measurement discipline.

    python tools/sim_ab_dense.py --dx 0.05 --steps 200
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pienerf_tpu.data import synthetic
from pienerf_tpu.sim import solver
from pienerf_tpu.sim.svd3 import corotated_delta

_HI = jax.lax.Precision.HIGHEST


def build_dense_B(consts: solver.SimConstants) -> np.ndarray:
    """B[j*nIP + v, k*10 + a] = sum_i dNx[v, i, j, a] [IP_kernel[v,i]==k]
    (the round-3 operator, solver.py@515975e^)."""
    IP_dNx = np.asarray(consts.IP_dNx, np.float64)     # [nIP, 8, 3, 10]
    ip_kernel = np.asarray(consts.IP_kernel)           # [nIP, 8]
    n_ip = IP_dNx.shape[0]
    n_k = consts.dof_rest.shape[0]
    B = np.zeros((3 * n_ip, 10 * n_k))
    cols = (ip_kernel[:, :, None] * 10
            + np.arange(10)[None, None, :]).reshape(n_ip, 80)
    vrows = np.repeat(np.arange(n_ip)[:, None], 80, axis=1)
    for j in range(3):
        np.add.at(B, (j * n_ip + vrows, cols),
                  IP_dNx[:, :, j, :].reshape(n_ip, 80))
    return B


def make_dense_step(consts: solver.SimConstants, B: jax.Array):
    n_ip = consts.IP_mu.shape[0]
    mu = consts.IP_mu
    lam = consts.IP_lam
    dx3 = consts.dx ** 3

    def rhs_elastic(ddof):
        n_k = ddof.shape[0]
        Fd = jnp.matmul(B, ddof.reshape(n_k * 10, 3), precision=_HI)
        # Fd[j*nIP + v, d] = F_delta[v, d, j]
        F = tuple(
            tuple(Fd[j * n_ip:(j + 1) * n_ip, d] + (1.0 if d == j else 0.0)
                  for j in range(3))
            for d in range(3))
        dR, dV = corotated_delta(F)
        dP = jnp.concatenate([
            jnp.stack([dx3 * (mu * dR[d][j] + lam * dV[d][j])
                       for d in range(3)], axis=-1)
            for j in range(3)], axis=0)                  # [3*nIP, 3]
        return jnp.matmul(B.T, dP, precision=_HI).reshape(n_k, 10, 3)

    @jax.jit
    def step(state):
        n_k = state.ddof.shape[0]
        dim = n_k * 10
        ddof_tilde = state.ddof + consts.dt * state.dof_vel
        momentum = (
            jnp.matmul(consts.mass_invt2, ddof_tilde.reshape(dim, 3),
                       precision=_HI).reshape(n_k, 10, 3)
            + state.dof_f + consts.rhs_gravity)

        def body(_, ddof):
            rhs = momentum + rhs_elastic(ddof)
            return jnp.matmul(consts.global_inv, rhs.reshape(dim, 3),
                              precision=_HI).reshape(n_k, 10, 3)

        ddof = jax.lax.fori_loop(0, consts.iters, body, state.ddof)
        vel = (ddof - state.ddof) / consts.dt * 0.998
        return solver.SimState(ddof=ddof, dof_vel=vel, dof_f=state.dof_f)

    return step, rhs_elastic


def scene(dx):
    pts = synthetic.scene_points("sphere", dx=dx, bound=0.7)
    n = pts.shape[0]
    consts, state, _ = solver.sim_init(
        pts, np.full(n, 0.1), np.full(n, 1e5), np.full(n, 1e5),
        pts[:, 2] < -0.3, dt=1e-2, iters=10,
        bbox=np.array([2.0, 2.0, 2.0]), kres=7, dx=dx,
        gravity=(0.0, 0.0, 0.0), stiff=1e5,
        base=np.array([-1.0, -1.0, -1.0]),
        dense_operator=True)    # one init; the chunked arm drops B
    return pts, consts, state


def time_steps(step_fn, state0, n_steps, reps=3):
    # spring kick so the elastic path does real work
    state = state0._replace(
        dof_f=state0.dof_f + 1e-3 * jnp.ones_like(state0.dof_f))

    def chain(s, _):
        s2 = step_fn(s)
        return s2, s2.ddof[0, 0, 0]

    chained = jax.jit(lambda s: jax.lax.scan(chain, s, None,
                                             length=n_steps))
    out, tr = chained(state)                 # warm/compile
    jax.block_until_ready(tr)
    walls = []
    for r in range(reps):
        sr = state._replace(dof_f=state.dof_f * (1.0 + 1e-4 * (r + 1)))
        t0 = time.perf_counter()
        out, tr = chained(sr)
        float(tr[-1])                        # forced scalar fetch
        walls.append(time.perf_counter() - t0)
    assert np.isfinite(float(tr[-1]))
    return min(walls) / n_steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dx", type=float, default=0.05)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--out", default="runs/sim_ab_dense.json")
    args = ap.parse_args()

    pts, consts_d, state = scene(args.dx)
    consts_c = consts_d._replace(B=None)
    n_ip = int(consts_d.IP_mu.shape[0])
    C, S = consts_d.chunk_mu.shape
    B = consts_d.B
    print(f"nIP={n_ip} chunks C={C} S={S} "
          f"Dc={consts_d.Dc.size * 4 / 1e6:.1f} MB; "
          f"dense B {B.shape} = {B.size * 4 / 1e6:.1f} MB")

    # parity: dense rhs == chunked rhs on a deformed state
    k = jax.random.PRNGKey(0)
    ddof = 1e-2 * jax.random.normal(k, consts_d.dof_rest.shape, jnp.float32)
    r_d = np.asarray(jax.jit(
        lambda d: solver.rhs_elastic_delta(consts_d, d))(ddof))
    r_c = np.asarray(jax.jit(
        lambda d: solver.rhs_elastic_delta(consts_c, d))(ddof))
    scale = max(1e-12, float(np.abs(r_d).max()))
    rel = float(np.abs(r_d - r_c).max()) / scale
    print(f"dense-vs-chunked rhs rel err {rel:.2e}")
    assert rel < 1e-4, "operators disagree; timing would be meaningless"

    ms_dense = time_steps(
        jax.jit(lambda s: solver.sim_step(consts_d, s)), state,
        args.steps) * 1e3
    ms_chunk = time_steps(
        jax.jit(lambda s: solver.sim_step(consts_c, s)), state,
        args.steps) * 1e3
    res = {
        "dx": args.dx, "n_ip": n_ip, "chunks": int(C), "S": int(S),
        "dense_B_MB": round(int(B.size) * 4 / 1e6, 1),
        "Dc_MB": round(int(consts_d.Dc.size) * 4 / 1e6, 1),
        "ms_per_step_dense": round(ms_dense, 3),
        "ms_per_step_chunked": round(ms_chunk, 3),
        "steps_per_s_dense": round(1e3 / ms_dense, 1),
        "steps_per_s_chunked": round(1e3 / ms_chunk, 1),
        "chunked_over_dense": round(ms_chunk / ms_dense, 3),
        "rhs_rel_err": rel,
    }
    print(json.dumps(res, indent=1))
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(res, fh, indent=1)


if __name__ == "__main__":
    main()
