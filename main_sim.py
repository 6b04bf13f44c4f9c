"""Headless simulation: step an annotated PLY and write per-frame clouds
(reference: simulator/main_sim.py — which crashes on an undefined name
:26; this is the working equivalent).

    python main_sim.py --ply assets/chair.ply --steps 1000 --out_dir sim_out
"""

import argparse
import os
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--ply", type=str, required=True)
    parser.add_argument("--steps", type=int, default=1000)
    parser.add_argument("--out_dir", type=str, default="sim_out")
    parser.add_argument("--out_every", type=int, default=10)
    parser.add_argument("--sim_dt", type=float, default=1e-2)
    parser.add_argument("--sim_dx", type=float, default=0.05)
    parser.add_argument("--sim_iters", type=int, default=10)
    parser.add_argument("--sim_stiff", type=float, default=1e5)
    parser.add_argument("--bound", type=float, default=1.0)
    parser.add_argument("--kres", type=int, default=7)
    parser.add_argument("--gravity", nargs=3, type=float,
                        default=[0.0, -9.8, 0.0])
    parser.add_argument("--sim_substeps", type=int, default=1,
                        help="inner steps of dt/substeps per output step "
                             "(stabilizes stiff scenes; 1 = reference)")
    ns = parser.parse_args()

    from pienerf_tpu.io.ply import read_physics_ply, write_ply
    from pienerf_tpu.sim import solver as sim

    d = read_physics_ply(ns.ply)
    consts, state, aux = sim.sim_init(
        d["pos"], d["mass"], d["mu"], d["lam"], d["pin"],
        dt=ns.sim_dt / ns.sim_substeps, iters=ns.sim_iters,
        bbox=np.array([2.0 * ns.bound] * 3), kres=ns.kres, dx=ns.sim_dx,
        gravity=tuple(ns.gravity), stiff=ns.sim_stiff,
        base=np.array([-ns.bound] * 3),
    )
    print(f"[sim] {d['pos'].shape[0]} points, {aux['n_ip']} IPs, "
          f"{aux['n_k']} kernel nodes")

    os.makedirs(ns.out_dir, exist_ok=True)
    t0 = time.time()
    for i in range(ns.steps):
        for _ in range(ns.sim_substeps):
            state = sim.sim_step(consts, state)
        if i % ns.out_every == 0:
            pos = np.asarray(sim.point_positions(consts, state))
            if not np.isfinite(pos).all():
                raise SystemExit(
                    f"simulation diverged at step {i} (NaN positions). "
                    "The local-global iteration is only conditionally "
                    "stable (the CUDA reference has the same behavior): "
                    "raise --sim_substeps (runs dt/substeps inner steps), "
                    "increase point mass, or reduce lam/mu stiffness.")
            write_ply(os.path.join(ns.out_dir, f"pnt_{i:05d}.ply"), pos)
    dt = time.time() - t0
    print(f"{ns.steps} steps in {dt:.2f}s -> {ns.steps / dt:.1f} steps/s")


if __name__ == "__main__":
    main()
