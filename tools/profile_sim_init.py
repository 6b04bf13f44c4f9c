"""Profile the one-time sim_init precompute (round-3 item 5).

PERF.md recorded 140-410 s at 24k IPs for the f64 host init. This tool
builds the same scale scene (dense sphere, dx=0.025) and reports
cumulative time per phase via cProfile so the optimization targets the
measured hot spot, not a guess.

    python tools/profile_sim_init.py [--dx 0.025] [--kres 7]
"""

import argparse
import cProfile
import io
import os
import pstats
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")   # host-only profile

from pienerf_tpu.sim import solver


def build_scene(dx):
    g = np.arange(-0.45, 0.451, dx * 0.8, dtype=np.float64)
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    p = np.stack([x.ravel(), y.ravel(), z.ravel()], 1)
    p = p[np.linalg.norm(p, axis=1) <= 0.45]
    n = len(p)
    return (p, np.full(n, 0.1), np.full(n, 1e5), np.full(n, 1e5),
            p[:, 1] > 0.3)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dx", type=float, default=0.025)
    ap.add_argument("--kres", type=int, default=7)
    args = ap.parse_args()

    pos, mass, mu, lam, pin = build_scene(args.dx)
    print(f"{len(pos)} points, dx={args.dx}, kres={args.kres}")

    t0 = time.time()
    pr = cProfile.Profile()
    pr.enable()
    consts, state, aux = solver.sim_init(
        pos, mass, mu, lam, pin, dt=1e-2, iters=10,
        bbox=np.array([1.0, 1.0, 1.0]), kres=args.kres, dx=args.dx,
        stiff=1e5, base=np.array([-0.5, -0.5, -0.5]))
    pr.disable()
    wall = time.time() - t0
    print(f"n_ip={aux['n_ip']}, n_k={aux['n_k']}, wall {wall:.1f}s")

    s = io.StringIO()
    st = pstats.Stats(pr, stream=s).sort_stats("cumulative")
    st.print_stats(25)
    print(s.getvalue())


if __name__ == "__main__":
    main()
