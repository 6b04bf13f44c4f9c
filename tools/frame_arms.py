"""Frame-level A/B of fused-kernel knobs (round-5, VERDICT item 3).

The micro-kernel decomposition probes (tools/kernel_decomp.py,
tools/micro_floor.py) returned work-insensitive 22-30 ms arms through
the tunnel — unusable for attribution. This tool prices the same knobs
at the FRAME level through the production `render_frame_fused` path
with the established chained-state timing discipline (PERF.md), which
has been stable to ~0.1 ms across rounds:

  default      shipped settings (block_tiles=1)
  B2/B4        tiles per Pallas grid step (per-step floor amortization)
  static       deformed=False — the MLP+composite floor, bend stripped
  seek1        bend nearest-IP seek iterations 3 -> 1
  Wn32         bend candidate window 64 -> 32
  nogate       gate_tiles=False (what candidate-count gating buys)
  approx       prep_approx_topk=True (prep top_k savings)
  K64          samples 128 -> 64 (work-sensitivity check: if the frame
               barely moves, a work-insensitive floor dominates)

Each arm is one fresh Pallas compile (minutes through the tunnel);
results print per arm so a wedged compile still leaves the earlier
arms on disk.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pienerf_tpu.io import checkpoint as ckpt_io
from pienerf_tpu.models import network
from pienerf_tpu.ops import beam_bend
from pienerf_tpu.ops.pallas import field_kernel
from pienerf_tpu.render import interactive
from pienerf_tpu.sim import solver as sim


def median_ms(step, fetch, n=16, reps=3):
    step(0)
    fetch()
    outs = []
    k = 1
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            step(k)
            k += 1
        fetch()
        outs.append((time.perf_counter() - t0) / n * 1e3)
    return float(np.median(outs))


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    r0, dx = 0.45, 0.05
    c = np.arange(-r0, r0 + 1e-6, dx)
    xx, yy, zz = np.meshgrid(c, c, c, indexing="ij")
    pts = np.stack([xx.ravel(), yy.ravel(), zz.ravel()], 1)
    pts = pts[np.linalg.norm(pts, axis=1) <= r0]
    n = pts.shape[0]
    is_pin = pts[:, 2] < -0.3
    consts, state, _ = sim.sim_init(
        pts, np.full(n, 0.1), np.full(n, 1e5), np.full(n, 1e5), is_pin,
        dt=1e-2, iters=10, bbox=np.array([2.0, 2.0, 2.0]), kres=7, dx=dx,
        gravity=(0.0, 0.0, 0.0), stiff=1e5,
        base=np.array([-1.0, -1.0, -1.0]))

    ckpt = os.environ.get("PF_CKPT") or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "runs/quality_mlp_800/checkpoints/ngp_ep0015.npz")
    tree, _ = ckpt_io.load_native(ckpt)
    params = tree.get("ema_params", tree.get("params", tree))
    nf = (params["sigma_net"][0].shape[0] // 3 - 1) // 2
    spec = network.make_spec(bound=1.0, backbone="mlp",
                             compute_dtype="bfloat16", n_freqs=nf,
                             num_layers=len(params["sigma_net"]))
    pw = field_kernel.pack_weights(params, spec)

    bst = beam_bend.BeamBendSettings(num_seek_ip=3, max_iter_num=1,
                                     ip_dx=1.05 * dx, ips_per_tile=256,
                                     bin_capacity=8)
    ist = interactive.InteractiveSettings(
        spec=spec, bend=bst, tile=16, samples=128, active_frac=0.5,
        tile_chunk=32, min_near=0.05, tighten_sampling=True)
    H = W = 800
    intr = (1.2 * H, 1.2 * H, W / 2, H / 2)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = (0, 0, -2.5)
    pose_j = jnp.asarray(pose)

    fvid = jnp.int32(int(np.argmax(pts[:, 2])))

    @jax.jit
    def push(st, a):
        st = sim.update_force(consts, st,
                              fvid, jnp.asarray([2e3 * a, 0.0, 0.0]))
        return sim.sim_step(consts, st)
    for i in range(5):
        state = push(state, float(1.0 + 0.01 * i))

    @jax.jit
    def pack_fn(st):
        p_def, F, dF = sim.get_ip_info(consts, st)
        return beam_bend.pack_ip_data_fast(
            p_def, consts.ip_pos.astype(jnp.float32), F, dF), p_def
    pk, pd = pack_fn(state)

    pw_paired = None

    arms = [
        ("default B1", ist),
        ("paired MLP", ist),
        ("B2", ist._replace(block_tiles=2)),
        ("B4", ist._replace(block_tiles=4)),
        ("static (no bend)", ist._replace(deformed=False)),
        ("seek=1", ist._replace(bend=bst._replace(num_seek_ip=1))),
        ("Wn=32", ist._replace(bend_window=32)),
        ("nogate", ist._replace(gate_tiles=False)),
        ("approx topk", ist._replace(prep_approx_topk=True)),
        ("K=64", ist._replace(samples=64)),
    ]
    only = os.environ.get("PF_ARMS")
    if only:
        keys = [s.strip() for s in only.split(",")]
        arms = [a for a in arms if any(k in a[0] for k in keys)]

    for name, st_arm in arms:
        acc = [None]
        t0 = time.perf_counter()
        if name == "paired MLP":
            if pw_paired is None:
                pw_paired = field_kernel.pack_weights_paired(params, spec)
            pw_arm = pw_paired
        else:
            pw_arm = pw

        def run(k, st_arm=st_arm, pw_arm=pw_arm):
            out = interactive.render_frame_fused(
                st_arm, pw_arm, pk, pd, pose_j, intr, H, W,
                jnp.float32(1.0), t_jitter=0.25 + 1e-5 * (k % 17))
            acc[0] = out["tiles_image"] if acc[0] is None \
                else acc[0] + out["tiles_image"]
        try:
            ms = median_ms(run, lambda: float(jnp.sum(acc[0])))
            print(f"{name:22s} {ms:7.2f} ms   "
                  f"(compile+run {time.perf_counter() - t0:.0f}s)",
                  flush=True)
        except Exception as e:  # keep later arms alive
            print(f"{name:22s} FAILED: {e}", flush=True)


if __name__ == "__main__":
    main()
