"""Stage breakdown of the DEFAULT fused coupled frame (round-3 tuning:
K=128 + tighten + reach windows, trained field, bench scene/protocol).

The k-frontier showed the pipeline is prep/sim/dispatch-bound rather than
sample-bound (PERF.md "Sampling density"); this tool prices each stage so
optimization goes where the milliseconds are:

  sim      sim_step (10 iters)
  pack     get_ip_info + pack_ip_data_fast
  prep     tile activity + candidate top_k/binning (prep_candidates)
  kernel   the Pallas tile kernel itself (fixed prepped inputs,
           t_jitter varied per call so nothing memoizes)
  frame    render_frame_fused (= prep + kernel + scatter)
  coupled  pipeline.interactive_frame_step (the product)

Timing discipline per PERF.md: chain distinct inputs, force a scalar
fetch per timed region, median of reps.
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
from pienerf_tpu.ops.pallas import field_kernel, tile_kernel
from pienerf_tpu.render import interactive, pipeline
from pienerf_tpu.sim import solver as sim


def median_ms(step, fetch, n=16, reps=3):
    """step(k) enqueues work (chained device-side, NO host sync);
    fetch() forces one scalar host read. The tunnel's flat ~28 ms fetch
    cost amortizes over n; per-call fetching floors every stage at
    ~50 ms (measured) and tells you nothing."""
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
    print("platform:", jax.devices()[0].platform)
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
    print(f"scene: {n} pts, {consts.ip_pos.shape[0]} IPs")

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

    # drag force, same as bench
    fvid = jnp.int32(int(np.argmax(pts[:, 2])))

    # settle 5 steps so the deformation is realistic
    @jax.jit
    def push(st, a):
        st = sim.update_force(consts, st,
                              fvid, jnp.asarray([2e3 * a, 0.0, 0.0]))
        return sim.sim_step(consts, st)
    for i in range(5):
        state = push(state, float(1.0 + 0.01 * i))

    # --- coupled (the product)
    @jax.jit
    def coupled(st, a):
        f = jnp.asarray([2e3 * a, 0.0, 0.0], jnp.float32)
        return pipeline.interactive_frame_step(
            ist, consts, st, pw, pose_j, intr, H, W, jnp.float32(1.0),
            fvid, f)
    stc = state
    acc = [None]

    def run_coupled(k):
        nonlocal stc
        stc, out = coupled(stc, jnp.float32(1.0 + 1e-4 * k))
        acc[0] = out["tiles_image"] if acc[0] is None \
            else acc[0] + out["tiles_image"]
    print(f"coupled frame: "
          f"{median_ms(run_coupled, lambda: float(jnp.sum(acc[0]))):.2f} ms")

    # --- sim only
    sts = state

    def run_sim(k):
        nonlocal sts
        sts = push(sts, 1.0 + 1e-4 * k)
    print(f"sim_step:      "
          f"{median_ms(run_sim, lambda: float(sts.ddof[0, 0, 0])):.2f} ms")

    # --- pack only
    @jax.jit
    def pack_fn(st):
        p_def, F, dF = sim.get_ip_info(consts, st)
        return beam_bend.pack_ip_data_fast(
            p_def, consts.ip_pos.astype(jnp.float32), F, dF), p_def
    stp = state
    pk_last = [None]

    def run_pack(k):
        nonlocal stp
        stp = push(stp, 1.0 + 1e-4 * k)
        pk_last[0], _pd = pack_fn(stp)
    print(f"sim+pack:      "
          f"{median_ms(run_pack, lambda: float(pk_last[0][0, 0])):.2f} ms")

    # --- full fused frame (prep + kernel), fixed sim state
    pk, pd = pack_fn(state)
    facc = [None]

    def run_frame(k):
        out = interactive.render_frame_fused(
            ist, pw, pk, pd, pose_j, intr, H, W, jnp.float32(1.0),
            t_jitter=0.25 + 1e-5 * (k % 17))
        facc[0] = out["tiles_image"] if facc[0] is None \
            else facc[0] + out["tiles_image"]
    print(f"fused frame:   "
          f"{median_ms(run_frame, lambda: float(jnp.sum(facc[0]))):.2f} ms")

    # --- prep only: replicate render_frame_fused's XLA front half
    ts = 16
    n_tiles = (H // ts) * (W // ts)
    a_cap = int(n_tiles * 0.5) // 32 * 32
    K = ist.samples

    @jax.jit
    def prep(pk, pd, eps):
        marg = 1e-3
        bbmin = jnp.min(pd, axis=0) - marg
        bbmax = jnp.max(pd, axis=0) + marg
        all_tids = jnp.arange(n_tiles, dtype=jnp.int32)
        o, d_all = interactive._tile_rays(all_tids, ist, H, W, pose_j, intr)
        near_all, far_all = interactive._near_far(o, d_all, bbmin, bbmax,
                                                  ist.min_near)
        hit = jnp.any(near_all < 1e30, axis=1)
        rank = jnp.cumsum(hit) - 1
        take = hit & (rank < a_cap)
        act_ids = jnp.zeros((a_cap,), jnp.int32).at[
            jnp.where(take, rank, a_cap)].set(
            jnp.where(take, all_tids, 0), mode="drop")
        o_, d = interactive._tile_rays(act_ids, ist, H, W, pose_j, intr)
        near, far = interactive._near_far(o_, d, bbmin, bbmax, ist.min_near)
        thit = near < 1e30
        t0 = jnp.min(jnp.where(thit, near, jnp.inf), axis=1)
        t1 = jnp.max(jnp.where(thit, far, -jnp.inf), axis=1)
        t0 = jnp.where(jnp.isfinite(t0), t0, 1.0)
        t1 = jnp.where(jnp.isfinite(t0), jnp.maximum(t1, t0 + 1e-3), 1.001)
        ax = tuple(jnp.mean(d[i], axis=1) for i in range(3))
        an = jnp.sqrt(ax[0] ** 2 + ax[1] ** 2 + ax[2] ** 2)
        axis = jnp.stack([ax[i] / an for i in range(3)], axis=1)
        origin = jnp.broadcast_to(o, (a_cap, 3))
        tan_half = jnp.broadcast_to(jnp.float32(ts * 0.75 / intr[0]),
                                    (a_cap,))
        tmarg = max(3.0 * bst.ip_dx, beam_bend.reach_of(bst) + bst.ip_dx)
        cand, bin_start, nd, t0e, t1e = tile_kernel.prep_candidates(
            pk, pd + eps, origin, axis, tan_half, t0, t1,
            n_cand=bst.ips_per_tile, n_bins=K + 2,
            beam_margin=beam_bend.margin_of(bst), tighten_margin=tmarg)
        return cand, bin_start, t0e, t1e

    pacc = [None]

    def run_prep(k):
        out = prep(pk, pd, jnp.float32(1e-7 * k))
        pacc[0] = out[0][0, 0, 0] if pacc[0] is None \
            else pacc[0] + out[0][0, 0, 0]
    print(f"prep (XLA):    "
          f"{median_ms(run_prep, lambda: float(pacc[0])):.2f} ms")


if __name__ == "__main__":
    main()
