"""Decompose the fused tile kernel's frame cost at the BENCH operating
point (round-5, VERDICT item 3): same scene/checkpoint/prep as
tools/profile_fused.py, but times tile_kernel.render_tiles alone across
controlled arms so optimization goes at the dominant stage:

  default     seek=3, Wn=64, bf16 MLP, deformed (the shipped point)
  seek=1      bend nearest-IP iterations 3 -> 1 (bend argmin/fetch cost)
  Wn=32       candidate window halved (bend d2/argmin VPU cost)
  static      deformed=False (NO bend at all -> MLP+composite floor)
  f32         compute_dtype f32 (MXU bf16 speedup check)
  gated       tile_sc active flags ANDed with count_in_beam>0 (what
              gate_tiles buys inside the kernel at this pose)
  idle        all slots inactive (the pure A-slot grid-step floor)

Timing discipline per PERF.md: chained distinct inputs (t_jitter via
params row), one scalar fetch per rep block, median of reps.
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

    ckpt = os.environ.get("PF_CKPT") or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "runs/quality_mlp_800/checkpoints/ngp_ep0015.npz")
    tree, _ = ckpt_io.load_native(ckpt)
    params = tree.get("ema_params", tree.get("params", tree))
    nf = (params["sigma_net"][0].shape[0] // 3 - 1) // 2
    spec = network.make_spec(bound=1.0, backbone="mlp",
                             compute_dtype="bfloat16", n_freqs=nf,
                             num_layers=len(params["sigma_net"]))
    spec32 = spec._replace(compute_dtype="float32")
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

    # --- replicate render_frame_fused's prep (ungated slot set)
    ts = 16
    n_tiles = (H // ts) * (W // ts)
    a_cap = int(n_tiles * 0.5) // 32 * 32
    K = ist.samples
    Ks, Ksb = ist.seg_samples, ist.bend_sub

    marg = 1e-3
    bbmin = jnp.min(pd, axis=0) - marg
    bbmax = jnp.max(pd, axis=0) + marg
    all_tids = jnp.arange(n_tiles, dtype=jnp.int32)
    o, d_all = interactive._tile_rays(all_tids, ist, H, W, pose_j, intr)
    near_all, far_all = interactive._near_far(o, d_all, bbmin, bbmax,
                                              ist.min_near)
    hit = jnp.any(near_all < 1e30, axis=1)
    gate = interactive._tiles_with_candidates(
        ist, pd, o, d_all, near_all, far_all, hit, intr)
    print(f"tiles: {n_tiles} total, {int(jnp.sum(hit))} bbox-hit, "
          f"{int(jnp.sum(hit & gate))} with candidates, a_cap={a_cap}")

    def build(mask):
        rank = jnp.cumsum(mask) - 1
        take = mask & (rank < a_cap)
        act_ids = jnp.zeros((a_cap,), jnp.int32).at[
            jnp.where(take, rank, a_cap)].set(
            jnp.where(take, all_tids, 0), mode="drop")
        act_mask = jnp.arange(a_cap) < jnp.sum(take)
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
            pk, pd, origin, axis, tan_half, t0, t1,
            n_cand=bst.ips_per_tile, n_bins=K + 2,
            beam_margin=beam_bend.margin_of(bst), tighten_margin=tmarg)
        tile_sc = jnp.zeros((a_cap, 8), jnp.float32)
        tile_sc = tile_sc.at[:, 0].set(t0e).at[:, 1].set(t1e)
        tile_sc = tile_sc.at[:, 2].set(
            (act_mask & jnp.any(thit, axis=1)).astype(jnp.float32))
        dirs = jnp.zeros((a_cap, 8, tile_kernel.T2), jnp.float32)
        for i in range(3):
            dirs = dirs.at[:, i, :].set(d[i])
        return tile_sc, bin_start, dirs, cand

    par = jnp.zeros((24,), jnp.float32)
    par = par.at[0:3].set(o)
    par = par.at[3:6].set(bbmin).at[6:9].set(bbmax)
    par = par.at[9].set(1e-2).at[10].set(1.0).at[11].set(bst.ip_dx)
    par = par.at[12].set(ist.min_near)
    par = par.at[20].set(beam_bend.reach_of(bst))

    sc_u, bs_u, dirs_u, cand_u = build(hit)
    sc_g, bs_g, dirs_g, cand_g = build(hit & gate)
    sc_idle = sc_u.at[:, 2].set(0.0)

    arms = [
        ("default B1", spec, sc_u, bs_u, dirs_u, cand_u,
         dict(num_seek=3, Wn=64, deformed=True, block_tiles=1)),
        ("default B2", spec, sc_u, bs_u, dirs_u, cand_u,
         dict(num_seek=3, Wn=64, deformed=True, block_tiles=2)),
        ("default B4", spec, sc_u, bs_u, dirs_u, cand_u,
         dict(num_seek=3, Wn=64, deformed=True, block_tiles=4)),
        ("default B8", spec, sc_u, bs_u, dirs_u, cand_u,
         dict(num_seek=3, Wn=64, deformed=True, block_tiles=8)),
        ("gated B4", spec, sc_g, bs_g, dirs_g, cand_g,
         dict(num_seek=3, Wn=64, deformed=True, block_tiles=4)),
        ("gated B8", spec, sc_g, bs_g, dirs_g, cand_g,
         dict(num_seek=3, Wn=64, deformed=True, block_tiles=8)),
        ("seek=1 B4", spec, sc_u, bs_u, dirs_u, cand_u,
         dict(num_seek=1, Wn=64, deformed=True, block_tiles=4)),
        ("Wn=32 B4", spec, sc_u, bs_u, dirs_u, cand_u,
         dict(num_seek=3, Wn=32, deformed=True, block_tiles=4)),
        ("static B4 (no bend)", spec, sc_u, bs_u, dirs_u, cand_u,
         dict(num_seek=3, Wn=64, deformed=False, block_tiles=4)),
        ("idle B4 (grid floor)", spec, sc_idle, bs_u, dirs_u, cand_u,
         dict(num_seek=3, Wn=64, deformed=True, block_tiles=4)),
    ]

    for name, sp, sc, bs, dirs, cand, kw in arms:
        acc = [None]

        def run(k, sp=sp, sc=sc, bs=bs, dirs=dirs, cand=cand, kw=kw):
            p = par.at[19].set(0.25 + 1e-5 * (k % 17))
            out = tile_kernel.render_tiles(
                sp, pw, sc, bs, p, dirs, cand,
                K=K, Ks=Ks, Ksb=Ksb, num_seek=kw["num_seek"],
                Wn=kw["Wn"], deformed=kw["deformed"], cut=False,
                block_tiles=kw.get("block_tiles", 4))
            acc[0] = out if acc[0] is None else acc[0] + out
        ms = median_ms(run, lambda: float(jnp.sum(acc[0])))
        print(f"{name:28s} {ms:7.2f} ms")


if __name__ == "__main__":
    main()
