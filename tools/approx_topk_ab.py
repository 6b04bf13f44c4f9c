"""A/B the approx_max_k candidate prep (prep_approx_topk) against exact
top_k: coupled-frame FPS and fidelity vs the cached exact-bending oracle
(the bench's own protocol/state, so the oracle npz is reusable)."""

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
from pienerf_tpu.render import interactive, pipeline
from pienerf_tpu.sim import solver as sim


def main():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r0, dx = 0.45, 0.05
    c = np.arange(-r0, r0 + 1e-6, dx)
    xx, yy, zz = np.meshgrid(c, c, c, indexing="ij")
    pts = np.stack([xx.ravel(), yy.ravel(), zz.ravel()], 1)
    pts = pts[np.linalg.norm(pts, axis=1) <= r0]
    n = pts.shape[0]
    is_pin = pts[:, 2] < -0.3
    consts, state0, _ = sim.sim_init(
        pts, np.full(n, 0.1), np.full(n, 1e5), np.full(n, 1e5), is_pin,
        dt=1e-2, iters=10, bbox=np.array([2.0, 2.0, 2.0]), kres=7, dx=dx,
        gravity=(0.0, 0.0, 0.0), stiff=1e5,
        base=np.array([-1.0, -1.0, -1.0]))

    tree, _ = ckpt_io.load_native(os.path.join(
        root, "runs/quality_mlp_800/checkpoints/ngp_ep0015.npz"))
    params = tree.get("ema_params", tree.get("params", tree))
    nf = (params["sigma_net"][0].shape[0] // 3 - 1) // 2
    spec = network.make_spec(bound=1.0, backbone="mlp",
                             compute_dtype="bfloat16", n_freqs=nf,
                             num_layers=len(params["sigma_net"]))
    pw = field_kernel.pack_weights(params, spec)
    spec32 = spec._replace(compute_dtype="float32")
    pw32 = field_kernel.pack_weights(params, spec32)

    bst = beam_bend.BeamBendSettings(num_seek_ip=3, max_iter_num=1,
                                     ip_dx=1.05 * dx, ips_per_tile=256,
                                     bin_capacity=8)
    H = W = 800
    intr = (1.2 * H, 1.2 * H, W / 2, H / 2)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = (0, 0, -2.5)
    pose_j = jnp.asarray(pose)
    fvid = jnp.int32(int(np.argmax(pts[:, 2])))

    # bench's deterministic fidelity state: 5 fixed pushes from rest
    @jax.jit
    def push(st):
        st = sim.update_force(consts, st, fvid,
                              jnp.asarray([2e3, 0.0, 0.0], jnp.float32))
        return sim.sim_step(consts, st)
    st_fid = state0
    for _ in range(5):
        st_fid = push(st_fid)
    p_def, F, dF = jax.jit(sim.get_ip_info)(consts, st_fid)
    pack_fast = beam_bend.pack_ip_data_fast(
        p_def, consts.ip_pos.astype(jnp.float32), F, dF)

    oracle = np.load(os.path.join(
        root, f"runs/bench_oracle_{H}_K128_{n}ip.npz"))["img"].astype(
        np.float32)

    vid_kernel = consts.IP_kernel[fvid]
    vid_nx = consts.IP_Nx[fvid]
    vid_rest = consts.ip_pos[fvid]

    for approx in (False, True):
        ist = interactive.InteractiveSettings(
            spec=spec, bend=bst, tile=16, samples=128, active_frac=0.5,
            tile_chunk=32, min_near=0.05, tighten_sampling=True,
            prep_approx_topk=approx)

        # fidelity (f32, tighten off — the oracle marches the full span)
        ist_nt = ist._replace(tighten_sampling=False, spec=spec32)
        out_f = interactive.render_frame_fused(
            ist_nt, pw32, pack_fast, p_def, pose_j, intr, H, W,
            jnp.float32(1.0))
        img_f = interactive.tiles_to_image(
            np.asarray(out_f["tiles_image"]), H, W)
        mse = float(np.mean((oracle - img_f) ** 2))
        psnr = 10.0 * np.log10(1.0 / max(mse, 1e-12))

        # coupled FPS (bench protocol: spring drag, pipelined, median of 3)
        @jax.jit
        def frame(st, fi):
            p_ip = vid_rest + jnp.einsum("ia,iad->d", vid_nx,
                                         st.ddof[vid_kernel])
            ang = 0.25 * fi
            target = vid_rest + 0.25 * jnp.stack(
                [jnp.cos(ang), jnp.sin(ang), jnp.float32(0.0)])
            f = jnp.clip(1e5 * (target - p_ip), -5e5, 5e5)
            return pipeline.interactive_frame_step(
                ist, consts, st, pw, pose_j, intr, H, W, jnp.float32(1.0),
                fvid, f)
        st = state0
        st, out = frame(st, jnp.float32(0))
        _ = float(jnp.sum(out["tiles_image"]))
        reps = []
        fi = 1
        for _ in range(3):
            t0 = time.perf_counter()
            acc = None
            for _ in range(20):
                st, out = frame(st, jnp.float32(fi))
                fi += 1
                acc = out["tiles_image"] if acc is None \
                    else acc + out["tiles_image"]
            _ = float(jnp.sum(acc))
            reps.append(20 / (time.perf_counter() - t0))
        assert bool(jnp.isfinite(st.ddof).all())
        print(f"approx={approx}: fidelity vs exact {psnr:.2f} dB, "
              f"coupled FPS {float(np.median(reps)):.1f} "
              f"(reps {[round(r,1) for r in reps]})", flush=True)


if __name__ == "__main__":
    main()
