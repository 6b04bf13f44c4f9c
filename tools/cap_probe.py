"""Price the fused kernel's capacity caps on the TRAINED field.

bench.py's fidelity axis dropped 40.2 -> ~33 dB when the bench switched
from a random-weight field to the 30k-iter trained checkpoint: the sharp
trained surface concentrates candidates, so ips_per_tile=256 drops ~940
beams on frame 0. This sweeps (ips_per_tile, bin_capacity) at the default
operating point (K=128 + tighten for FPS; tighten-off for the fidelity
frame so sampling matches the uncapped XLA reference) and reports
FPS + PSNR-vs-uncapped + drop counters per cell, so the default cap is
chosen by measurement.

Usage: python tools/cap_probe.py [ipt1,ipt2,...] [bincap1,bincap2,...]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from pienerf_tpu.io import checkpoint as ckpt_io
from pienerf_tpu.models import network
from pienerf_tpu.ops import beam_bend
from pienerf_tpu.ops.pallas import field_kernel
from pienerf_tpu.render import interactive, pipeline
from pienerf_tpu.sim import solver as sim

on_tpu = jax.devices()[0].platform != "cpu"
H = W = 800 if on_tpu else 64
n_frames = 20 if on_tpu else 2

r0, dx = 0.45, 0.05 if on_tpu else 0.1
c = np.arange(-r0, r0 + 1e-6, dx)
xx, yy, zz = np.meshgrid(c, c, c, indexing="ij")
pts = np.stack([xx.ravel(), yy.ravel(), zz.ravel()], 1)
pts = pts[np.linalg.norm(pts, axis=1) <= r0]
n = pts.shape[0]
is_pin = pts[:, 2] < -0.3
consts, state0, aux = sim.sim_init(
    pts, np.full(n, 0.1), np.full(n, 1e5), np.full(n, 1e5),
    is_pin, dt=1e-2, iters=10,
    bbox=np.array([2.0, 2.0, 2.0]), kres=7, dx=dx,
    gravity=(0.0, 0.0, 0.0), stiff=1e5, base=np.array([-1.0, -1.0, -1.0]))

tree, _ = ckpt_io.load_native("runs/quality_mlp_800/checkpoints/ngp_ep0015.npz")
params = tree.get("ema_params", tree.get("params", tree))
nf = (params["sigma_net"][0].shape[0] // 3 - 1) // 2
spec = network.make_spec(bound=1.0, backbone="mlp", compute_dtype="bfloat16",
                         n_freqs=nf, num_layers=len(params["sigma_net"]))
pw = field_kernel.pack_weights(params, spec)

intr = (1.2 * H, 1.2 * H, W / 2, H / 2)
pose = np.eye(4, dtype=np.float32)
pose[:3, 3] = (0, 0, -2.5)
pose_j = jnp.asarray(pose)

force_vid = jnp.int32(int(np.argmax(np.asarray(consts.ip_pos)[:, 2])))
vid_kernel = consts.IP_kernel[force_vid]
vid_nx = consts.IP_Nx[force_vid]
vid_rest = consts.ip_pos[force_vid]
spring_k = jnp.float32(1e5)

ipts = [int(x) for x in (sys.argv[1].split(",") if len(sys.argv) > 1
                         else ["256", "384", "512"])]
bincaps = [int(x) for x in (sys.argv[2].split(",") if len(sys.argv) > 2
                            else ["8"])]

rows = []
for ipt in ipts:
    for bcap in bincaps:
        bst = beam_bend.BeamBendSettings(
            num_seek_ip=3, max_iter_num=1, ip_dx=1.05 * dx,
            ips_per_tile=ipt, bin_capacity=bcap)
        ist = interactive.InteractiveSettings(
            spec=spec, bend=bst, tile=16, samples=128, active_frac=0.5,
            tile_chunk=32, min_near=0.05, tighten_sampling=True)

        def make_frame(settings):
            @jax.jit
            def frame(st, fi):
                p_ip = vid_rest + jnp.einsum("ia,iad->d", vid_nx,
                                             st.ddof[vid_kernel])
                ang = 0.25 * fi
                target = vid_rest + 0.25 * jnp.stack(
                    [jnp.cos(ang), jnp.sin(ang), jnp.float32(0.0)])
                f = jnp.clip(spring_k * (target - p_ip), -5e5, 5e5)
                return pipeline.interactive_frame_step(
                    settings, consts, st, pw, pose_j, intr, H, W,
                    jnp.float32(1.0), force_vid, f)
            return frame

        frame = make_frame(ist)
        state = state0
        state, out = frame(state, jnp.float32(0))
        _ = float(jnp.sum(out["tiles_image"]))
        drops = {k: int(out[k]) for k in
                 ("dropped_beam", "dropped_window", "n_tile_overflow")}

        fps_reps = []
        fi = 1
        for _ in range(3 if on_tpu else 1):
            t0 = time.perf_counter()
            acc = None
            for _ in range(n_frames):
                state, out = frame(state, jnp.float32(fi))
                fi += 1
                acc = (out["tiles_image"] if acc is None
                       else acc + out["tiles_image"])
            _ = float(jnp.sum(acc))
            fps_reps.append(n_frames / (time.perf_counter() - t0))
        fps = float(np.median(fps_reps))

        # fidelity at matched sampling (tighten off on both sides)
        frame_nt = make_frame(ist._replace(tighten_sampling=False))
        state, out_f = frame_nt(state, jnp.float32(fi))
        p_def, F, dF = sim.get_ip_info(consts, state)
        pack48 = beam_bend.pack_ip_data(
            p_def, consts.ip_pos.astype(jnp.float32), F, dF)
        bst_x = bst._replace(ips_per_tile=int(np.ceil(n / 64) * 64),
                             bin_capacity=32)
        ist_x = ist._replace(bend=bst_x, active_frac=1.0,
                             tighten_sampling=False)
        out_x = interactive.render_frame(
            ist_x, pw, pack48, p_def, pose_j, intr, H, W, jnp.float32(1.0))
        assert all(int(out_x[k]) == 0 for k in
                   ("dropped_beam", "dropped_window", "n_tile_overflow"))
        img_x = interactive.tiles_to_image(np.asarray(out_x["tiles_image"]), H, W)
        img_f = interactive.tiles_to_image(np.asarray(out_f["tiles_image"]), H, W)
        mse = float(np.mean((img_x - img_f) ** 2))
        psnr = float(10.0 * np.log10(1.0 / max(mse, 1e-12)))
        row = {"ips_per_tile": ipt, "bin_capacity": bcap,
               "fps": round(fps, 1), "psnr_vs_uncapped": round(psnr, 2),
               "drops_frame0": drops}
        rows.append(row)
        print(json.dumps(row), flush=True)

print(json.dumps({"all": rows}))
