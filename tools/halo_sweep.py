"""Measure the halo fix: fused-kernel fidelity vs the exact oracle and
FPS across (bend_reach, bend_window) at the K=128 default operating point,
trained field, bench deformation protocol. reach 0 = auto (2*ip_dx).

Usage: python tools/halo_sweep.py [K] [reach1,reach2,...] [Wn1,Wn2,...]
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
K = int(sys.argv[1]) if len(sys.argv) > 1 else 128
reaches = [float(x) for x in (sys.argv[2].split(",") if len(sys.argv) > 2
                             else ["0"])]
wns = [int(x) for x in (sys.argv[3].split(",") if len(sys.argv) > 3
                        else ["32", "64"])]

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
spec32 = spec._replace(compute_dtype="float32")
pw = field_kernel.pack_weights(params, spec)
pw32 = field_kernel.pack_weights(params, spec32)

intr = (1.2 * H, 1.2 * H, W / 2, H / 2)
pose = np.eye(4, dtype=np.float32)
pose[:3, 3] = (0, 0, -2.5)
pose_j = jnp.asarray(pose)

force_vid = jnp.int32(int(np.argmax(np.asarray(consts.ip_pos)[:, 2])))
vid_kernel = consts.IP_kernel[force_vid]
vid_nx = consts.IP_Nx[force_vid]
vid_rest = consts.ip_pos[force_vid]
spring_k = jnp.float32(1e5)
n_frames = 20 if on_tpu else 2


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
            settings, consts, st, pw, pose_j, intr, H, W, jnp.float32(1.0),
            force_vid, f)
    return frame


def ps(a, b):
    mse = float(np.mean((a - b) ** 2))
    return round(10.0 * np.log10(1.0 / max(mse, 1e-12)), 2)


# fixed deformed state for the fidelity comparison (5 bench-protocol steps)
@jax.jit
def push(st):
    f = jnp.asarray([2e3, 0.0, 0.0], jnp.float32)
    st = sim.update_force(consts, st, force_vid, f)
    return sim.sim_step(consts, st)


stf = state0
for _ in range(5):
    stf = push(stf)
p_def, F, dF = sim.get_ip_info(consts, stf)
pack_fast = beam_bend.pack_ip_data_fast(
    p_def, consts.ip_pos.astype(jnp.float32), F, dF)

bst0 = beam_bend.BeamBendSettings(num_seek_ip=3, max_iter_num=1,
                                  ip_dx=1.05 * dx, ips_per_tile=256,
                                  bin_capacity=8)
ist0 = interactive.InteractiveSettings(
    spec=spec32, bend=bst0, tile=16, samples=K, active_frac=0.5,
    tile_chunk=32, min_near=0.05, tighten_sampling=False)
cache = f"/tmp/halo_probe2_exact_{H}_{K}_{n}.npz"
if os.path.exists(cache):
    img_e = np.load(cache)["img"]
else:
    out = interactive.render_frame_exact(
        ist0, pw32, p_def, consts.ip_pos.astype(jnp.float32), F, dF,
        pose_j, intr, H, W, jnp.float32(1.0))
    img_e = interactive.tiles_to_image(np.asarray(out["tiles_image"]), H, W)
    ws_e = interactive.tiles_to_image(np.asarray(out["tiles_ws"]), H, W)
    np.savez(cache, img=img_e, ws=ws_e)

for reach in reaches:
    for wn in wns:
        bst = bst0._replace(bend_reach=reach)
        ist = interactive.InteractiveSettings(
            spec=spec, bend=bst, tile=16, samples=K, active_frac=0.5,
            tile_chunk=32, min_near=0.05, tighten_sampling=True,
            bend_window=wn)
        # fidelity at the fixed state, tighten off, f32
        ist_f = ist._replace(spec=spec32, tighten_sampling=False)
        out = interactive.render_frame_fused(
            ist_f, pw32, pack_fast, p_def, pose_j, intr, H, W,
            jnp.float32(1.0))
        img_f = interactive.tiles_to_image(
            np.asarray(out["tiles_image"]), H, W)
        drops = {k: int(out[k]) for k in
                 ("dropped_beam", "dropped_window", "n_tile_overflow")}

        # FPS at the default operating point (bf16, tighten on)
        frame = make_frame(ist)
        state = state0
        state, o0 = frame(state, jnp.float32(0))
        _ = float(jnp.sum(o0["tiles_image"]))
        reps = []
        fi = 1
        for _ in range(3 if on_tpu else 1):
            t0 = time.perf_counter()
            acc = None
            for _ in range(n_frames):
                state, o0 = frame(state, jnp.float32(fi))
                fi += 1
                acc = (o0["tiles_image"] if acc is None
                       else acc + o0["tiles_image"])
            _ = float(jnp.sum(acc))
            reps.append(n_frames / (time.perf_counter() - t0))
        fps = float(np.median(reps))
        print(json.dumps({"K": K, "reach": reach, "Wn": wn,
                          "psnr_vs_exact": ps(img_f, img_e),
                          "fps": round(fps, 1), "drops": drops}),
              flush=True)
