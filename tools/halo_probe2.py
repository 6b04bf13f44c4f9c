"""Chase the residual fused-vs-exact gap after the halo fix: is it the
beam capacity (ips_per_tile), the candidate reach, or the beam margin?
Renders the fused fidelity frame (f32, tighten off) at combinations and
reports PSNR vs the exact oracle + an error-location breakdown.

Usage: python tools/halo_probe2.py "ipt,reach,Wn,margin" ...
e.g.   python tools/halo_probe2.py 256,0,64,0.08 256,0.105,96,0.08
(reach 0 = auto 2*ip_dx; this knob replaced the static halo after the
per-tile dynamic halo landed)
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from pienerf_tpu.io import checkpoint as ckpt_io
from pienerf_tpu.models import network
from pienerf_tpu.ops import beam_bend
from pienerf_tpu.ops.pallas import field_kernel
from pienerf_tpu.render import interactive
from pienerf_tpu.sim import solver as sim

on_tpu = jax.devices()[0].platform != "cpu"
H = W = 800 if on_tpu else 64
K = 128

r0, dx = 0.45, 0.05 if on_tpu else 0.1
c = np.arange(-r0, r0 + 1e-6, dx)
xx, yy, zz = np.meshgrid(c, c, c, indexing="ij")
pts = np.stack([xx.ravel(), yy.ravel(), zz.ravel()], 1)
pts = pts[np.linalg.norm(pts, axis=1) <= r0]
n = pts.shape[0]
is_pin = pts[:, 2] < -0.3
consts, state, aux = sim.sim_init(
    pts, np.full(n, 0.1), np.full(n, 1e5), np.full(n, 1e5),
    is_pin, dt=1e-2, iters=10,
    bbox=np.array([2.0, 2.0, 2.0]), kres=7, dx=dx,
    gravity=(0.0, 0.0, 0.0), stiff=1e5, base=np.array([-1.0, -1.0, -1.0]))

tree, _ = ckpt_io.load_native("runs/quality_mlp_800/checkpoints/ngp_ep0015.npz")
params = tree.get("ema_params", tree.get("params", tree))
nf = (params["sigma_net"][0].shape[0] // 3 - 1) // 2
spec32 = network.make_spec(bound=1.0, backbone="mlp",
                           compute_dtype="float32", n_freqs=nf,
                           num_layers=len(params["sigma_net"]))
pw32 = field_kernel.pack_weights(params, spec32)

intr = (1.2 * H, 1.2 * H, W / 2, H / 2)
pose = np.eye(4, dtype=np.float32)
pose[:3, 3] = (0, 0, -2.5)
pose_j = jnp.asarray(pose)

force_vid = jnp.int32(int(np.argmax(np.asarray(consts.ip_pos)[:, 2])))


@jax.jit
def push(st):
    f = jnp.asarray([2e3, 0.0, 0.0], jnp.float32)
    st = sim.update_force(consts, st, force_vid, f)
    return sim.sim_step(consts, st)


for _ in range(5):
    state = push(state)
p_def, F, dF = sim.get_ip_info(consts, state)
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
    z = np.load(cache)
    img_e, ws_e = z["img"], z["ws"]
else:
    out = interactive.render_frame_exact(
        ist0, pw32, p_def, consts.ip_pos.astype(jnp.float32), F, dF,
        pose_j, intr, H, W, jnp.float32(1.0))
    img_e = interactive.tiles_to_image(np.asarray(out["tiles_image"]), H, W)
    ws_e = interactive.tiles_to_image(np.asarray(out["tiles_ws"]), H, W)
    np.savez(cache, img=img_e, ws=ws_e)

cells = sys.argv[1:] or ["256,0,64,0.08"]
for cell in cells:
    ipt, reach, wn, marg = cell.split(",")
    bst = bst0._replace(ips_per_tile=int(ipt), bend_reach=float(reach),
                        beam_margin=float(marg))
    ist = ist0._replace(bend=bst, bend_window=int(wn))
    out = interactive.render_frame_fused(
        ist, pw32, pack_fast, p_def, pose_j, intr, H, W, jnp.float32(1.0))
    img_f = interactive.tiles_to_image(np.asarray(out["tiles_image"]), H, W)
    drops = {k: int(out[k]) for k in
             ("dropped_beam", "dropped_window", "n_tile_overflow")}
    err = np.abs(img_f - img_e).max(-1)
    mse = float(np.mean((img_f - img_e) ** 2))
    psnr = round(10.0 * np.log10(1.0 / max(mse, 1e-12)), 2)
    # where is the error? interior (ws ~ 1) vs silhouette (0 < ws < 1)
    sil = (ws_e > 0.02) & (ws_e < 0.98)
    interior = ws_e >= 0.98
    print(json.dumps({
        "ipt": int(ipt), "reach": float(reach), "Wn": int(wn),
        "margin": float(marg), "psnr_vs_exact": psnr, "drops": drops,
        "err>0.05_frac": round(float((err > 0.05).mean()), 5),
        "err>0.05_on_silhouette_frac": round(
            float((err[sil] > 0.05).mean()) if sil.any() else 0.0, 5),
        "err>0.05_interior_frac": round(
            float((err[interior] > 0.05).mean()) if interior.any() else 0.0,
            5),
    }), flush=True)
