"""Decompose bench's fused-vs-uncapped fidelity axis on the trained field.

cap_probe.py showed the 32.8 dB gap is NOT ips_per_tile (256->512 leaves
PSNR bit-identical while beam drops fall 3x). This isolates the remaining
contributors by rendering the SAME deformed state four ways:

  x_unc : XLA tile path, exhaustive caps (the bench reference)
  x_cap : XLA tile path, bench caps (ipt=256, bin=8, active=0.5)
  f     : fused Pallas kernel, bench caps
  *_f32 : same three frames with compute_dtype=float32

PSNR(x_cap, x_unc)      = capacity cost inside one implementation
PSNR(f,     x_cap)      = implementation mismatch at matched caps
PSNR(x_unc_f32, x_unc)  = bf16 rounding floor of the whole axis
PSNR(f_f32, x_unc_f32)  = mismatch with rounding removed

All at K=128, tighten off, identical deformed state/pose.
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
spec = network.make_spec(bound=1.0, backbone="mlp", compute_dtype="bfloat16",
                         n_freqs=nf, num_layers=len(params["sigma_net"]))
pw = field_kernel.pack_weights(params, spec)

intr = (1.2 * H, 1.2 * H, W / 2, H / 2)
pose = np.eye(4, dtype=np.float32)
pose[:3, 3] = (0, 0, -2.5)
pose_j = jnp.asarray(pose)

# evolve a few frames so the state is deformed (same spring protocol)
force_vid = jnp.int32(int(np.argmax(np.asarray(consts.ip_pos)[:, 2])))
vid_kernel = consts.IP_kernel[force_vid]
vid_nx = consts.IP_Nx[force_vid]
vid_rest = consts.ip_pos[force_vid]
spring_k = jnp.float32(1e5)

bst = beam_bend.BeamBendSettings(num_seek_ip=3, max_iter_num=1,
                                 ip_dx=1.05 * dx, ips_per_tile=256,
                                 bin_capacity=8)
ist = interactive.InteractiveSettings(
    spec=spec, bend=bst, tile=16, samples=128, active_frac=0.5,
    tile_chunk=32, min_near=0.05, tighten_sampling=False)


@jax.jit
def frame(st, fi):
    p_ip = vid_rest + jnp.einsum("ia,iad->d", vid_nx, st.ddof[vid_kernel])
    ang = 0.25 * fi
    target = vid_rest + 0.25 * jnp.stack(
        [jnp.cos(ang), jnp.sin(ang), jnp.float32(0.0)])
    f = jnp.clip(spring_k * (target - p_ip), -5e5, 5e5)
    return pipeline.interactive_frame_step(
        ist, consts, st, pw, pose_j, intr, H, W, jnp.float32(1.0),
        force_vid, f)


for fi in range(5):
    state, out_f = frame(state, jnp.float32(fi))
img_f = interactive.tiles_to_image(np.asarray(out_f["tiles_image"]), H, W)

p_def, F, dF = sim.get_ip_info(consts, state)
pack48 = beam_bend.pack_ip_data(p_def, consts.ip_pos.astype(jnp.float32),
                                F, dF)
pack_fast = beam_bend.pack_ip_data_fast(
    p_def, consts.ip_pos.astype(jnp.float32), F, dF)

# XLA uncapped
bst_unc = bst._replace(ips_per_tile=int(np.ceil(n / 64) * 64),
                       bin_capacity=32)
out = interactive.render_frame(
    ist._replace(bend=bst_unc, active_frac=1.0), pw, pack48, p_def,
    pose_j, intr, H, W, jnp.float32(1.0))
assert all(int(out[k]) == 0 for k in
           ("dropped_beam", "dropped_window", "n_tile_overflow"))
img_x_unc = interactive.tiles_to_image(np.asarray(out["tiles_image"]), H, W)

# XLA at bench caps
out = interactive.render_frame(
    ist, pw, pack48, p_def, pose_j, intr, H, W, jnp.float32(1.0))
cap_drops = {k: int(out[k]) for k in
             ("dropped_beam", "dropped_window", "n_tile_overflow")}
img_x_cap = interactive.tiles_to_image(np.asarray(out["tiles_image"]), H, W)

# f32 variants: same three frames with rounding removed
spec32 = network.make_spec(bound=1.0, backbone="mlp",
                           compute_dtype="float32", n_freqs=nf,
                           num_layers=len(params["sigma_net"]))
pw32 = field_kernel.pack_weights(params, spec32)
ist32 = ist._replace(spec=spec32)

out = interactive.render_frame_fused(
    ist32, pw32, pack_fast, p_def, pose_j, intr, H, W, jnp.float32(1.0))
img_f32 = interactive.tiles_to_image(np.asarray(out["tiles_image"]), H, W)
out = interactive.render_frame(
    ist32._replace(bend=bst_unc, active_frac=1.0), pw32, pack48, p_def,
    pose_j, intr, H, W, jnp.float32(1.0))
img_x_unc32 = interactive.tiles_to_image(np.asarray(out["tiles_image"]),
                                         H, W)


# ground truth: exact brute-force 3-NN bending, f32, same lattice
out = interactive.render_frame_exact(
    ist32, pw32, p_def, consts.ip_pos.astype(jnp.float32), F, dF,
    pose_j, intr, H, W, jnp.float32(1.0))
img_exact = interactive.tiles_to_image(np.asarray(out["tiles_image"]), H, W)


def ps(a, b):
    mse = float(np.mean((a - b) ** 2))
    return round(10.0 * np.log10(1.0 / max(mse, 1e-12)), 2)


print(json.dumps({
    "fused_f32_vs_exact": ps(img_f32, img_exact),
    "xla_unc_f32_vs_exact": ps(img_x_unc32, img_exact),
}))
print(json.dumps({
    "fused_vs_xla_uncapped": ps(img_f, img_x_unc),
    "xla_capped_vs_xla_uncapped": ps(img_x_cap, img_x_unc),
    "fused_vs_xla_capped": ps(img_f, img_x_cap),
    "xla_unc_f32_vs_xla_unc_bf16": ps(img_x_unc32, img_x_unc),
    "fused_f32_vs_xla_unc_f32": ps(img_f32, img_x_unc32),
    "fused_f32_vs_fused_bf16": ps(img_f32, img_f),
    "xla_capped_drops": cap_drops,
}))
