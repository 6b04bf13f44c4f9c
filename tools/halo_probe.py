"""Test the bin-halo hypothesis: fidelity vs the exact oracle should
improve as bins get WIDER (smaller K), because each sample's candidate
window spans a fixed number of bins while the IP influence radius ip_dx
is fixed in world units. If PSNR-vs-exact rises sharply from K=128 to
K=32, the halo (not capacity, not precision) is the fidelity bottleneck.

K sweep, fused + XLA paths vs the exact brute-force oracle, trained
field, identical deformed state.
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
spec = network.make_spec(bound=1.0, backbone="mlp", compute_dtype="float32",
                         n_freqs=nf, num_layers=len(params["sigma_net"]))
pw = field_kernel.pack_weights(params, spec)

intr = (1.2 * H, 1.2 * H, W / 2, H / 2)
pose = np.eye(4, dtype=np.float32)
pose[:3, 3] = (0, 0, -2.5)
pose_j = jnp.asarray(pose)

force_vid = jnp.int32(int(np.argmax(np.asarray(consts.ip_pos)[:, 2])))

bst = beam_bend.BeamBendSettings(num_seek_ip=3, max_iter_num=1,
                                 ip_dx=1.05 * dx, ips_per_tile=256,
                                 bin_capacity=8)


@jax.jit
def step(st):
    f = jnp.asarray([2e3, 0.0, 0.0], jnp.float32)
    st = sim.update_force(consts, st, force_vid, f)
    return sim.sim_step(consts, st)


for _ in range(5):
    state = step(state)
p_def, F, dF = sim.get_ip_info(consts, state)
pack48 = beam_bend.pack_ip_data(p_def, consts.ip_pos.astype(jnp.float32),
                                F, dF)
pack_fast = beam_bend.pack_ip_data_fast(
    p_def, consts.ip_pos.astype(jnp.float32), F, dF)


def ps(a, b):
    mse = float(np.mean((a - b) ** 2))
    return round(10.0 * np.log10(1.0 / max(mse, 1e-12)), 2)


for K in (32, 64, 128):
    ist = interactive.InteractiveSettings(
        spec=spec, bend=bst, tile=16, samples=K, active_frac=0.5,
        tile_chunk=32, min_near=0.05, tighten_sampling=False)
    out = interactive.render_frame_fused(
        ist, pw, pack_fast, p_def, pose_j, intr, H, W, jnp.float32(1.0))
    img_f = interactive.tiles_to_image(np.asarray(out["tiles_image"]), H, W)
    bst_unc = bst._replace(ips_per_tile=int(np.ceil(n / 64) * 64),
                           bin_capacity=32)
    out = interactive.render_frame(
        ist._replace(bend=bst_unc, active_frac=1.0), pw, pack48, p_def,
        pose_j, intr, H, W, jnp.float32(1.0))
    img_x = interactive.tiles_to_image(np.asarray(out["tiles_image"]), H, W)
    out = interactive.render_frame_exact(
        ist, pw, p_def, consts.ip_pos.astype(jnp.float32), F, dF,
        pose_j, intr, H, W, jnp.float32(1.0))
    img_e = interactive.tiles_to_image(np.asarray(out["tiles_image"]), H, W)
    print(json.dumps({"K": K, "fused_vs_exact": ps(img_f, img_e),
                      "xla_unc_vs_exact": ps(img_x, img_e),
                      "fused_vs_xla": ps(img_f, img_x)}), flush=True)
