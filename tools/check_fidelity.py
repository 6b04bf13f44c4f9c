"""Sanity-check the bench fidelity comparison: are the fused and uncapped
XLA-path frames non-degenerate and how close are they really?"""
import numpy as np
import jax, jax.numpy as jnp

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

consts, state, aux = sim.sim_init(
    pts, np.full(n, 0.1), np.full(n, 1e5), np.full(n, 1e5),
    np.zeros(n, bool), dt=1e-2, iters=10,
    bbox=np.array([2.0, 2.0, 2.0]), kres=7, dx=dx,
    gravity=(0.0, 0.0, 0.0), stiff=1e5, base=np.array([-1.0, -1.0, -1.0]))

spec = network.make_spec(bound=1.0, backbone="mlp", compute_dtype="bfloat16")
params = network.init_params(jax.random.PRNGKey(0), spec)
pw = field_kernel.pack_weights(params, spec)

bst = beam_bend.BeamBendSettings(num_seek_ip=3, max_iter_num=1,
                                 ip_dx=1.05 * dx, ips_per_tile=256,
                                 bin_capacity=8)
ist = interactive.InteractiveSettings(spec=spec, bend=bst, tile=16,
                                      samples=64, active_frac=0.5,
                                      tile_chunk=32, min_near=0.05)
intr = (1.2 * H, 1.2 * H, W / 2, H / 2)
pose = np.eye(4, dtype=np.float32)
pose[:3, 3] = (0, 0, -2.5)
pose_j = jnp.asarray(pose)

force_vid = jnp.int32(n // 2)
force = jnp.asarray([2e3, 0.0, 0.0], jnp.float32)

import sys
n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 10
for _ in range(n_frames):
    state, out_f = pipeline.interactive_frame_step(
        ist, consts, state, pw, pose_j, intr, H, W, jnp.float32(1.0),
        force_vid, force)

p_def, F, dF = sim.get_ip_info(consts, state)
print("ddof norm", float(jnp.linalg.norm(state.ddof)),
      "p_def range", np.asarray(jnp.min(p_def, 0)), np.asarray(jnp.max(p_def, 0)))
pack48 = beam_bend.pack_ip_data(p_def, consts.ip_pos.astype(jnp.float32), F, dF)
bst_x = bst._replace(ips_per_tile=min(1024, int(np.ceil(n / 64) * 64)),
                     bin_capacity=32)
ist_x = ist._replace(bend=bst_x, active_frac=1.0)
out_x = interactive.render_frame(ist_x, pw, pack48, p_def, pose_j, intr,
                                 H, W, jnp.float32(1.0))

img_f = interactive.tiles_to_image(np.asarray(out_f["tiles_image"]), H, W)
img_x = interactive.tiles_to_image(np.asarray(out_x["tiles_image"]), H, W)
for name, im in (("fused", img_f), ("xla", img_x)):
    print(name, "min", im.min(), "max", im.max(), "mean", im.mean(),
          "frac!=bg", float(np.mean(np.any(im != 1.0, -1))))
d = np.abs(img_f - img_x)
print("maxdiff", d.max(), "mse", float(np.mean(d ** 2)))
print("n_active fused", int(out_f["n_active"]), "xla", int(out_x["n_active"]))
