import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from pienerf_tpu.models import network
from pienerf_tpu.ops import beam_bend
from pienerf_tpu.ops.pallas import field_kernel
from pienerf_tpu.render import interactive
from pienerf_tpu.sim import solver as sim

r0, dx = 0.45, 0.15
c = np.arange(-r0, r0+1e-6, dx)
xx, yy, zz = np.meshgrid(c, c, c, indexing="ij")
pts = np.stack([xx.ravel(), yy.ravel(), zz.ravel()], 1)
pts = pts[np.linalg.norm(pts, axis=1) <= r0]
n = pts.shape[0]
consts, state, aux = sim.sim_init(
    pts, np.full(n, 0.1), np.full(n, 1e5), np.full(n, 1e5),
    np.zeros(n, bool), dt=1e-2, iters=5,
    bbox=np.array([2.0,2.0,2.0]), kres=4, dx=dx,
    gravity=(0.,0.,0.), stiff=1e5, base=np.array([-1.,-1.,-1.]))
state = sim.sim_step(consts, state)
p_def, F, dF = sim.get_ip_info(consts, state)

spec = network.make_spec(bound=1.0, backbone="mlp", compute_dtype="float32")
params = network.init_params(jax.random.PRNGKey(0), spec)
pw = field_kernel.pack_weights(params, spec)
bst = beam_bend.BeamBendSettings(num_seek_ip=3, max_iter_num=1, ip_dx=1.05*dx)
ist = interactive.InteractiveSettings(spec=spec, bend=bst, tile=16, samples=32,
                                      active_frac=0.75, tile_chunk=4, min_near=0.05)
H = W = 64
intr = (1.2*H, 1.2*H, W/2, H/2)
pose = np.eye(4, dtype=np.float32); pose[:3,3] = (0,0,-2.5)
pose_j = jnp.asarray(pose)
pack = beam_bend.pack_for(bst, p_def, consts.ip_pos.astype(jnp.float32), F, dF)

out_old = interactive.render_frame(ist, pw, pack, p_def, pose_j, intr, H, W, jnp.float32(1.0))
out_new = interactive.render_frame_fused(ist, pw, pack, p_def, pose_j, intr, H, W, jnp.float32(1.0))

img_o = interactive.tiles_to_image(out_old["tiles_image"], H, W, 16)
img_n = interactive.tiles_to_image(out_new["tiles_image"], H, W, 16)
ws_o = interactive.tiles_to_image(np.asarray(out_old["tiles_ws"])[...,None], H, W, 16)
ws_n = interactive.tiles_to_image(np.asarray(out_new["tiles_ws"])[...,None], H, W, 16)
print("n_active old/new:", int(out_old["n_active"]), int(out_new["n_active"]))
print("drops: beam", int(out_new["dropped_beam"]), "window", int(out_new["dropped_window"]),
      "tile_ovf", int(out_new["n_tile_overflow"]))
print("ws sums:", float(np.sum(ws_o)), float(np.sum(ws_n)))
diff = np.abs(img_o - img_n)
print("img maxdiff:", float(diff.max()), "meandiff:", float(diff.mean()))
