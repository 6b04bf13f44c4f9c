import time
import numpy as np
import jax, jax.numpy as jnp
from pienerf_tpu.models import network
from pienerf_tpu.ops import beam_bend
from pienerf_tpu.ops.pallas import field_kernel
from pienerf_tpu.render import interactive
from pienerf_tpu.sim import solver as sim

r0, dx = 0.45, 0.05
c = np.arange(-r0, r0+1e-6, dx)
xx, yy, zz = np.meshgrid(c, c, c, indexing="ij")
pts = np.stack([xx.ravel(), yy.ravel(), zz.ravel()], 1)
pts = pts[np.linalg.norm(pts, axis=1) <= r0]
n = pts.shape[0]
consts, state, aux = sim.sim_init(
    pts, np.full(n, 0.1), np.full(n, 1e5), np.full(n, 1e5),
    np.zeros(n, bool), dt=1e-2, iters=10,
    bbox=np.array([2.0,2.0,2.0]), kres=7, dx=dx,
    gravity=(0.,0.,0.), stiff=1e5, base=np.array([-1.,-1.,-1.]))

spec = network.make_spec(bound=1.0, backbone="mlp", compute_dtype="bfloat16")
params = network.init_params(jax.random.PRNGKey(0), spec)
pw = field_kernel.pack_weights(params, spec)
bst = beam_bend.BeamBendSettings(num_seek_ip=3, max_iter_num=1, ip_dx=1.05*dx)
ist = interactive.InteractiveSettings(spec=spec, bend=bst, tile=16, samples=64,
                                      active_frac=0.5, tile_chunk=32, min_near=0.05)
H = W = 800
intr = (1.2*H, 1.2*H, W/2, H/2)
pose = np.eye(4, dtype=np.float32); pose[:3,3] = (0,0,-2.5)
pose_j = jnp.asarray(pose)

state = sim.sim_step(consts, state)
p_def, F, dF = jax.jit(sim.get_ip_info)(consts, state)
pack = beam_bend.pack_for(bst, p_def, consts.ip_pos.astype(jnp.float32), F, dF)

def frame(st):
    st = sim.sim_step(consts, st)
    p_def, F, dF = sim.get_ip_info(consts, st)
    pk = beam_bend.pack_for(bst, p_def, consts.ip_pos.astype(jnp.float32), F, dF)
    out = interactive.render_frame_fused(ist, pw, pk, p_def, pose_j, intr,
                                         H, W, jnp.float32(1.0))
    return st, out

state, out = frame(state)
_ = float(jnp.sum(out["tiles_image"]))
print("n_active:", int(out["n_active"]), "tile_ovf:", int(out["n_tile_overflow"]),
      "drop_beam:", int(out["dropped_beam"]), "drop_win:", int(out["dropped_window"]))

for rep in range(3):
    t0 = time.perf_counter()
    NF = 20
    acc = None
    for _ in range(NF):
        state, out = frame(state)
        acc = out["tiles_image"] if acc is None else acc + out["tiles_image"]
    _ = float(jnp.sum(acc))
    dt_ = time.perf_counter() - t0
    print(f"coupled fused: {NF/dt_:.2f} FPS ({dt_/NF*1e3:.1f} ms/frame)")

# render-only (fixed sim state)
def render_only(x):
    out = interactive.render_frame_fused(ist, pw, pack, p_def + x*1e-20, pose_j,
                                         intr, H, W, jnp.float32(1.0))
    return x + 1e-12*jnp.sum(out["tiles_image"])
x = jnp.float32(0.0)
x = render_only(x); _ = float(x)
for rep in range(3):
    t0 = time.perf_counter()
    for _ in range(10):
        x = render_only(x)
    _ = float(x)
    print(f"render-only: {(time.perf_counter()-t0)/10*1e3:.1f} ms/frame")

# single-jit coupled step
from pienerf_tpu.render import pipeline
ist2 = ist._replace(bend=bst._replace(ips_per_tile=256))
def cstep(st):
    return pipeline.interactive_frame_step(
        ist2, consts, st, pw, pose_j, intr, H, W, jnp.float32(1.0),
        jnp.int32(-1), jnp.zeros(3))
state, out = cstep(state)
_ = float(jnp.sum(out["tiles_image"]))
print("single-jit coupled: drops beam", int(out["dropped_beam"]), "win", int(out["dropped_window"]))
for rep in range(3):
    t0 = time.perf_counter()
    NF = 20
    acc = None
    for _ in range(NF):
        state, out = cstep(state)
        acc = out["tiles_image"] if acc is None else acc + out["tiles_image"]
    _ = float(jnp.sum(acc))
    dt_ = time.perf_counter() - t0
    print(f"single-jit coupled: {NF/dt_:.2f} FPS ({dt_/NF*1e3:.1f} ms/frame)")
