"""Measure the tightened-sampling tradeoff on the bench scene: quality of
K=64 (tight vs untight) against a dense K=256 reference, plus FPS."""
import time
import numpy as np
import jax, jax.numpy as jnp

from pienerf_tpu.models import network
from pienerf_tpu.ops import beam_bend
from pienerf_tpu.ops.pallas import field_kernel
from pienerf_tpu.render import interactive, pipeline
from pienerf_tpu.sim import solver as sim
from pienerf_tpu.train.metrics import psnr

H = W = 800
r0, dx = 0.45, 0.05
c = np.arange(-r0, r0 + 1e-6, dx)
xx, yy, zz = np.meshgrid(c, c, c, indexing="ij")
pts = np.stack([xx.ravel(), yy.ravel(), zz.ravel()], 1)
pts = pts[np.linalg.norm(pts, axis=1) <= r0]
n = pts.shape[0]
consts, state, aux = sim.sim_init(
    pts, np.full(n, 0.1), np.full(n, 1e5), np.full(n, 1e5),
    pts[:, 2] < -0.3, dt=1e-2, iters=10,
    bbox=np.array([2.0, 2.0, 2.0]), kres=7, dx=dx,
    gravity=(0., 0., 0.), stiff=1e5, base=np.array([-1., -1., -1.]))

spec = network.make_spec(bound=1.0, backbone="mlp", compute_dtype="bfloat16")
params = network.init_params(jax.random.PRNGKey(0), spec)
pw = field_kernel.pack_weights(params, spec)
intr = (1.2 * H, 1.2 * H, W / 2, H / 2)
pose = np.eye(4, dtype=np.float32)
pose[:3, 3] = (0, 0, -2.5)
pose_j = jnp.asarray(pose)
vid = jnp.int32(int(np.argmax(np.asarray(consts.ip_pos)[:, 2])))
vk, vn, vr = consts.IP_kernel[vid], consts.IP_Nx[vid], consts.ip_pos[vid]

# deform the scene first (20 frames of spring drag)
bst = beam_bend.BeamBendSettings(num_seek_ip=3, max_iter_num=1,
                                 ip_dx=1.05 * dx, ips_per_tile=256,
                                 bin_capacity=8)
ist0 = interactive.InteractiveSettings(
    spec=spec, bend=bst, tile=16, samples=64, active_frac=0.5,
    tile_chunk=32, min_near=0.05)


@jax.jit
def frame(st, fi):
    p_ip = vr + jnp.einsum("ia,iad->d", vn, st.ddof[vk])
    ang = 0.25 * fi
    tgt = vr + 0.25 * jnp.stack([jnp.cos(ang), jnp.sin(ang),
                                 jnp.float32(0.0)])
    f = jnp.clip(1e5 * (tgt - p_ip), -5e5, 5e5)
    return pipeline.interactive_frame_step(
        ist0, consts, st, pw, pose_j, intr, H, W, jnp.float32(1.0), vid, f)


for i in range(20):
    state, _ = frame(state, jnp.float32(i))
p_def, F, dF = sim.get_ip_info(consts, state)
pack = beam_bend.pack_ip_data_fast(p_def, consts.ip_pos.astype(jnp.float32),
                                   F, dF)


def render(ist):
    out = interactive.render_frame_fused(
        ist, pw, pack, p_def, pose_j, intr, H, W, jnp.float32(1.0))
    return interactive.tiles_to_image(np.asarray(out["tiles_image"]), H, W)


img_ref = render(ist0._replace(samples=256))
img_u = render(ist0)
img_t = render(ist0._replace(tighten_sampling=True))
print(f"K=64 untight vs K=256: {psnr(img_u, img_ref):.2f} dB")
print(f"K=64 TIGHT   vs K=256: {psnr(img_t, img_ref):.2f} dB")
img_tr = render(ist0._replace(samples=256, tighten_sampling=True))
print(f"K=256 tight vs K=256 untight: {psnr(img_tr, img_ref):.2f} dB")


def fps_of(ist):
    @jax.jit
    def fr(st, fi):
        p_ip = vr + jnp.einsum("ia,iad->d", vn, st.ddof[vk])
        ang = 0.25 * fi
        tgt = vr + 0.25 * jnp.stack([jnp.cos(ang), jnp.sin(ang),
                                     jnp.float32(0.0)])
        f = jnp.clip(1e5 * (tgt - p_ip), -5e5, 5e5)
        return pipeline.interactive_frame_step(
            ist, consts, st, pw, pose_j, intr, H, W, jnp.float32(1.0),
            vid, f)
    st, out = fr(state, jnp.float32(0))
    _ = float(jnp.sum(out["tiles_image"]))
    reps = []
    fi = 1
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(15):
            st, out = fr(st, jnp.float32(fi)); fi += 1
        _ = float(jnp.sum(out["tiles_image"]))
        reps.append(15 / (time.perf_counter() - t0))
    return float(np.median(reps))


print(f"FPS untight K=64: {fps_of(ist0):.1f}")
print(f"FPS tight   K=64: {fps_of(ist0._replace(tighten_sampling=True)):.1f}")
print(f"FPS tight   K=32: "
      f"{fps_of(ist0._replace(samples=32, tighten_sampling=True)):.1f}")

# K sweep: find the >=30 dB @ >=30 FPS operating point (vs K=256 ref)
for K in (96, 128):
    ist_k = ist0._replace(samples=K, tighten_sampling=True)
    img_k = render(ist_k)
    print(f"K={K} tight vs K=256: {psnr(img_k, img_ref):.2f} dB, "
          f"FPS {fps_of(ist_k):.1f}", flush=True)
