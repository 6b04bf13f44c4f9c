"""A/B the fused kernel's segment depth (Ks) / bend sub-window (Ksb) on the
bench scene: early-termination granularity vs per-segment overhead."""
import os
import sys
import time
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pienerf_tpu.models import network
from pienerf_tpu.ops import beam_bend
from pienerf_tpu.ops.pallas import field_kernel
from pienerf_tpu.render import interactive, pipeline
from pienerf_tpu.sim import solver as sim

H = W = 800
r0, dx = 0.45, 0.05
c = np.arange(-r0, r0 + 1e-6, dx)
xx, yy, zz = np.meshgrid(c, c, c, indexing="ij")
pts = np.stack([xx.ravel(), yy.ravel(), zz.ravel()], 1)
pts = pts[np.linalg.norm(pts, axis=1) <= r0]
n = pts.shape[0]
consts, state0, aux = sim.sim_init(
    pts, np.full(n, 0.1), np.full(n, 1e5), np.full(n, 1e5),
    pts[:, 2] < -0.3, dt=1e-2, iters=10,
    bbox=np.array([2.0, 2.0, 2.0]), kres=7, dx=dx,
    gravity=(0., 0., 0.), stiff=1e5, base=np.array([-1., -1., -1.]))

import os
_ckpt = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "runs/quality_mlp_800/checkpoints/ngp_ep0015.npz")
if os.path.exists(_ckpt):
    # trained field: realistic early termination (PERF.md k-frontier)
    from pienerf_tpu.io import checkpoint as ckpt_io
    _tree, _ = ckpt_io.load_native(_ckpt)
    params = _tree.get("ema_params", _tree.get("params", _tree))
    _nf = (params["sigma_net"][0].shape[0] // 3 - 1) // 2
    spec = network.make_spec(bound=1.0, backbone="mlp",
                             compute_dtype="bfloat16", n_freqs=_nf,
                             num_layers=len(params["sigma_net"]))
else:
    spec = network.make_spec(bound=1.0, backbone="mlp",
                             compute_dtype="bfloat16")
    params = network.init_params(jax.random.PRNGKey(0), spec)
pw = field_kernel.pack_weights(params, spec)
intr = (1.2 * H, 1.2 * H, W / 2, H / 2)
pose = np.eye(4, dtype=np.float32)
pose[:3, 3] = (0, 0, -2.5)
pose_j = jnp.asarray(pose)
vid = jnp.int32(int(np.argmax(np.asarray(consts.ip_pos)[:, 2])))
vk, vn, vr = consts.IP_kernel[vid], consts.IP_Nx[vid], consts.ip_pos[vid]


def bench_cfg(seg, sub, wn=64, samples=128):
    bst = beam_bend.BeamBendSettings(num_seek_ip=3, max_iter_num=1,
                                     ip_dx=1.05 * dx, ips_per_tile=256,
                                     bin_capacity=8)
    ist = interactive.InteractiveSettings(
        spec=spec, bend=bst, tile=16, samples=samples, active_frac=0.5,
        tile_chunk=32, min_near=0.05, seg_samples=seg, bend_sub=sub,
        bend_window=wn, tighten_sampling=True)

    @jax.jit
    def frame(st, fi):
        p_ip = vr + jnp.einsum("ia,iad->d", vn, st.ddof[vk])
        ang = 0.25 * fi
        tgt = vr + 0.25 * jnp.stack([jnp.cos(ang), jnp.sin(ang),
                                     jnp.float32(0.0)])
        f = jnp.clip(1e5 * (tgt - p_ip), -5e5, 5e5)
        return pipeline.interactive_frame_step(
            ist, consts, st, pw, pose_j, intr, H, W, jnp.float32(1.0),
            vid, f)

    state, out = frame(state0, jnp.float32(0))
    _ = float(jnp.sum(out["tiles_image"]))
    fps = []
    fi = 1
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(15):
            state, out = frame(state, jnp.float32(fi))
            fi += 1
        _ = float(jnp.sum(out["tiles_image"]))
        fps.append(15 / (time.perf_counter() - t0))
    ok = bool(jnp.isfinite(state.ddof).all())
    print(f"Ks={seg} Ksb={sub} Wn={wn} K={out['tiles_image'].shape and ist.samples}: "
          f"median {np.median(fps):.1f} fps "
          f"(reps {[round(f,1) for f in fps]}) finite={ok} "
          f"dropped_window={int(out['dropped_window'])}", flush=True)


if __name__ == "__main__":
    # round-3 retune at the K=128 default (the round-2 table was K=64)
    bench_cfg(8, 4, 64)      # shipped default
    bench_cfg(16, 4, 64)
    bench_cfg(8, 8, 64)
    bench_cfg(16, 8, 64)
    bench_cfg(32, 4, 64)
    bench_cfg(8, 4, 96)
    bench_cfg(16, 8)
    bench_cfg(32, 4)
