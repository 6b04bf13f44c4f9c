"""Re-price the sampling-density frontier on a TRAINED field (round-3
item 4). PERF.md's original table used random MLP weights (worst case);
this sweeps K in {32, 64, 96, 128} x tighten on/off against a K=256
reference on the field actually learned by tools/quality_run.py, with the
same deformed bench protocol (pinned sphere, 20 spring-drag frames).

    python tools/k_frontier.py --workspace runs/quality_mlp_800 \
        --out runs/k_frontier.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pienerf_tpu.config import PieNeRFConfig
from pienerf_tpu.models import network
from pienerf_tpu.ops import beam_bend
from pienerf_tpu.ops.pallas import field_kernel
from pienerf_tpu.render import interactive, pipeline
from pienerf_tpu.sim import solver as sim
from pienerf_tpu.train.metrics import psnr
from pienerf_tpu.train.trainer import Trainer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workspace", default="runs/quality_mlp_800")
    ap.add_argument("--out", default="runs/k_frontier.json")
    ap.add_argument("--H", type=int, default=800)
    args = ap.parse_args()
    H = W = args.H

    cfg = PieNeRFConfig(bound=1.0, dt_gamma=0.0, min_near=0.05,
                        workspace=args.workspace, backbone="mlp",
                        compute_dtype="bfloat16").finalize()
    cfg.backbone = "mlp"
    cfg.compute_dtype = "bfloat16"
    trainer = Trainer("ngp", cfg, use_checkpoint="latest")
    assert trainer.global_step > 0, "no trained checkpoint in workspace"
    spec = trainer.spec
    pw = field_kernel.pack_weights(trainer.state.ema_params, spec)
    print(f"[field] trained {trainer.global_step} steps, "
          f"hidden={spec.hidden_dim}", flush=True)

    # bench scene: pinned sphere of IPs, 20 frames of spring drag
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

    intr = (1.2 * H, 1.2 * H, W / 2, H / 2)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = (0, 0, -2.5)
    pose_j = jnp.asarray(pose)
    vid = jnp.int32(int(np.argmax(np.asarray(consts.ip_pos)[:, 2])))
    vk, vn, vr = consts.IP_kernel[vid], consts.IP_Nx[vid], consts.ip_pos[vid]

    bst = beam_bend.BeamBendSettings(num_seek_ip=3, max_iter_num=1,
                                     ip_dx=1.05 * dx, ips_per_tile=256,
                                     bin_capacity=8)
    ist0 = interactive.InteractiveSettings(
        spec=spec, bend=bst, tile=16, samples=64, active_frac=0.5,
        tile_chunk=32, min_near=0.05)

    def make_frame(ist):
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
        return fr

    fr0 = make_frame(ist0)
    for i in range(20):
        state, _ = fr0(state, jnp.float32(i))
    p_def, F, dF = sim.get_ip_info(consts, state)
    pack = beam_bend.pack_ip_data_fast(p_def, consts.ip_pos.astype(
        jnp.float32), F, dF)

    def render(ist):
        out = interactive.render_frame_fused(
            ist, pw, pack, p_def, pose_j, intr, H, W, jnp.float32(1.0))
        img = interactive.tiles_to_image(np.asarray(out["tiles_image"]),
                                         H, W)
        assert np.isfinite(img).all()
        return img

    def fps_of(ist):
        fr = make_frame(ist)
        st, out = fr(state, jnp.float32(0))
        _ = float(jnp.sum(out["tiles_image"]))
        reps = []
        fi = 1
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(15):
                st, out = fr(st, jnp.float32(fi))
                fi += 1
            _ = float(jnp.sum(out["tiles_image"]))
            reps.append(15 / (time.perf_counter() - t0))
        return float(np.median(reps))

    img_ref = render(ist0._replace(samples=256))
    rows = []
    for K in (32, 64, 96, 128):
        for tight in (False, True):
            ist_k = ist0._replace(samples=K, tighten_sampling=tight)
            p = float(psnr(render(ist_k), img_ref))
            f = fps_of(ist_k)
            rows.append({"K": K, "tighten": tight, "psnr_vs_K256": p,
                         "fps": f})
            print(f"[row] K={K} tight={tight}: {p:.2f} dB, {f:.1f} FPS",
                  flush=True)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    json.dump({"trained_steps": trainer.global_step, "H": H,
               "n_ip": int(aux["n_ip"]), "rows": rows},
              open(args.out, "w"), indent=1)
    print("| K | tighten | PSNR vs K=256 | FPS @800x800 |")
    print("|---|---|---|---|")
    for r in rows:
        print(f"| {r['K']} | {'on' if r['tighten'] else 'off'} | "
              f"{r['psnr_vs_K256']:.2f} dB | {r['fps']:.1f} |")


if __name__ == "__main__":
    main()
