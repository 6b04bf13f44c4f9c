"""Distillation fidelity table: student width x {image PSNR/SSIM, FPS}
(round-3 item 2; ROADMAP item 2 executed).

Teacher: a REAL hashgrid field (reference architecture, bit-exact
backbone) fitted to the analytic sphere scene by direct field-space
regression — minutes on the TPU, vs the ~14.5 h render-training wall
(PERF.md row-gather spike) that motivates distillation in the first
place. Students: the 64-wide (quarter-MXU) and 128-wide (MXU-filling)
Fourier-MLP students distilled with train/distill.py.

Measured per width:
  - field agreement (sigma log-MSE, weighted rgb MSE, occupancy IoU)
  - IMAGE agreement: teacher rendered through the offline bit-exact
    occupancy path vs student through the fused tile kernel, same poses
    (train/distill.py:image_agreement)
  - fused deformed-frame FPS at 800x800 (3-seek bend against a
    rest-pose IP cloud of the object — the interactive render cost;
    sim cost is width-independent)

Writes distill_table.json + prints markdown rows for PERF.md.

    python tools/distill_table.py --out runs/distill_table.json
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
import optax

from pienerf_tpu.data import synthetic
from pienerf_tpu.models import network
from pienerf_tpu.train import distill


def fit_hashgrid_teacher(steps: int = 2000, batch: int = 8192,
                         lr: float = 1e-2, bound: float = 1.0, seed: int = 0,
                         scene: str = "sphere"):
    """Field-space fit of the reference hashgrid architecture to the
    analytic scene (sigma + direction-independent albedo)."""
    spec = network.make_spec(bound=bound, backbone="hashgrid")
    params = network.init_params(jax.random.PRNGKey(seed), spec)
    opt = optax.adam(optax.exponential_decay(lr, steps, 0.1),
                     b1=0.9, b2=0.99, eps=1e-15)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, x, d, sig_gt, rgb_gt):
        alpha = 1.0 - jnp.exp(-jnp.clip(sig_gt, 0.0, 1e4) * 0.01)

        def loss_fn(p):
            sig, rgb = network.forward(p, spec, x, d)
            l_sig = jnp.mean((jnp.log1p(sig) - jnp.log1p(sig_gt)) ** 2)
            l_rgb = jnp.mean(alpha[:, None] * (rgb - rgb_gt) ** 2)
            return l_sig + 4.0 * l_rgb

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = jax.random.PRNGKey(seed + 1)
    t0 = time.time()
    for i in range(steps):
        rng, k1, k2, k3 = jax.random.split(rng, 4)
        # half uniform coverage, half concentrated at the sphere shell
        xu = jax.random.uniform(k1, (batch // 2, 3), minval=-bound,
                                maxval=bound)
        sh = jax.random.normal(k2, (batch - batch // 2, 3))
        sh = sh / jnp.linalg.norm(sh, axis=1, keepdims=True)
        if scene == "sphere":
            rad = 0.5 + 0.1 * jax.random.normal(k3, (batch - batch // 2, 1))
            xs = sh * rad
        else:
            # concentrate near the scene's occupied lattice (the hard
            # scene's lobes are off-center; a sphere shell misses them)
            occ = _occ_pts(scene)
            pick = jax.random.randint(k3, (batch - batch // 2,), 0,
                                      occ.shape[0])
            xs = jnp.asarray(occ)[pick] + 0.05 * sh
        x = jnp.concatenate([xu, xs], axis=0)
        d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (batch, 1))
        sig_np, rgb_np = synthetic.scene_field(scene, np.asarray(x))
        sig_gt = jnp.asarray(sig_np)
        rgb_gt = jnp.asarray(rgb_np, jnp.float32)
        params, opt_state, loss = step(params, opt_state, x, d, sig_gt,
                                       rgb_gt)
        if (i + 1) % 500 == 0:
            print(f"[teacher] {i + 1}/{steps} loss={float(loss):.5f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    return params, spec


import functools


@functools.lru_cache(maxsize=4)
def _occ_pts(scene: str):
    return synthetic.scene_points(scene, dx=0.04).astype(np.float32)


def fused_frame_fps(s_params, s_spec, H=800, W=800, samples=128, reps=8,
                    scene="sphere"):
    """Deformed fused-frame rate at an identity-deformation IP cloud of
    the sphere (3-seek bend; the bench render protocol minus sim)."""
    from pienerf_tpu.ops import beam_bend
    from pienerf_tpu.ops.pallas import field_kernel
    from pienerf_tpu.render import interactive

    dx = 0.05
    p = synthetic.scene_points(scene, dx=dx).astype(np.float32)
    n = p.shape[0]
    F = np.tile(np.eye(3, dtype=np.float32), (n, 1, 1))
    dF = np.zeros((n, 3, 3, 3), np.float32)
    pj = jnp.asarray(p)
    pack = beam_bend.pack_ip_data_fast(pj, pj, jnp.asarray(F),
                                       jnp.asarray(dF))
    bst = beam_bend.BeamBendSettings(num_seek_ip=3, max_iter_num=1,
                                     ip_dx=1.05 * dx, ips_per_tile=256)
    # the round-3 default operating point: K=128 + tightened spans
    ist = interactive.InteractiveSettings(
        spec=s_spec, bend=bst, tile=16, samples=samples, min_near=0.05,
        tighten_sampling=True)
    pw = field_kernel.pack_weights(s_params, s_spec)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = (0.0, 0.0, -2.5)
    intr = (0.9 * H, 0.9 * H, W / 2.0, H / 2.0)

    out = interactive.render_frame_fused(
        ist, pw, pack, pj, jnp.asarray(pose), intr, H, W, jnp.float32(1.0),
        t_jitter=0.5)
    _ = float(jnp.sum(out["tiles_ws"]))   # warm-up + compile
    t0 = time.time()
    for r in range(reps):
        out = interactive.render_frame_fused(
            ist, pw, pack, pj, jnp.asarray(pose), intr, H, W,
            jnp.float32(1.0), t_jitter=float(0.3 + 0.4 * (r % 2)))
    _ = float(jnp.sum(out["tiles_ws"]))
    return reps / (time.time() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="runs/distill_table.json")
    ap.add_argument("--teacher_steps", type=int, default=2000)
    ap.add_argument("--distill_steps", type=int, default=4000)
    ap.add_argument("--H", type=int, default=256)
    ap.add_argument("--n_poses", type=int, default=8)
    ap.add_argument("--fps_reps", type=int, default=8)
    ap.add_argument("--scene", default="sphere")
    args = ap.parse_args()
    if args.scene != "sphere" and args.out == "runs/distill_table.json":
        args.out = f"runs/distill_table_{args.scene}.json"

    # cache the fitted teacher: reruns of the table (or of downstream
    # tools) should not pay the multi-minute fit again
    from pienerf_tpu.io import checkpoint as ckpt_io
    tag = "" if args.scene == "sphere" else f"_{args.scene}"
    cache = f"runs/distill_teacher{tag}_s{args.teacher_steps}.npz"
    if os.path.exists(cache):
        print(f"[teacher] cached: {cache}", flush=True)
        t_params, _ = ckpt_io.load_native(cache)
        t_spec = network.make_spec(bound=1.0, backbone="hashgrid")
    else:
        t_params, t_spec = fit_hashgrid_teacher(steps=args.teacher_steps,
                                                scene=args.scene)
        os.makedirs("runs", exist_ok=True)
        ckpt_io.save_native(cache, jax.tree_util.tree_map(np.asarray,
                                                          t_params))

    H = W = args.H
    focal = 0.9 * H
    intr = (focal, focal, W / 2.0, H / 2.0)
    poses = [synthetic.orbit_poses(args.n_poses, seed=123)[i]
             for i in range(args.n_poses)]

    rows = []
    for width in (64, 128):
        t0 = time.time()
        s_params, s_spec, loss = distill.distill(
            t_params, t_spec, steps=args.distill_steps,
            student_width=width, log_fn=lambda m: print(m, flush=True))
        wall = time.time() - t0
        fa = distill.field_agreement(t_params, t_spec, s_params, s_spec)
        ia = distill.image_agreement(t_params, t_spec, s_params, s_spec,
                                     poses, intr, H, W)
        fps = fused_frame_fps(s_params, s_spec, reps=args.fps_reps,
                              scene=args.scene)
        rows.append({
            "width": width, "distill_seconds": wall,
            "final_loss": float(loss), "field": fa,
            "image_psnr": ia["psnr_mean"], "image_ssim": ia["ssim_mean"],
            "image_psnr_per_view": ia["psnr_per_view"],
            "fps_800": fps,
        })
        print(f"[row] width={width} image_psnr={ia['psnr_mean']:.2f} "
              f"ssim={ia['ssim_mean']:.4f} fps={fps:.1f}", flush=True)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    json.dump({"scene": args.scene,
               "teacher_steps": args.teacher_steps,
               "distill_steps": args.distill_steps,
               "H": H, "rows": rows}, open(args.out, "w"), indent=1)
    print("| student width | image PSNR vs teacher | SSIM | FPS @800x800 |")
    print("|---|---|---|---|")
    for r in rows:
        print(f"| {r['width']} | {r['image_psnr']:.2f} dB | "
              f"{r['image_ssim']:.4f} | {r['fps_800']:.1f} |")


if __name__ == "__main__":
    main()
