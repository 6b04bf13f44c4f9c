"""One-command real-asset validation (round-3 item 7; BASELINE configs 2-4).

Given a reference checkpoint (`ngp_ep*.pth`, reference format
nerf/trainer.py:794-854) and an annotated physics PLY
(reference README.md:98-108), this runs the full chain:

  import .pth -> offline bit-exact hashgrid render (sanity: finite,
  non-empty) -> distill into the fused-kernel mlp student -> IMAGE-space
  teacher/student agreement (PSNR/SSIM at shared poses) -> coupled
  sim+deformed-render interactive bench (FPS)

and writes one JSON report. The moment a released asset is available,
this produces the BASELINE config 2/3 verdict:

    python tools/validate_asset.py --pth ngp_ep0300.pth --ply chair.ply \
        --out report.json

Synthetic stand-ins exercise the whole tool in
tests/test_validate_asset.py (slow).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def orbit_pose(theta, phi, radius):
    eye = radius * np.array([
        np.sin(theta) * np.cos(phi), np.cos(theta),
        np.sin(theta) * np.sin(phi)])
    fwd = -eye / np.linalg.norm(eye)
    up = np.array([0.0, 1.0, 0.0])
    right = np.cross(fwd, up)
    right /= max(np.linalg.norm(right), 1e-9)
    up2 = np.cross(right, fwd)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 0], pose[:3, 1], pose[:3, 2], pose[:3, 3] = right, -up2, fwd, eye
    return pose


def run(pth: str, ply: str, out_path: str, *, bound: float = 1.0,
        n_poses: int = 8, H: int = 256, W: int = 256,
        distill_steps: int = 4000, student_width: int = 128,
        sim_dx: float = 0.05, sim_dt: float = 1e-2, sim_iters: int = 10,
        sim_stiff: float = 1e5, kres: int = 7, bench_frames: int = 20,
        render_samples: int = 64, cache_dir: str | None = None,
        n_grid_updates: int = 6) -> dict:
    import jax
    import jax.numpy as jnp

    from pienerf_tpu.io import checkpoint as ckpt_io
    from pienerf_tpu.io.ply import read_physics_ply
    from pienerf_tpu.models import network
    from pienerf_tpu.ops import beam_bend
    from pienerf_tpu.ops.pallas import field_kernel
    from pienerf_tpu.render import interactive, pipeline
    from pienerf_tpu.sim import solver as sim
    from pienerf_tpu.train import distill

    report: dict = {"pth": pth, "ply": ply, "bound": bound}

    # 1 -- import the reference checkpoint (bit-exact hashgrid teacher)
    t0 = time.time()
    t_params, extra = ckpt_io.load_torch_ngp(pth)
    t_spec = network.make_spec(bound=bound, backbone="hashgrid")
    report["import"] = {"ok": True, "seconds": time.time() - t0,
                        "extra_keys": sorted(extra.keys())}

    poses = [orbit_pose(np.pi / 3 + 0.2 * (i % 3), 2 * np.pi * i / n_poses,
                        2.5 * bound) for i in range(n_poses)]
    focal = 0.9 * H
    intr = (focal, focal, W / 2.0, H / 2.0)

    # 2+3 -- distill, then image-space agreement (which also performs the
    # offline bit-exact teacher renders it compares against)
    t0 = time.time()
    s_params, s_spec, loss = distill.distill(
        t_params, t_spec, steps=distill_steps, student_width=student_width,
        log_fn=lambda m: print(m, flush=True))
    report["distill"] = {"steps": distill_steps, "width": student_width,
                         "final_loss": float(loss),
                         "seconds": time.time() - t0}
    report["field_agreement"] = distill.field_agreement(
        t_params, t_spec, s_params, s_spec)

    t0 = time.time()
    agree = distill.image_agreement(
        t_params, t_spec, s_params, s_spec, poses, intr, H, W,
        student_samples=render_samples, n_grid_updates=n_grid_updates)
    agree["seconds"] = time.time() - t0
    report["image_agreement"] = agree

    # 4 -- coupled interactive bench on the annotated PLY
    d = read_physics_ply(ply)
    init_kw = dict(dt=sim_dt, iters=sim_iters,
                   bbox=np.array([2.0 * bound] * 3), kres=kres, dx=sim_dx,
                   stiff=sim_stiff, base=np.array([-bound] * 3))
    t0 = time.time()
    if cache_dir:
        consts, state, aux = sim.sim_init_cached(
            d["pos"], d["mass"], d["mu"], d["lam"], d["pin"],
            cache_dir=cache_dir, **init_kw)
    else:
        consts, state, aux = sim.sim_init(
            d["pos"], d["mass"], d["mu"], d["lam"], d["pin"], **init_kw)
    report["sim_init"] = {"n_ip": int(aux["n_ip"]), "n_k": int(aux["n_k"]),
                          "seconds": time.time() - t0}

    pw = field_kernel.pack_weights(s_params, s_spec)
    bst = beam_bend.BeamBendSettings(num_seek_ip=3, max_iter_num=1,
                                     ip_dx=1.05 * sim_dx)
    ist = interactive.InteractiveSettings(
        spec=s_spec, bend=bst, tile=16, samples=render_samples,
        min_near=0.05, bound=bound)
    Hb = (H // 16) * 16
    Wb = (W // 16) * 16
    pose_j = jnp.asarray(poses[0])
    fvid = jnp.asarray(0, jnp.int32)
    fvec = jnp.asarray([0.0, 0.0, 0.0], jnp.float32)

    # warm up + honest pipelined timing (distinct sim states per frame)
    state, out = pipeline.interactive_frame_step(
        ist, consts, state, pw, pose_j, intr, Hb, Wb, jnp.float32(1.0),
        fvid, fvec, None)
    _ = float(jnp.sum(out["tiles_ws"]))
    t0 = time.time()
    for _ in range(bench_frames):
        state, out = pipeline.interactive_frame_step(
            ist, consts, state, pw, pose_j, intr, Hb, Wb, jnp.float32(1.0),
            fvid, fvec, None)
    _ = float(jnp.sum(out["tiles_ws"]))
    dt_f = (time.time() - t0) / bench_frames
    assert np.isfinite(np.asarray(out["tiles_image"])).all(), "NaN frame"
    report["interactive"] = {"fps": 1.0 / dt_f, "H": Hb, "W": Wb,
                             "frames": bench_frames,
                             "samples": render_samples}

    report["verdict"] = {
        "image_psnr_ge_30": agree["psnr_mean"] >= 30.0,
        "interactive_fps_ge_30": report["interactive"]["fps"] >= 30.0,
    }
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"summary": {
        "image_psnr": agree["psnr_mean"], "ssim": agree["ssim_mean"],
        "fps": report["interactive"]["fps"]}}))
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pth", required=True)
    ap.add_argument("--ply", required=True)
    ap.add_argument("--out", default="asset_report.json")
    ap.add_argument("--bound", type=float, default=1.0)
    ap.add_argument("--H", type=int, default=256)
    ap.add_argument("--W", type=int, default=256)
    ap.add_argument("--n_poses", type=int, default=8)
    ap.add_argument("--distill_steps", type=int, default=4000)
    ap.add_argument("--student_width", type=int, default=128)
    ap.add_argument("--sim_dx", type=float, default=0.05)
    ap.add_argument("--sim_dt", type=float, default=1e-2)
    ap.add_argument("--sim_iters", type=int, default=10)
    ap.add_argument("--sim_stiff", type=float, default=1e5)
    ap.add_argument("--kres", type=int, default=7)
    ap.add_argument("--bench_frames", type=int, default=20)
    ap.add_argument("--render_samples", type=int, default=64)
    ap.add_argument("--cache_dir", default=None)
    a = ap.parse_args()
    run(a.pth, a.ply, a.out, bound=a.bound, n_poses=a.n_poses, H=a.H, W=a.W,
        distill_steps=a.distill_steps, student_width=a.student_width,
        sim_dx=a.sim_dx, sim_dt=a.sim_dt, sim_iters=a.sim_iters,
        sim_stiff=a.sim_stiff, kres=a.kres, bench_frames=a.bench_frames,
        render_samples=a.render_samples, cache_dir=a.cache_dir)


if __name__ == "__main__":
    main()
