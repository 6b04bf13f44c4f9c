"""Headless interactive physics demo (reference: main_gui.py).

Loads a trained field + an annotated physics PLY, builds the simulator, and
runs the coupled sim+render loop, writing an animation to disk. For the
LIVE interactive window (mouse picking, spring forces, dynamic resolution —
reference nerf/gui.py:439-952) use main_viewer.py, which serves the same
loop to a browser over HTTP.

    python main_gui.py --workspace model/chair --exp_name chair \
        --sim_dx 0.05 --num_seek_IP 3 --max_iter_num 1 \
        --frames 120 --out_dir frames/
"""

import argparse
import os

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--frames", type=int, default=60,
                        help="headless mode: frames to write")
    parser.add_argument("--out_dir", type=str, default="gui_frames")
    parser.add_argument("--force_ip", type=int, default=-1,
                        help="apply a constant force at this IP id")
    parser.add_argument("--force", nargs=3, type=float,
                        default=[0.0, 0.0, 0.0])
    parser.add_argument("--gravity", nargs=3, type=float,
                        default=[0.0, -9.8, 0.0])
    parser.add_argument("--kres", type=int, default=7,
                        help="kernel-node grid resolution (stability knob)")
    from pienerf_tpu.config import get_shared_opts
    cfg = get_shared_opts(parser)
    ns, _ = parser.parse_known_args()

    import jax.numpy as jnp

    from pienerf_tpu.io.ply import read_physics_ply
    from pienerf_tpu.ops import beam_bend
    from pienerf_tpu.ops.pallas import field_kernel
    from pienerf_tpu.render import interactive
    from pienerf_tpu.sim import solver as sim
    from pienerf_tpu.train.trainer import Trainer
    from pienerf_tpu.utils.camera import OrbitCamera

    trainer = Trainer("ngp", cfg, workspace=cfg.workspace,
                      use_checkpoint=cfg.ckpt)

    ply_path = os.path.join("assets", f"{cfg.exp_name}.ply")
    if not os.path.exists(ply_path):
        raise SystemExit(f"annotated physics PLY not found: {ply_path}")
    d = read_physics_ply(ply_path)

    init_kw = dict(
        dt=cfg.sim_dt / cfg.sim_substeps, iters=cfg.sim_iters,
        bbox=np.array([2.0 * cfg.bound] * 3), kres=ns.kres, dx=cfg.sim_dx,
        gravity=tuple(ns.gravity), stiff=cfg.sim_stiff,
        base=np.array([-cfg.bound] * 3),
    )
    if cfg.sim_cache:
        consts, state, aux = sim.sim_init_cached(
            d["pos"], d["mass"], d["mu"], d["lam"], d["pin"],
            cache_dir=os.path.join(cfg.workspace, "sim_cache"), **init_kw)
    else:
        consts, state, aux = sim.sim_init(
            d["pos"], d["mass"], d["mu"], d["lam"], d["pin"], **init_kw)
    if cfg.sim_bf16_b:
        consts = sim.cast_B_bf16(consts)
    print(f"[sim] {aux['n_ip']} IPs, {aux['n_k']} kernel nodes")

    if trainer.spec.backbone != "mlp":
        print("[warn] interactive path requires the mlp backbone; "
              "hashgrid checkpoints render via the offline path "
              "(see PERF.md)")

    pw = field_kernel.pack_weights(trainer.state.ema_params, trainer.spec)
    bst = beam_bend.BeamBendSettings(
        num_seek_ip=cfg.num_seek_IP, max_iter_num=cfg.max_iter_num,
        ip_dx=1.05 * cfg.sim_dx,
    )
    ist = interactive.InteractiveSettings(
        spec=trainer.spec, bend=bst, tile=16, samples=cfg.render_samples,
        min_near=cfg.min_near, T_thresh=cfg.T_thresh,
        cut=cfg.cut, bound=cfg.bound,
        tighten_sampling=cfg.tighten_sampling,
    )
    cut_bounds = (jnp.asarray(cfg.cut_bounds, jnp.float32)
                  if cfg.cut else None)

    H = W = 800 if cfg.dataset_type == "synthetic" else min(cfg.H, 800)
    H = (H // 16) * 16
    W = (W // 16) * 16
    cam = OrbitCamera(W, H, r=cfg.radius, fovy=cfg.fovy)

    os.makedirs(ns.out_dir, exist_ok=True)
    fvid = jnp.asarray(ns.force_ip, jnp.int32)
    fvec = jnp.asarray(ns.force, jnp.float32)

    from pienerf_tpu.io.framesink import FrameSink, native_available

    import time as _time

    from pienerf_tpu.render import pipeline

    fused = cfg.max_iter_num == 1   # fast-Newton pack -> fused tile kernel

    with FrameSink(n_threads=2) as sink:
        if not native_available():
            print("[framesink] native encoder not built "
                  "(run native/build.sh); using python fallback")
        t_prev = _time.perf_counter()
        for i in range(ns.frames):
            if fused:
                # single-jit coupled step (force + sim + pack + fused
                # bend/field/composite kernel) — see render/pipeline.py
                state, out = pipeline.interactive_frame_step(
                    ist, consts, state, pw, jnp.asarray(cam.pose),
                    cam.intrinsics, H, W, jnp.float32(1.0), fvid, fvec,
                    cut_bounds, substeps=cfg.sim_substeps)
                p_def = None
                if i % 10 == 0 or cfg.timing_on:
                    if not bool(jnp.isfinite(out["tiles_ws"]).all()):
                        raise SystemExit(
                            f"simulation diverged at frame {i}; tune "
                            "--sim_dt / --kres / mass / lam,mu (the local-"
                            "global scheme is conditionally stable, "
                            "matching the CUDA reference)")
            else:
                state = sim.update_force(consts, state, jnp.maximum(fvid, 0),
                                         fvec) \
                    if int(fvid) >= 0 else sim.clear_force(state)
                state = sim.sim_step(consts, state)
                p_def, F, dF = sim.get_ip_info(consts, state)
                if not bool(jnp.isfinite(p_def).all()):
                    raise SystemExit(
                        f"simulation diverged at frame {i} (NaN IP "
                        "positions); tune --sim_dt / --kres / mass / lam,mu "
                        "(the local-global scheme is conditionally stable, "
                        "matching the CUDA reference)")
                pack = beam_bend.pack_for(bst,
                    p_def, consts.ip_pos.astype(jnp.float32), F, dF)
                out = interactive.render_frame(
                    ist, pw, pack, p_def, jnp.asarray(cam.pose),
                    cam.intrinsics, H, W, jnp.float32(1.0), cut_bounds)
            img = interactive.tiles_to_image(out["tiles_image"], H, W,
                                             ist.tile)
            sink.push(os.path.join(ns.out_dir, f"frame_{i:04d}.png"),
                      np.asarray(img))
            if cfg.timing_on:
                # per-frame wall time (reference --timing_on,
                # renderer.py:759-894); async display means this includes
                # the device pipeline drain for the frame
                now = _time.perf_counter()
                print(f"timing: frame {i}: {(now - t_prev) * 1000:.1f} ms "
                      f"(active tiles: {int(out['n_active'])})")
                t_prev = now
            if i % 10 == 0:
                print(f"frame {i}/{ns.frames}")
    print(f"wrote {ns.frames} frames to {ns.out_dir}/")


if __name__ == "__main__":
    main()
