"""Live web viewer entry point (reference: the dearpygui windows opened by
main_gui.py / main_train.py --gui, nerf/gui.py:61-952; dearpygui is not in
this image so the front-end is a browser page served over stdlib HTTP).

Sim mode (default) — the coupled interactive physics demo:

    python main_viewer.py --workspace model/chair --exp_name chair \
        --backbone mlp --sim_dx 0.05 --num_seek_IP 3 --max_iter_num 1

Train mode — train-while-render with spp accumulation:

    python main_viewer.py --mode train --path data/lego \
        --dataset_type synthetic --backbone mlp

Then open http://127.0.0.1:7007/ (drag = orbit, ctrl+drag = pick+pull an
IP, space = pause, [ ] = dataset poses in train mode).
"""

import argparse
import os

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--mode", choices=("sim", "train"), default="sim")
    parser.add_argument("--port", type=int, default=7007)
    parser.add_argument("--frames", type=int, default=None,
                        help="stop after N frames (scripted runs)")
    parser.add_argument("--gravity", nargs=3, type=float,
                        default=[0.0, -9.8, 0.0])
    parser.add_argument("--kres", type=int, default=7)
    parser.add_argument("--target_ms", type=float, default=80.0,
                        help="sim-mode dynamic-resolution frame budget")
    from pienerf_tpu.config import get_shared_opts
    cfg = get_shared_opts(parser)
    ns, _ = parser.parse_known_args()

    from pienerf_tpu import web_viewer
    from pienerf_tpu.train.trainer import Trainer

    trainer = Trainer("ngp", cfg, workspace=cfg.workspace,
                      use_checkpoint=cfg.ckpt)
    if trainer.spec.backbone != "mlp":
        raise SystemExit("the live viewer needs the mlp backbone "
                         "(hashgrid renders offline; see PERF.md)")

    if ns.mode == "train":
        from pienerf_tpu.data.provider import NeRFDataset
        ds = NeRFDataset(cfg, "train")
        web_viewer.run_train_viewer(trainer, ds, port=ns.port,
                                    max_frames=ns.frames)
        return

    import jax.numpy as jnp

    from pienerf_tpu.io.ply import read_physics_ply
    from pienerf_tpu.ops import beam_bend
    from pienerf_tpu.ops.pallas import field_kernel
    from pienerf_tpu.render import interactive
    from pienerf_tpu.sim import solver as sim

    ply_path = os.path.join("assets", f"{cfg.exp_name}.ply")
    if not os.path.exists(ply_path):
        raise SystemExit(f"annotated physics PLY not found: {ply_path}")
    d = read_physics_ply(ply_path)
    init_kw = dict(
        dt=cfg.sim_dt / cfg.sim_substeps, iters=cfg.sim_iters,
        bbox=np.array([2.0 * cfg.bound] * 3), kres=ns.kres, dx=cfg.sim_dx,
        gravity=tuple(ns.gravity), stiff=cfg.sim_stiff,
        base=np.array([-cfg.bound] * 3))
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

    if cfg.max_iter_num != 1:
        raise SystemExit("the live viewer runs the fused max_iter_num=1 "
                         "path (chair demo config); use main_gui.py for "
                         "deeper Newton")

    pw = field_kernel.pack_weights(trainer.state.ema_params, trainer.spec)
    bst = beam_bend.BeamBendSettings(
        num_seek_ip=cfg.num_seek_IP, max_iter_num=1,
        ip_dx=1.05 * cfg.sim_dx, ips_per_tile=256)
    ist = interactive.InteractiveSettings(
        spec=trainer.spec, bend=bst, tile=16, samples=cfg.render_samples,
        min_near=cfg.min_near, T_thresh=cfg.T_thresh,
        cut=cfg.cut, bound=cfg.bound,
        tighten_sampling=cfg.tighten_sampling)
    cut_bounds = (jnp.asarray(cfg.cut_bounds, jnp.float32)
                  if cfg.cut else None)

    web_viewer.run_sim_viewer(cfg, consts, state, ist, pw,
                              cut_bounds=cut_bounds, port=ns.port,
                              max_frames=ns.frames, target_ms=ns.target_ms)


if __name__ == "__main__":
    main()
