"""Offline deformed rendering from dumped sim state
(reference: main_render.py — renders frames from debug/ip_pos_i.npy,
ip_F_i.npy, ip_dF_i.npy dumps through the deformed path).

    python main_render.py --workspace model/chair --exp_name chair \
        --dump_dir debug --frame 57 --pose_json data/chair/transforms_test.json
"""

import argparse
import glob
import json
import os

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dump_dir", type=str, default="debug")
    parser.add_argument("--frame", type=int, default=0)
    parser.add_argument("--pose_json", type=str, default=None)
    parser.add_argument("--pose_name", type=str, default=None,
                        help="substring of the frame file_path to render")
    parser.add_argument("--out", type=str, default="render_out.png")
    from pienerf_tpu.config import get_shared_opts
    cfg = get_shared_opts(parser)
    ns, _ = parser.parse_known_args()

    import jax.numpy as jnp

    from pienerf_tpu.data.provider import nerf_matrix_to_ngp
    from pienerf_tpu.ops import beam_bend
    from pienerf_tpu.ops.pallas import field_kernel
    from pienerf_tpu.render import interactive
    from pienerf_tpu.train.trainer import Trainer

    i = ns.frame
    p_def = np.load(os.path.join(ns.dump_dir, f"ip_pos_{i}.npy"))
    F = np.load(os.path.join(ns.dump_dir, f"ip_F_{i}.npy"))
    dF = np.load(os.path.join(ns.dump_dir, f"ip_dF_{i}.npy"))
    p_ori = np.load(os.path.join(ns.dump_dir, "ip_rest.npy")) \
        if os.path.exists(os.path.join(ns.dump_dir, "ip_rest.npy")) else p_def
    if F.ndim == 2:           # flattened reference-style dumps
        F = F.reshape(-1, 3, 3)
    if dF.ndim == 2:
        dF = dF.reshape(-1, 3, 3, 3)

    trainer = Trainer("ngp", cfg, workspace=cfg.workspace,
                      use_checkpoint=cfg.ckpt)

    # pose from transforms json (reference main_render.py:28-45)
    if ns.pose_json:
        with open(ns.pose_json) as f:
            transform = json.load(f)
        frames = transform["frames"]
        fr = frames[0]
        if ns.pose_name:
            for cand in frames:
                if ns.pose_name in cand["file_path"]:
                    fr = cand
                    break
        pose = nerf_matrix_to_ngp(np.array(fr["transform_matrix"], np.float32),
                                  scale=cfg.scale, offset=cfg.offset)
    else:
        pose = np.eye(4, dtype=np.float32)
        pose[:3, 3] = (0, 0, -2.5)

    H = (cfg.H // 16) * 16
    W = (cfg.W // 16) * 16
    focal = H / (2 * np.tan(np.radians(cfg.fovy) / 2))
    intr = (focal, focal, W / 2, H / 2)

    pw = field_kernel.pack_weights(trainer.state.ema_params, trainer.spec)
    bst = beam_bend.BeamBendSettings(
        num_seek_ip=cfg.num_seek_IP, max_iter_num=cfg.max_iter_num,
        ip_dx=1.05 * cfg.sim_dx)
    ist = interactive.InteractiveSettings(
        spec=trainer.spec, bend=bst, samples=96, min_near=cfg.min_near,
        T_thresh=cfg.T_thresh, cut=cfg.cut, bound=cfg.bound)
    cut_bounds = (jnp.asarray(cfg.cut_bounds, jnp.float32)
                  if cfg.cut else None)

    pack = beam_bend.pack_for(bst, 
        jnp.asarray(p_def, jnp.float32), jnp.asarray(p_ori, jnp.float32),
        jnp.asarray(F, jnp.float32), jnp.asarray(dF, jnp.float32))
    out = interactive.render_frame(
        ist, pw, pack, jnp.asarray(p_def, jnp.float32), jnp.asarray(pose),
        intr, H, W, jnp.float32(1.0), cut_bounds)
    img = interactive.tiles_to_image(out["tiles_image"], H, W, ist.tile)

    import imageio.v2 as imageio
    imageio.imwrite(ns.out, (np.clip(img, 0, 1) * 255).astype(np.uint8))
    print(f"wrote {ns.out}")


if __name__ == "__main__":
    main()
