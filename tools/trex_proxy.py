"""Trex-config end-to-end proxy (round-3 review item 5; BASELINE config 4).

The reference's trex workflow (reference README.md:110-137) is: a COLMAP
dataset at 1008x756 -> train -> `main_sample.py --cut --cut_bounds ...` ->
interactive GUI with `--num_seek_IP 1 --max_steps 300 --T_thresh 5e-2
--cut --cut_bounds ...` where objects inside cut_bounds simulate + bend
and the rest renders as a static background. No LLFF asset ships in either
repo, so this drives the identical pipeline on a procedural stand-in:

  data   write a COLMAP-format dataset (transforms.json + PNG frames,
         1008x756) of the 'hard' analytic scene — poses stored in the
         PRE-ngp convention so data/provider.py's nerf_matrix_to_ngp and
         slerp test split run exactly as for a real capture;
  train  NeRFDataset(colmap) -> Trainer (mlp flagship) at full res;
  sim    AdaptiveUniformSampling with --cut --cut_bounds (clamped lattice)
         -> annotated physics PLY -> sim_init;
  bench  coupled sim + CUT-MODE deformed render at 1008x752 (width 1008 =
         63 tiles; height 752 = 47 tiles, nearest 16-multiple to 756),
         num_seek_IP=1, T_thresh=5e-2 — FPS (spring drag, pinned base) +
         fidelity vs the cut-mode exact-bending oracle.

One BENCH-style JSON line lands in runs/trex_proxy.json.

    python tools/trex_proxy.py --root runs/trex_proxy [--iters 8000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# trex-proxy cut box: encloses the 'hard' scene's +x lobes (centers
# [0.22,0.02,0.10] r=.34 and [0,-.26,.24] r=.23 + bump 0.05); the -x lobes
# stay static background, exactly the trex body-vs-scene split
CUT_BOUNDS = [-0.30, 0.75, -0.75, 0.60, -0.45, 0.75]
W_DATA, H_DATA = 1008, 756          # the reference trex resolution
W_RUN, H_RUN = 1008, 752            # tile-aligned render resolution


def ngp_to_nerf_matrix(P: np.ndarray, scale: float, offset) -> np.ndarray:
    """Inverse of provider.nerf_matrix_to_ngp: the on-disk pose M such
    that nerf_matrix_to_ngp(M, scale, offset) == P."""
    M = np.eye(4, dtype=np.float64)
    # P rows (0,1,2) came from M rows (1,2,0)
    for pr, mr in ((0, 1), (1, 2), (2, 0)):
        M[mr, 0] = P[pr, 0]
        M[mr, 1] = -P[pr, 1]
        M[mr, 2] = -P[pr, 2]
        M[mr, 3] = (P[pr, 3] - offset[pr]) / scale
    return M


def stage_data(root: str, n_views: int, seed: int = 0):
    from PIL import Image

    from pienerf_tpu.data import synthetic
    from pienerf_tpu.data.provider import nerf_matrix_to_ngp
    from tools.quality_run import render_gt_device

    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    focal = 0.9 * H_DATA
    intr = (focal, focal, W_DATA / 2.0, H_DATA / 2.0)
    poses = synthetic.orbit_poses(n_views, seed=seed)
    # The reference's colmap default scale=0.33 (get_opts.py) NORMALIZES
    # real LLFF extents (trex sits ~3 units out) into the unit box. Our
    # procedural scene is already unit-normalized, so the equivalent
    # normalization is 1.0 — with 0.33 the field shrinks to r~0.2, which
    # triples its relative frequency content (capping the Fourier-MLP fit
    # at ~20 dB) and breaks the world-coordinate CUT_BOUNDS contract.
    scale, offset = 1.0, (0.0, 0.0, 0.0)

    frames = []
    t0 = time.time()
    for i, P in enumerate(poses):
        img = render_gt_device(P, intr, H_DATA, W_DATA, scene="hard")
        fp = f"images/{i:04d}.png"
        Image.fromarray(
            np.clip(img * 255, 0, 255).astype(np.uint8)).save(
                os.path.join(root, fp))
        M = ngp_to_nerf_matrix(P.astype(np.float64), scale, offset)
        # roundtrip guard: the provider must reconstruct our pose
        back = nerf_matrix_to_ngp(M.astype(np.float32), scale, offset)
        assert np.abs(back - P).max() < 1e-4, "pose convention roundtrip"
        frames.append({"file_path": fp, "transform_matrix": M.tolist()})
    meta = {"fl_x": focal, "fl_y": focal, "cx": W_DATA / 2.0,
            "cy": H_DATA / 2.0, "h": H_DATA, "w": W_DATA, "frames": frames}
    with open(os.path.join(root, "transforms.json"), "w") as f:
        json.dump(meta, f)
    print(f"[data] {n_views} colmap views {W_DATA}x{H_DATA} "
          f"in {time.time()-t0:.1f}s -> {root}")


def make_cfg(root: str, iters: int, lr_decay_rate: float = 1e-4,
             train_max_samples: int = 64):
    """lr_decay_rate defaults DEEP (1e-4, not the reference's 0.1): on
    this dataset the fit breaks through at ~5k iters and then CRASHES
    under the reference schedule (measured: 32.6 dB @ 6k -> 19.5 @ 30k
    with train loss rising 5x — the same Adam noise-floor random walk as
    PERF.md's lr study, arriving mid-run because the colmap-path loss
    floor is higher). The deep tail freezes the post-breakthrough fit."""
    from pienerf_tpu.config import PieNeRFConfig
    cfg = PieNeRFConfig(
        path=root, dataset_type="colmap", bound=1.0, scale=1.0,
        dt_gamma=0.0, iters=iters, num_rays=4096, min_near=0.05,
        train_max_samples=train_max_samples, backbone="mlp",
        lr_decay_rate=lr_decay_rate,
        workspace=os.path.join(root, "ws"),
        cut=True, cut_bounds=CUT_BOUNDS,
        sub_res=96, density_threshold=0.02, sim_dx=0.05,
        T_thresh=5e-2, max_steps=300, num_seek_IP=1, max_iter_num=1,
        W=W_DATA, H=H_DATA,
    ).finalize()
    cfg.backbone = "mlp"
    return cfg


def stage_train(root: str, iters: int):
    from pienerf_tpu.data.provider import NeRFDataset
    from pienerf_tpu.train.trainer import Trainer

    cfg = make_cfg(root, iters)
    train_ds = NeRFDataset(cfg, type="train")
    val_ds = NeRFDataset(cfg, type="val")
    trainer = Trainer("ngp", cfg, use_checkpoint="latest")
    trainer.mark_untrained_grid(train_ds.poses, train_ds.intrinsics)
    t0 = time.time()
    n = iters - trainer.global_step
    if n > 0:
        loss = trainer.train_iterations(train_ds, n)
    psnr = trainer.evaluate(val_ds, save_images=False)
    trainer.save_checkpoint()
    print(f"[train] {iters} iters in {time.time()-t0:.1f}s, "
          f"val PSNR {psnr:.2f} dB")
    return float(psnr)


def stage_sim(root: str):
    from pienerf_tpu.io.ply import read_physics_ply, write_ply
    from pienerf_tpu.sample import AdaptiveUniformSampling
    from pienerf_tpu.train.trainer import Trainer

    cfg = make_cfg(root, 1)
    trainer = Trainer("ngp", cfg, use_checkpoint="latest")
    assert trainer.global_step > 0, "train stage first"
    sampler = AdaptiveUniformSampling(cfg, trainer.state.ema_params,
                                      trainer.spec)
    ply = os.path.join(root, "trex_proxy.ply")
    res = sampler.sample(write_path=ply)
    pts = res["points"]
    cb = np.asarray(CUT_BOUNDS).reshape(3, 2).T
    # the reference's half-cell-shifted union lattice uses the FULL-box
    # step even in cut mode (reference main_sample.py:299), so points may
    # exceed cut_bounds by up to one shift — parity, not a sampler bug
    tol = 0.5 * 2.0 * cfg.bound / cfg.sub_res + 1e-6
    assert (pts >= cb[0] - tol).all() and (pts <= cb[1] + tol).all(), (
        "sampler escaped cut_bounds beyond the reference's half-cell "
        f"shift: min {pts.min(0)}, max {pts.max(0)}, cb {CUT_BOUNDS}")
    d = read_physics_ply(ply)
    n = d["pos"].shape[0]
    pin = (d["pos"][:, 2] < np.quantile(d["pos"][:, 2], 0.12)).astype(
        np.float64)
    write_ply(ply, d["pos"], vp=d["vp"], pin=pin,
              lam=np.full(n, 1e5), mu=np.full(n, 1e5),
              mass=np.full(n, 0.1))
    print(f"[sim] {n} physics points inside cut_bounds -> {ply}")
    return ply


def stage_bench(root: str, frames: int = 20, active_frac: float = 0.5,
                ips_per_tile: int = 256, bin_capacity: int = 8,
                bend_window: int = 64, cut_static_frac: float = 0.95,
                paired: bool = False, static_cache: bool = True,
                out_path: str = "runs/trex_proxy.json"):
    import jax
    import jax.numpy as jnp

    from pienerf_tpu.io.ply import read_physics_ply
    from pienerf_tpu.models import network
    from pienerf_tpu.ops import beam_bend
    from pienerf_tpu.ops.pallas import field_kernel
    from pienerf_tpu.render import interactive, pipeline
    from pienerf_tpu.sim import solver as sim
    from pienerf_tpu.train.trainer import Trainer

    cfg = make_cfg(root, 1)
    trainer = Trainer("ngp", cfg, use_checkpoint="latest")
    params = trainer.state.ema_params
    spec = trainer.spec
    pw = field_kernel.pack_weights(params, spec)

    d = read_physics_ply(os.path.join(root, "trex_proxy.ply"))
    consts, state, aux = sim.sim_init(
        d["pos"], d["mass"], d["mu"], d["lam"], d["pin"] > 0.5,
        dt=1e-2, iters=10, bbox=np.array([2.0, 2.0, 2.0]), kres=7,
        dx=cfg.sim_dx, gravity=(0.0, 0.0, 0.0), stiff=1e5,
        base=np.array([-1.0, -1.0, -1.0]))
    state_init = state

    # trex interactive operating point (reference README.md:134):
    # num_seek_IP=1, T_thresh=5e-2; K=128 is the round-3 default mapping
    # of the reference's max_steps=300 march budget
    bst = beam_bend.BeamBendSettings(
        num_seek_ip=1, max_iter_num=1, ip_dx=1.05 * cfg.sim_dx,
        ips_per_tile=ips_per_tile, bin_capacity=bin_capacity)
    ist = interactive.InteractiveSettings(
        spec=spec, bend=bst, tile=16, samples=128,
        active_frac=active_frac, tile_chunk=32, min_near=0.05,
        T_thresh=5e-2, cut=True, bound=1.0, bend_window=bend_window,
        cut_static_frac=cut_static_frac)
    if paired:
        pw = field_kernel.pack_weights_paired(params, spec)
    H, W = H_RUN, W_RUN
    focal = 0.9 * H_DATA
    intr = (focal, focal, W / 2.0, H / 2.0)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = (0, 0, -2.5)
    pose_j = jnp.asarray(pose)
    cb = jnp.asarray(CUT_BOUNDS, jnp.float32)

    force_vid = jnp.int32(int(np.argmax(np.asarray(consts.ip_pos)[:, 2])))
    vid_kernel = consts.IP_kernel[force_vid]
    vid_nx = consts.IP_Nx[force_vid]
    vid_rest = consts.ip_pos[force_vid]
    spring_k = jnp.float32(1e5)

    # camera-fixed static-background cache (interactive.render_static_cache):
    # the drag protocol holds the camera still, so the cut-split static
    # pass — the bulk of the trex frame — renders once here and is reused
    # bit-exactly every frame (rebuilt on camera/weights change)
    cache = None
    if static_cache:
        cache = interactive.render_static_cache(
            ist, pw, pose_j, intr, H, W, cb)
        jax.block_until_ready(cache["imgs"])

    @jax.jit
    def frame(st, fi):
        p_ip = vid_rest + jnp.einsum("ia,iad->d", vid_nx,
                                     st.ddof[vid_kernel])
        ang = 0.25 * fi
        target = vid_rest + 0.2 * jnp.stack(
            [jnp.cos(ang), jnp.sin(ang), jnp.float32(0.0)])
        f = jnp.clip(spring_k * (target - p_ip), -5e5, 5e5)
        return pipeline.interactive_frame_step(
            ist, consts, st, pw, pose_j, intr, H, W, jnp.float32(1.0),
            force_vid, f, cb, static_cache=cache)

    state, out = frame(state, jnp.float32(0))
    _ = float(jnp.sum(out["tiles_image"]))
    drops = {k: int(out[k]) for k in
             ("dropped_beam", "dropped_window", "n_tile_overflow")}

    fps_reps = []
    fi = 1
    for _ in range(3):
        t0 = time.perf_counter()
        acc = None
        for _ in range(frames):
            state, out = frame(state, jnp.float32(fi))
            fi += 1
            acc = (out["tiles_image"] if acc is None
                   else acc + out["tiles_image"])
        _ = float(jnp.sum(acc))
        fps_reps.append(frames / (time.perf_counter() - t0))
        assert bool(jnp.isfinite(state.ddof).all()), "sim diverged"
    fps = float(np.median(fps_reps))

    # fidelity vs the CUT-MODE exact oracle on a deterministic state
    spec32 = spec._replace(compute_dtype="float32")
    pw32 = field_kernel.pack_weights(params, spec32)
    ist32 = ist._replace(spec=spec32)

    @jax.jit
    def push(st):
        f = jnp.asarray([2e3, 0.0, 0.0], jnp.float32)
        st = sim.update_force(consts, st, force_vid, f)
        return sim.sim_step(consts, st)

    st_fid = state_init
    for _ in range(5):
        st_fid = push(st_fid)
    p_def, F, dF = sim.get_ip_info(consts, st_fid)
    pack_fast = beam_bend.pack_ip_data_fast(
        p_def, consts.ip_pos.astype(jnp.float32), F, dF)
    out_f = interactive.render_frame_fused(
        ist32, pw32, pack_fast, p_def, pose_j, intr, H, W,
        jnp.float32(1.0), cut_bounds=cb)
    img_f = interactive.tiles_to_image(
        np.asarray(out_f["tiles_image"]), H, W)
    out_x = interactive.render_frame_exact(
        ist32, pw32, p_def, consts.ip_pos.astype(jnp.float32), F, dF,
        pose_j, intr, H, W, jnp.float32(1.0), cut_bounds=cb)
    img_x = interactive.tiles_to_image(
        np.asarray(out_x["tiles_image"]), H, W)
    mse = float(np.mean((img_x - img_f) ** 2))
    psnr = float(10.0 * np.log10(1.0 / max(mse, 1e-12)))

    result = {
        "metric": f"trex-proxy coupled sim + CUT-mode deformed render FPS "
                  f"@ {W}x{H} (hard-scene colmap proxy for nerf_llff_data/"
                  f"trex; num_seek_IP=1, T_thresh=5e-2, cut_bounds, "
                  f"pinned base + spring drag"
                  + (", static background tiles rendered once and reused "
                     "under the fixed camera — bit-exact vs re-render"
                     if static_cache else "") + ")",
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps * H * W / (12.5 * 400 * 400), 3),
        "extras": {
            "n_ip": int(aux["n_ip"]),
            "capacity_drops_frame0": drops,
            "fused_vs_exact_cut_psnr": round(psnr, 2),
            "operating_point": {
                "active_frac": active_frac, "ips_per_tile": ips_per_tile,
                "bin_capacity": bin_capacity, "bend_window": bend_window,
                "cut_static_frac": cut_static_frac, "paired": paired,
                "static_cache": static_cache,
            },
        },
    }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="runs/trex_proxy")
    ap.add_argument("--n_views", type=int, default=24)
    ap.add_argument("--iters", type=int, default=8000)
    ap.add_argument("--stages", default="data,train,sim,bench")
    ap.add_argument("--active_frac", type=float, default=0.5)
    ap.add_argument("--ips_per_tile", type=int, default=256)
    ap.add_argument("--bin_capacity", type=int, default=8)
    ap.add_argument("--bend_window", type=int, default=64)
    ap.add_argument("--cut_static_frac", type=float, default=0.95)
    ap.add_argument("--paired", action="store_true")
    ap.add_argument("--no_static_cache", action="store_true",
                    help="re-render the static background every frame "
                         "(the pre-cache protocol)")
    ap.add_argument("--out", default="runs/trex_proxy.json")
    args = ap.parse_args()
    os.makedirs(args.root, exist_ok=True)
    stages = args.stages.split(",")
    if "data" in stages and not os.path.exists(
            os.path.join(args.root, "transforms.json")):
        stage_data(args.root, args.n_views)
    if "train" in stages:
        stage_train(args.root, args.iters)
    if "sim" in stages:
        stage_sim(args.root)
    if "bench" in stages:
        stage_bench(args.root, active_frac=args.active_frac,
                    ips_per_tile=args.ips_per_tile,
                    bin_capacity=args.bin_capacity,
                    bend_window=args.bend_window,
                    cut_static_frac=args.cut_static_frac,
                    paired=args.paired,
                    static_cache=not args.no_static_cache,
                    out_path=args.out)


if __name__ == "__main__":
    main()
