"""The real product path, end to end, on a hashgrid THIS repo trained
(round-3 review item 2).

Input: a workspace where tools/quality_run.py --backbone hashgrid already
trained past plateau (curve.json + native npz checkpoints). This tool then
walks the reference user workflow (reference README.md:91-134) without any
external asset:

  1. export the latest native checkpoint to the reference's `ngp_ep*.pth`
     format (io/checkpoint.save_torch_ngp) and RE-IMPORT it, asserting the
     round-trip is bit-exact on every parameter;
  2. sample a physics point cloud from the re-imported field
     (pienerf_tpu.sample.AdaptiveUniformSampling = reference
     main_sample.py), annotate pin/lam/mu/mass programmatically (the step
     the reference asks users to do by hand);
  3. hand the .pth + annotated PLY to tools/validate_asset.run: offline
     bit-exact teacher renders -> distill into the interactive mlp student
     -> IMAGE-space teacher/student agreement -> coupled sim+deformed
     interactive FPS.

One JSON report: train curve summary + roundtrip + sampling + distill
agreement + interactive FPS.

    python tools/hashgrid_chain.py --workspace runs/quality_hashgrid_r4 \
        --out runs/hashgrid_chain_report.json
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workspace", default="runs/quality_hashgrid_r4")
    ap.add_argument("--out", default="runs/hashgrid_chain_report.json")
    ap.add_argument("--bound", type=float, default=1.0)
    ap.add_argument("--sub_res", type=int, default=64)
    ap.add_argument("--density_threshold", type=float, default=0.02)
    ap.add_argument("--sim_dx", type=float, default=0.05)
    ap.add_argument("--distill_steps", type=int, default=4000)
    ap.add_argument("--student_width", type=int, default=64)
    ap.add_argument("--H", type=int, default=256)
    ap.add_argument("--W", type=int, default=256)
    args = ap.parse_args()

    import jax

    from pienerf_tpu.config import PieNeRFConfig
    from pienerf_tpu.io import checkpoint as ckpt_io
    from pienerf_tpu.io.ply import read_physics_ply, write_ply
    from pienerf_tpu.models import network
    from pienerf_tpu.sample import AdaptiveUniformSampling
    from tools import validate_asset

    report: dict = {"workspace": args.workspace}

    # --- training summary (what quality_run recorded)
    curve_path = os.path.join(args.workspace, "curve.json")
    if os.path.exists(curve_path):
        curve = json.load(open(curve_path))
        report["train"] = {
            "final_step": curve[-1]["step"],
            "final_eval_psnr": curve[-1]["psnr"],
            "peak_eval_psnr": max(c["psnr"] for c in curve),
            "wall_s": curve[-1]["wall_s"],
        }

    # --- 1: export -> reimport roundtrip (bit-exact)
    cands = sorted(glob.glob(
        os.path.join(args.workspace, "checkpoints", "ngp_ep*.npz")))
    assert cands, f"no native checkpoints under {args.workspace}"
    native = cands[-1]
    tree, meta = ckpt_io.load_native(native)
    params = tree.get("ema_params", tree.get("params", tree))
    pth = os.path.join(args.workspace, "checkpoints",
                       os.path.basename(native).replace(".npz", ".pth"))
    t0 = time.time()
    ckpt_io.save_torch_ngp(pth, params)
    re_params, _ = ckpt_io.load_torch_ngp(pth)

    def flatten(prefix, node, out):
        if isinstance(node, dict):
            for k, v in node.items():
                flatten(f"{prefix}/{k}", v, out)
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                flatten(f"{prefix}/{i}", v, out)
        else:
            out[prefix] = np.asarray(node)
        return out

    a = flatten("", params, {})
    b = flatten("", re_params, {})
    assert set(a) == set(b), (
        f"roundtrip key mismatch: {set(a) ^ set(b)}")
    max_err = max(float(np.max(np.abs(a[k].astype(np.float64)
                                      - b[k].astype(np.float64))))
                  if a[k].size else 0.0 for k in a)
    report["pth_roundtrip"] = {
        "native": native, "pth": pth, "n_tensors": len(a),
        "bit_exact": max_err == 0.0, "max_abs_err": max_err,
        "seconds": time.time() - t0,
    }
    assert max_err == 0.0, f"pth roundtrip not bit-exact: {max_err}"

    # --- 2: physics sampling from the RE-IMPORTED params (the path a
    # reference user's checkpoint would take)
    cfg = PieNeRFConfig(
        bound=args.bound, sub_res=args.sub_res,
        density_threshold=args.density_threshold,
        sim_dx=args.sim_dx, workspace=args.workspace,
        backbone="hashgrid").finalize()
    spec = network.make_spec(bound=args.bound, backbone="hashgrid")
    t0 = time.time()
    sampler = AdaptiveUniformSampling(cfg, re_params, spec)
    ply_path = os.path.join(args.workspace, "physics.ply")
    res = sampler.sample(write_path=ply_path)
    pts = res["points"]
    report["sampling"] = {
        "n_points": int(pts.shape[0]),
        "bbox_min": [float(v) for v in pts.min(0)],
        "bbox_max": [float(v) for v in pts.max(0)],
        "seconds": time.time() - t0,
    }
    assert pts.shape[0] > 200, "sampling produced a degenerate cloud"

    # annotate (the user's manual step, reference README.md:98-108):
    # pin the bottom cap, rubber-like moduli, uniform mass
    d = read_physics_ply(ply_path)
    n = d["pos"].shape[0]
    pin = (d["pos"][:, 2] < np.quantile(d["pos"][:, 2], 0.12)).astype(
        np.float64)
    write_ply(ply_path, d["pos"], vp=d["vp"], pin=pin,
              lam=np.full(n, 1e5), mu=np.full(n, 1e5),
              mass=np.full(n, 0.1))
    report["annotation"] = {"n_pinned": int(pin.sum())}

    # --- 3: the asset-validation chain (import -> distill -> image
    # agreement -> interactive FPS)
    report["asset"] = validate_asset.run(
        pth, ply_path, args.out + ".asset.json", bound=args.bound,
        H=args.H, W=args.W, distill_steps=args.distill_steps,
        student_width=args.student_width, sim_dx=args.sim_dx)

    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"chain_summary": {
        "train_final_psnr": report.get("train", {}).get("final_eval_psnr"),
        "roundtrip_bit_exact": report["pth_roundtrip"]["bit_exact"],
        "n_physics_points": report["sampling"]["n_points"],
        "distill_image_psnr": report["asset"]["image_agreement"][
            "psnr_mean"],
        "interactive_fps": report["asset"]["interactive"]["fps"],
    }}))


if __name__ == "__main__":
    main()
