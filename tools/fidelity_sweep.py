"""Bend fidelity vs deformation magnitude (round-4 review item 4).

BENCH reports fused-vs-exact under the bench's spring-drag pose (87.8 dB);
the committed trained-field golden measures the SAME kernel at 42 dB under
an amp-0.6 twist at 256x256. This tool characterizes the fidelity-vs-
deformation curve with `render_frame_exact` as oracle (same analytic
twist family as tests/test_trained_golden.py, trained checkpoint, f32)
and, at the worst amplitude, prices the candidate levers:

  wn128         bend_window 64 -> 128 (window slot capacity)
  reach2x       bend_reach doubled (+ beam_margin to match)
  cap           ips_per_tile 256 -> 512, bin_capacity 8 -> 16
  newton3       max_iter_num 1 -> 3 in BOTH paths (shared-approximation
                check: if exact(iter=3) vs exact(iter=1) is large, the
                Newton single-step is a real error source the comparison
                otherwise cancels out)

Reference bending semantics: raymarching.cu:1122-1371.

    python tools/fidelity_sweep.py --H 256 --out runs/fidelity_sweep.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def twist_state(amp, dx=0.08, r0=0.45):
    c = np.arange(-r0, r0 + 1e-6, dx, dtype=np.float32)
    xx, yy, zz = np.meshgrid(c, c, c, indexing="ij")
    p_ori = np.stack([xx.ravel(), yy.ravel(), zz.ravel()], 1)
    p_ori = p_ori[np.linalg.norm(p_ori, axis=1) <= r0]
    ang = amp * p_ori[:, 1]
    ca, sa = np.cos(ang), np.sin(ang)
    p_def = np.stack([
        ca * p_ori[:, 0] + sa * p_ori[:, 2],
        p_ori[:, 1],
        -sa * p_ori[:, 0] + ca * p_ori[:, 2],
    ], 1).astype(np.float32)
    n = p_ori.shape[0]
    F = np.zeros((n, 3, 3), np.float32)
    F[:, 0, 0] = ca; F[:, 0, 2] = sa
    F[:, 1, 1] = 1.0
    F[:, 2, 0] = -sa; F[:, 2, 2] = ca
    dF = np.zeros((n, 3, 3, 3), np.float32)
    dF[:, 0, 0, 1] = -amp * sa; dF[:, 0, 2, 1] = amp * ca
    dF[:, 2, 0, 1] = -amp * ca; dF[:, 2, 2, 1] = -amp * sa
    return p_ori, p_def, F, dF, dx


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--H", type=int, default=256)
    ap.add_argument("--amps", default="0.0,0.15,0.3,0.45,0.6,0.8,1.0")
    ap.add_argument("--out", default="runs/fidelity_sweep.json")
    ap.add_argument("--levers", action="store_true",
                    help="also price the candidate levers at the worst amp")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pienerf_tpu.io import checkpoint as ckpt_io
    from pienerf_tpu.models import network
    from pienerf_tpu.ops import beam_bend
    from pienerf_tpu.ops.pallas import field_kernel
    from pienerf_tpu.render import interactive

    H = W = args.H
    tree, _ = ckpt_io.load_native(
        "runs/quality_mlp_800/checkpoints/ngp_ep0015.npz")
    params = tree.get("ema_params", tree.get("params", tree))
    nf = (params["sigma_net"][0].shape[0] // 3 - 1) // 2
    spec = network.make_spec(bound=1.0, backbone="mlp",
                             compute_dtype="float32", n_freqs=nf,
                             num_layers=len(params["sigma_net"]))
    pw = field_kernel.pack_weights(params, spec)

    intr = (1.2 * H, 1.2 * H, W / 2.0, H / 2.0)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = (0, 0, -2.5)
    pose_j = jnp.asarray(pose)

    def ps(a, b):
        mse = float(np.mean((a.astype(np.float64)
                             - b.astype(np.float64)) ** 2))
        return round(10.0 * np.log10(1.0 / max(mse, 1e-12)), 2)

    def render(amp, overrides=None, exact=False, newton=1):
        p_ori, p_def, F, dF, dx = twist_state(amp)
        bst = beam_bend.BeamBendSettings(
            num_seek_ip=3, max_iter_num=newton, ip_dx=1.05 * dx,
            ips_per_tile=256, bin_capacity=8)
        if overrides:
            bst = bst._replace(**{k: v for k, v in overrides.items()
                                  if k in bst._fields})
        ist = interactive.InteractiveSettings(
            spec=spec, bend=bst, tile=16, samples=128, active_frac=1.0,
            tile_chunk=16, min_near=0.05, tighten_sampling=False)
        if overrides:
            ist = ist._replace(**{k: v for k, v in overrides.items()
                                  if k in ist._fields and k != "bend"})
        if exact:
            out = interactive.render_frame_exact(
                ist, pw, jnp.asarray(p_def), jnp.asarray(p_ori),
                jnp.asarray(F), jnp.asarray(dF), pose_j, intr, H, W,
                jnp.float32(1.0))
            return interactive.tiles_to_image(
                np.asarray(out["tiles_image"], np.float32), H, W), {}
        pack = beam_bend.pack_ip_data_fast(
            jnp.asarray(p_def), jnp.asarray(p_ori), jnp.asarray(F),
            jnp.asarray(dF))
        out = interactive.render_frame_fused(
            ist, pw, pack, jnp.asarray(p_def), pose_j, intr, H, W,
            jnp.float32(1.0))
        drops = {k: int(out[k]) for k in
                 ("dropped_beam", "dropped_window", "n_tile_overflow")}
        return interactive.tiles_to_image(
            np.asarray(out["tiles_image"], np.float32), H, W), drops

    amps = [float(a) for a in args.amps.split(",")]
    rows = []
    worst = (1e9, None)
    for amp in amps:
        t0 = time.time()
        img_exact, _ = render(amp, exact=True)
        img_fused, drops = render(amp)
        p = ps(img_fused, img_exact)
        row = {"amp": amp, "psnr_vs_exact": p, "drops": drops,
               "wall_s": round(time.time() - t0, 1)}
        rows.append(row)
        print(f"# {row}", file=sys.stderr, flush=True)
        if p < worst[0]:
            worst = (p, amp)

    res = {"H": H, "sweep": rows, "worst_amp": worst[1],
           "worst_psnr": worst[0]}

    if args.levers:
        amp = worst[1]
        img_exact, _ = render(amp, exact=True)
        levers = {}
        for tag, ov in (
            ("wn128", {"bend_window": 128}),
            ("reach2x", {"bend_reach": 4.2 * 0.08,
                         "beam_margin": 4.2 * 0.08}),
            ("cap", {"ips_per_tile": 512, "bin_capacity": 16}),
        ):
            img, drops = render(amp, overrides=ov)
            levers[tag] = {"psnr_vs_exact": ps(img, img_exact),
                           "drops": drops}
            print(f"# lever {tag}: {levers[tag]}", file=sys.stderr,
                  flush=True)
        # shared-approximation check: Newton depth moves BOTH paths
        img_exact3, _ = render(amp, exact=True, newton=3)
        img3, drops3 = render(amp, newton=3)
        levers["newton3"] = {
            "exact3_vs_exact1": ps(img_exact3, img_exact),
            "fused3_vs_exact3": ps(img3, img_exact3),
            "drops": drops3}
        print(f"# lever newton3: {levers['newton3']}", file=sys.stderr,
              flush=True)
        res["levers_at_worst"] = levers

    print(json.dumps(res))
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(res, fh, indent=1)


if __name__ == "__main__":
    main()
