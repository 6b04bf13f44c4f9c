"""Decompose the fused-vs-exact 38.2 dB gap (BENCH_r03) by error channel.

BENCH_r03 reports dropped_window = 0 at the bench state, so the round-3
"centered truncation" theory cannot be the active error source. The live
hypotheses, each priced here on the bench's deterministic fidelity state
(5 fixed pushes from rest, trained checkpoint, f32, K=128, tighten off):

  H1 lateral coverage: beam_margin (0.08) < bend reach (2*ip_dx = 0.105),
     so IPs within reach of edge-of-beam samples never enter the tile's
     candidate list.  Probe: fused with beam_margin == reach.
  H2 slot occupancy: the oracle's global 3-NN can include IPs beyond the
     window reach; they are (almost always) Newton-rejected, but they
     OCCUPY blend slots — the windowed kernel promotes nearer accepted
     IPs into those slots and blends MORE than the oracle.  Probes:
     (a) oracle re-run with nn_radius = reach (how much of the gap is
     pure slot semantics), (b) fused with reach/margin/Wn scaled up so
     the window contains the global top-3 for every sample that matters
     (nearest accepted IP within ~reach => top-3 within ~reach + 2*dx).

Writes the probe frames to /tmp/fid_decomp/ and prints one JSON line.
Usage: python tools/fidelity_decomp.py [--rlim] [--wide-only]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rlim", action="store_true",
                    help="also render the radius-limited oracle (~5 min)")
    ap.add_argument("--skip-base", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pienerf_tpu.io import checkpoint as ckpt_io
    from pienerf_tpu.models import network
    from pienerf_tpu.ops import beam_bend
    from pienerf_tpu.ops.pallas import field_kernel
    from pienerf_tpu.render import interactive
    from pienerf_tpu.sim import solver as sim

    on_tpu = jax.devices()[0].platform != "cpu"
    H = W = 800 if on_tpu else 64

    # --- bench scene + deterministic fidelity state (bench.py)
    r0, dx = 0.45, 0.05 if on_tpu else 0.1
    c = np.arange(-r0, r0 + 1e-6, dx)
    xx, yy, zz = np.meshgrid(c, c, c, indexing="ij")
    pts = np.stack([xx.ravel(), yy.ravel(), zz.ravel()], 1)
    pts = pts[np.linalg.norm(pts, axis=1) <= r0]
    n = pts.shape[0]
    is_pin = pts[:, 2] < -0.3
    consts, state, _ = sim.sim_init(
        pts, np.full(n, 0.1), np.full(n, 1e5), np.full(n, 1e5),
        is_pin, dt=1e-2, iters=10,
        bbox=np.array([2.0, 2.0, 2.0]), kres=7, dx=dx,
        gravity=(0.0, 0.0, 0.0), stiff=1e5,
        base=np.array([-1.0, -1.0, -1.0]))

    tree, _ = ckpt_io.load_native(
        "runs/quality_mlp_800/checkpoints/ngp_ep0015.npz")
    params = tree.get("ema_params", tree.get("params", tree))
    nf = (params["sigma_net"][0].shape[0] // 3 - 1) // 2
    spec32 = network.make_spec(bound=1.0, backbone="mlp",
                               compute_dtype="float32", n_freqs=nf,
                               num_layers=len(params["sigma_net"]))
    pw32 = field_kernel.pack_weights(params, spec32)

    intr = (1.2 * H, 1.2 * H, W / 2, H / 2)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = (0, 0, -2.5)
    pose_j = jnp.asarray(pose)

    force_vid = jnp.int32(int(np.argmax(np.asarray(consts.ip_pos)[:, 2])))

    @jax.jit
    def push(st):
        f = jnp.asarray([2e3, 0.0, 0.0], jnp.float32)
        st = sim.update_force(consts, st, force_vid, f)
        return sim.sim_step(consts, st)

    for _ in range(5):
        state = push(state)
    p_def, F, dF = sim.get_ip_info(consts, state)
    pack_fast = beam_bend.pack_ip_data_fast(
        p_def, consts.ip_pos.astype(jnp.float32), F, dF)

    bst = beam_bend.BeamBendSettings(
        num_seek_ip=3, max_iter_num=1, ip_dx=1.05 * dx,
        ips_per_tile=256, bin_capacity=8)
    ist = interactive.InteractiveSettings(
        spec=spec32, bend=bst, tile=16, samples=128, active_frac=0.5,
        tile_chunk=32, min_near=0.05, tighten_sampling=False)
    reach = beam_bend.reach_of(bst)

    # --- cached exact oracle (bench.py artifact)
    oracle_path = f"runs/bench_oracle_{H}_K{ist.samples}_{n}ip.npz"
    if os.path.exists(oracle_path):
        z = np.load(oracle_path)
        img_exact = z["img"].astype(np.float32)
        print(f"# oracle from cache ({z['meta']})", file=sys.stderr)
    else:
        out = interactive.render_frame_exact(
            ist, pw32, p_def, consts.ip_pos.astype(jnp.float32), F, dF,
            pose_j, intr, H, W, jnp.float32(1.0))
        img_exact = interactive.tiles_to_image(
            np.asarray(out["tiles_image"]), H, W)

    def ps(a, b):
        mse = float(np.mean((a - b) ** 2))
        return round(10.0 * np.log10(1.0 / max(mse, 1e-12)), 2)

    def fused(tag, **overrides):
        bst2 = bst._replace(**{k: v for k, v in overrides.items()
                               if k in beam_bend.BeamBendSettings._fields})
        ist2 = ist._replace(
            bend=bst2, **{k: v for k, v in overrides.items()
                          if k in interactive.InteractiveSettings._fields})
        t0 = time.time()
        out = interactive.render_frame_fused(
            ist2, pw32, pack_fast, p_def, pose_j, intr, H, W,
            jnp.float32(1.0))
        img = interactive.tiles_to_image(np.asarray(out["tiles_image"]),
                                         H, W)
        drops = {k: int(out[k]) for k in
                 ("dropped_beam", "dropped_window", "n_tile_overflow")}
        res[tag] = {"psnr_vs_exact": ps(img, img_exact), "drops": drops,
                    "wall_s": round(time.time() - t0, 1)}
        np.savez_compressed(f"/tmp/fid_decomp/{tag}.npz",
                            img=img.astype(np.float16))
        print(f"# {tag}: {res[tag]}", file=sys.stderr)
        return img

    os.makedirs("/tmp/fid_decomp", exist_ok=True)
    res = {}
    np.savez_compressed("/tmp/fid_decomp/exact.npz",
                        img=img_exact.astype(np.float16))

    if not args.skip_base:
        fused("base")                                  # expect ~38.2
    fused("h1_margin", beam_margin=float(reach))       # lateral coverage
    # H2: window covers global-top-3 reach (~reach + 2*dx); margin too
    wide = float(reach + 2.0 * dx)
    fused("h2_wide", beam_margin=wide, bend_reach=wide, bend_window=128,
          ips_per_tile=320)
    # intermediate: wide reach, same Wn (prices the Wn cost alone)
    fused("h2_wide_wn64", beam_margin=wide, bend_reach=wide,
          ips_per_tile=320)

    if args.rlim:
        out = interactive.render_frame_exact(
            ist, pw32, p_def, consts.ip_pos.astype(jnp.float32), F, dF,
            pose_j, intr, H, W, jnp.float32(1.0),
            nn_radius=jnp.float32(reach))
        img_rlim = interactive.tiles_to_image(
            np.asarray(out["tiles_image"]), H, W)
        np.savez_compressed("/tmp/fid_decomp/exact_rlim.npz",
                            img=img_rlim.astype(np.float16))
        res["oracle_rlim_vs_exact"] = ps(img_rlim, img_exact)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
