"""Headline benchmark: coupled sim + deformed-render FPS at 800x800.

Mirrors BASELINE.json config 3 (the chair interactive demo:
--max_iter_num 1 --num_seek_IP 3 --sim_dx 0.05, 800x800). No scene assets
ship with either repo, so the standard synthetic sphere scene provides an
equivalent-compute stand-in: ~3k integration points at sim_dx=0.05, Q-GMLS
implicit stepping, tile-beam quadratic bending, fused Pallas
bend+field+composite tile kernel per frame (the gather-free TPU flagship
path — PERF.md). A constant drag force is applied at one IP so the bench
exercises update_force + real deformation every frame (round-1 weakness #8).

Reference baseline: the CUDA implementation's interactive budget is 80 ms/
frame at dynamically-DOWNSCALED resolution (reference nerf/gui.py:606-611,
i.e. 12.5 FPS below 800x800, floor 1/4 scale); we report FPS at full
800x800 against that 12.5 FPS target.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extras"}
(extras: solver steps/s and capacity-drop counters per BASELINE.md axes).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from pienerf_tpu.models import network
    from pienerf_tpu.ops import beam_bend
    from pienerf_tpu.ops.pallas import field_kernel
    from pienerf_tpu.render import interactive, pipeline
    from pienerf_tpu.sim import solver as sim

    on_tpu = jax.devices()[0].platform != "cpu"
    H = W = 800 if on_tpu else 64
    n_frames = 20 if on_tpu else 2

    # --- scene: sphere point cloud at the chair demo's sim_dx
    r0, dx = 0.45, 0.05 if on_tpu else 0.1
    c = np.arange(-r0, r0 + 1e-6, dx)
    xx, yy, zz = np.meshgrid(c, c, c, indexing="ij")
    pts = np.stack([xx.ravel(), yy.ravel(), zz.ravel()], 1)
    pts = pts[np.linalg.norm(pts, axis=1) <= r0]
    n = pts.shape[0]

    # pinned bottom cap, as the chair demo pins its legs (README.md:98-108:
    # the user annotates `pin` in the physics PLY). An unpinned body under
    # sustained force is a free body that drifts out of the domain and
    # overflows f32 within ~60 frames (tools/diverge_probe.py; identical in
    # f64, i.e. physics not precision).
    is_pin = pts[:, 2] < -0.3
    consts, state, aux = sim.sim_init(
        pts, np.full(n, 0.1), np.full(n, 1e5), np.full(n, 1e5),
        is_pin, dt=1e-2, iters=10,
        bbox=np.array([2.0, 2.0, 2.0]), kres=7, dx=dx,
        gravity=(0.0, 0.0, 0.0), stiff=1e5,
        base=np.array([-1.0, -1.0, -1.0]),
    )
    state_init = state   # rest state for the deterministic fidelity frame

    # field: the committed 30k-iter quality-run checkpoint when present
    # (real geometry -> realistic early-termination behavior; this is what
    # a user actually renders), random init as fallback so the bench is
    # self-contained on a bare clone.
    spec = network.make_spec(bound=1.0, backbone="mlp",
                             compute_dtype="bfloat16")
    ckpt = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "runs/quality_mlp_800/checkpoints/ngp_ep0015.npz")
    if os.path.exists(ckpt):
        from pienerf_tpu.io import checkpoint as ckpt_io
        tree, _ = ckpt_io.load_native(ckpt)
        params = tree.get("ema_params", tree.get("params", tree))
        field_src = "trained (runs/quality_mlp_800)"
        summ = os.path.join(os.path.dirname(ckpt), "..", "summary.json")
        if os.path.exists(summ):
            # tolerate schema drift / partial writes: a malformed summary
            # must not kill the headless bench (ADVICE r4)
            try:
                with open(summ) as fh:
                    s = json.load(fh)
                field_src = (f"trained (runs/quality_mlp_800, {s['iters']} "
                             f"iters, {s['final_psnr']:.1f} dB held-out)")
            except (KeyError, ValueError, OSError):
                pass
        # adopt the checkpoint's arch (4-layer sigma net, n_freqs from
        # the input width) so pack_weights matches
        nf = (params["sigma_net"][0].shape[0] // 3 - 1) // 2
        spec = network.make_spec(
            bound=1.0, backbone="mlp", compute_dtype="bfloat16",
            n_freqs=nf, num_layers=len(params["sigma_net"]))
    else:
        params = network.init_params(jax.random.PRNGKey(0), spec)
        field_src = "random-init"

    pw = field_kernel.pack_weights(params, spec)

    bst = beam_bend.BeamBendSettings(
        num_seek_ip=3, max_iter_num=1, ip_dx=1.05 * dx,
        ips_per_tile=256, bin_capacity=8,
    )
    # round-3 default operating point: K=128 + tightened spans (PERF.md
    # trained-field frontier: 34.9 dB vs dense at ~59 FPS)
    ist = interactive.InteractiveSettings(
        spec=spec, bend=bst, tile=16, samples=128, active_frac=0.5,
        tile_chunk=32, min_near=0.05, tighten_sampling=True,
    )
    intr = (1.2 * H, 1.2 * H, W / 2, H / 2)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = (0, 0, -2.5)
    pose_j = jnp.asarray(pose)

    # drag one IP every frame with the GUI's SPRING force law
    # f = k (target - p_ip), clamped (reference nerf/gui.py:570-576:
    # 1e5 * scale * (target - IP), |f| <= 5e5). The spring is self-limiting,
    # so the sim reaches a deformed equilibrium instead of accumulating
    # energy without bound (a constant push diverges the solver after ~60
    # frames and NaN frames render as empty background — which would
    # silently inflate FPS; finiteness is asserted per repetition below).
    # The target orbits the rest position so the state keeps evolving and
    # no frame is a cached fixed point (PERF.md measurement discipline).
    # drag the topmost IP; spring constant = the reference's 1e5 (stable
    # with visible ~0.15 deformation; 3e5 diverges — tools/diverge_probe.py)
    force_vid = jnp.int32(int(np.argmax(np.asarray(consts.ip_pos)[:, 2])))
    vid_kernel = consts.IP_kernel[force_vid]
    vid_nx = consts.IP_Nx[force_vid]
    vid_rest = consts.ip_pos[force_vid]
    spring_k = jnp.float32(1e5)

    @jax.jit
    def frame(st, fi):
        p_ip = vid_rest + jnp.einsum("ia,iad->d", vid_nx,
                                     st.ddof[vid_kernel])
        ang = 0.25 * fi
        target = vid_rest + 0.25 * jnp.stack(
            [jnp.cos(ang), jnp.sin(ang), jnp.float32(0.0)])
        f = jnp.clip(spring_k * (target - p_ip), -5e5, 5e5)
        return pipeline.interactive_frame_step(
            ist, consts, st, pw, pose_j, intr, H, W, jnp.float32(1.0),
            force_vid, f)

    state, out = frame(state, jnp.float32(0))   # compile + warm, full sync
    _ = float(jnp.sum(out["tiles_image"]))
    drops = {k: int(out[k]) for k in
             ("dropped_beam", "dropped_window", "n_tile_overflow")}

    # pipelined steady state: frames chain through sim state; one final sync
    # (a GUI displays frames asynchronously the same way). Every frame's
    # compute is forced because frame N+1 depends on frame N's state and the
    # accumulated image is fetched at the end. The hosted TPU tunnel shows
    # >2x minute-scale throughput variance (PERF.md), so take the median of
    # three repetitions.
    fps_reps = []
    fi = 1
    for _ in range(3 if on_tpu else 1):
        t0 = time.perf_counter()
        acc = None
        for _ in range(n_frames):
            state, out = frame(state, jnp.float32(fi))
            fi += 1
            acc = (out["tiles_image"] if acc is None
                   else acc + out["tiles_image"])
        _ = float(jnp.sum(acc))
        fps_reps.append(n_frames / (time.perf_counter() - t0))
        # honesty guard: a diverged sim renders empty frames at ~0 cost
        assert bool(jnp.isfinite(state.ddof).all()), "sim diverged mid-bench"
        assert int(out["n_active"]) > 0, "empty frame mid-bench"
    fps = float(np.median(fps_reps))

    # solver-only throughput (BASELINE.md axis 2). The force is perturbed
    # per repetition so the state keeps evolving — a converged fixed point
    # times ~8x faster through the tunnel (result coalescing), which would
    # flatter the number (PERF.md measurement discipline).
    @jax.jit
    def sim_loop(st, fi0, r):
        def body(i, s):
            p_ip = vid_rest + jnp.einsum("ia,iad->d", vid_nx,
                                         s.ddof[vid_kernel])
            ang = 0.25 * (fi0 + i)
            target = vid_rest + 0.25 * jnp.stack(
                [jnp.cos(ang), jnp.sin(ang), jnp.float32(0.0)])
            f = jnp.clip(spring_k * (target - p_ip), -5e5, 5e5)
            s = sim.update_force(consts, s, force_vid, f)
            return sim.sim_step(consts, s)
        return jax.lax.fori_loop(0, r, body, st)

    st2 = sim_loop(state, jnp.float32(fi), 5)
    jax.block_until_ready(st2.ddof)
    rates = []
    for rep in range(3):
        t0 = time.perf_counter()
        st2 = sim_loop(st2, jnp.float32(fi + 5 + 50 * rep), 50)
        _ = float(jnp.sum(st2.ddof))
        rates.append(50 / (time.perf_counter() - t0))
    steps_per_s = float(np.median(rates))
    assert bool(jnp.isfinite(st2.ddof).all()), "sim diverged in solver bench"

    # fidelity: the fused production frame vs the EXACT-bending oracle
    # (render_frame_exact: brute-force 3-NN over ALL IPs on the identical
    # tile/sample lattice — strictly stronger than the reference's 27-cell
    # hash walk, raymarching.cu:986-1119). Round 2 compared against the
    # XLA tile path at exhaustive caps instead; that reference shared the
    # fused path's bin-halo defect and was itself the LESS accurate path
    # (PERF.md "Bend fidelity"), so its number flattered nothing but
    # couldn't be trusted either way. Both sides f32 at matched sampling
    # (tighten off — the oracle marches the full tile span): the axis
    # prices the approximate candidate selection ONLY; quadrature is
    # priced by tools/k_frontier.py, precision measured separately
    # (78 dB, tools/fidelity_diag.py).
    # The comparison state is DETERMINISTIC and decoupled from the FPS
    # loop above (5 fixed-force sim steps from rest), so the oracle frame
    # — ~5 min of brute-force compute — can be cached as a committed
    # artifact (runs/bench_oracle_*.npz, regenerated by deleting the
    # file). The oracle depends only on the sim/field/oracle code paths,
    # never on the fused kernel under test.
    spec32 = spec._replace(compute_dtype="float32")
    pw32 = field_kernel.pack_weights(params, spec32)
    ist_nt = ist._replace(tighten_sampling=False, spec=spec32)

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
        ist_nt, pw32, pack_fast, p_def, pose_j, intr, H, W,
        jnp.float32(1.0))
    img_f = interactive.tiles_to_image(
        np.asarray(out_f["tiles_image"]), H, W)

    oracle_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        f"runs/bench_oracle_{H}_K{ist.samples}_{n}ip.npz")
    # the cache key must pin the WEIGHTS, not just the checkpoint path —
    # regenerating the quality run would otherwise silently pair new
    # weights with the old oracle frame
    leaves = jax.tree_util.tree_leaves(params)
    whash = hex(abs(hash(tuple(
        float(np.asarray(l).ravel()[0]) for l in leaves))) % (1 << 48))
    meta = f"{field_src}|w{whash}|seek3|5push"
    img_x = None
    if os.path.exists(oracle_path):
        z = np.load(oracle_path)
        if str(z["meta"]) == meta:
            img_x = z["img"].astype(np.float32)
        else:
            # stale (weights changed since the cache was rendered):
            # regenerate instead of asserting — the driver runs bench
            # headless and must always get its JSON line
            print(f"[bench] stale oracle cache ({z['meta']} != {meta}); "
                  f"re-rendering", file=sys.stderr)
    if img_x is None:
        out_x = interactive.render_frame_exact(
            ist_nt, pw32, p_def, consts.ip_pos.astype(jnp.float32), F, dF,
            pose_j, intr, H, W, jnp.float32(1.0))
        assert int(out_x["n_active"]) == int(out_f["n_active"])
        img_x = interactive.tiles_to_image(
            np.asarray(out_x["tiles_image"]), H, W)
        np.savez_compressed(oracle_path, img=img_x.astype(np.float16),
                            meta=meta)
    mse = float(np.mean((img_x.astype(np.float32) - img_f) ** 2))
    psnr = float(10.0 * np.log10(1.0 / max(mse, 1e-12)))

    # Reference interactive setpoint: 80 ms/frame at 1/4-downscaled
    # resolution (nerf/gui.py:606-611) = 12.5 FPS at ~400x400. Compare by
    # pixel throughput at each system's interactive operating point.
    baseline_px_rate = 12.5 * (400 * 400)
    ours_px_rate = fps * (H * W)

    # worst point of the committed deformation-amplitude sweep (PERF.md
    # "fidelity vs deformation magnitude"): the headline psnr above is one
    # pose; this carries the hardest measured pose next to it (r4 review).
    worst = None
    sweep_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "runs/fidelity_sweep_r5.json")
    try:
        with open(sweep_path) as fh:
            sw = json.load(fh)
        worst = (f"{sw['worst_psnr']:.1f} dB vs exact at twist amp "
                 f"{sw['worst_amp']} (256^2, tools/fidelity_sweep.py)")
    except (KeyError, ValueError, OSError):
        pass

    print(json.dumps({
        "metric": f"coupled sim+deformed-render FPS @ full {H}x{W} "
                  f"(sphere stand-in for chair demo, num_seek_IP=3, pinned "
                  f"base + GUI spring-force drag k=1e5; vs_baseline = "
                  f"pixel-rate ratio vs reference's 12.5 FPS at its "
                  f"1/4-downscale interactive setpoint)",
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(ours_px_rate / baseline_px_rate, 3),
        "extras": {
            "solver_steps_per_s": round(steps_per_s, 1),
            "capacity_drops_frame0": drops,
            "fused_vs_exact_bend_psnr": round(psnr, 2),
            "worst_amplitude_fidelity": worst,
            "field": field_src,
            "operating_point": ("K=128 + tightened spans + reach-scaled "
                                "bend windows + f32-HIGHEST candidate "
                                "fetch (default)"),
        },
    }))


if __name__ == "__main__":
    main()
