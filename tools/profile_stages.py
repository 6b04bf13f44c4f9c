"""Per-stage TPU profiling for the coupled frame (round-2 perf work).

Timing discipline (PERF.md): chain distinct inputs through state, force a
scalar host fetch at the end of each timed region, report median of reps.
Run directly on the real chip: `python tools/profile_stages.py [stage...]`.
"""

from __future__ import annotations

import sys
import time

import numpy as np


def timed(fn, state, n=8, reps=3):
    """Median seconds per call; fn: state -> state (chained, distinct)."""
    s = fn(state)  # compile/warm
    import jax
    jax.block_until_ready(jax.tree_util.tree_leaves(s)[0])
    outs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        cur = s
        for _ in range(n):
            cur = fn(cur)
        # force: fetch a scalar derived from the final state
        _ = float(np.asarray(jax.tree_util.tree_leaves(cur)[0]).ravel()[0])
        outs.append((time.perf_counter() - t0) / n)
        s = cur
    return float(np.median(outs))


def main():
    import jax
    import jax.numpy as jnp

    from pienerf_tpu.models import network
    from pienerf_tpu.ops import beam_bend
    from pienerf_tpu.ops.pallas import field_kernel
    from pienerf_tpu.render import interactive
    from pienerf_tpu.sim import solver as sim

    which = set(sys.argv[1:]) or {"sim", "render", "field", "bend"}
    print("platform:", jax.devices()[0].platform)

    # --- scene (same as bench.py)
    r0, dx = 0.45, 0.05
    c = np.arange(-r0, r0 + 1e-6, dx)
    xx, yy, zz = np.meshgrid(c, c, c, indexing="ij")
    pts = np.stack([xx.ravel(), yy.ravel(), zz.ravel()], 1)
    pts = pts[np.linalg.norm(pts, axis=1) <= r0]
    n = pts.shape[0]
    print(f"scene: {n} pts")

    consts, state, aux = sim.sim_init(
        pts, np.full(n, 0.1), np.full(n, 1e5), np.full(n, 1e5),
        np.zeros(n, bool), dt=1e-2, iters=10,
        bbox=np.array([2.0, 2.0, 2.0]), kres=7, dx=dx,
        gravity=(0.0, 0.0, 0.0), stiff=1e5,
        base=np.array([-1.0, -1.0, -1.0]),
    )
    n_ip = consts.ip_pos.shape[0]
    n_k = consts.dof_rest.shape[0]
    print(f"nIP={n_ip} nK={n_k}")

    if "sim" in which:
        t = timed(lambda s: sim.sim_step(consts, s), state)
        print(f"sim_step (10 iters): {t*1e3:.2f} ms")

        # breakdown: single components, chained via a counter trick
        @jax.jit
        def f_only(s):
            F = sim.deformation_gradients(consts, s.ddof)
            return s._replace(dof_f=s.dof_f + 1e-12 * jnp.sum(F))

        @jax.jit
        def elastic_only(s):
            r = sim.rhs_elastic_delta(consts, s.ddof)
            return s._replace(dof_f=s.dof_f + 1e-12 * r)

        @jax.jit
        def matmul_only(s):
            dim = n_k * 10
            r = (consts.global_inv @ s.ddof.reshape(dim, 3)).reshape(n_k, 10, 3)
            return s._replace(dof_f=s.dof_f + 1e-12 * r)

        @jax.jit
        def gather_only(s):
            g = s.ddof[consts.IP_kernel]
            return s._replace(dof_f=s.dof_f + 1e-12 * jnp.sum(g))

        for name, fn in [("  F einsum (1x)", f_only),
                         ("  elastic rhs full (1x)", elastic_only),
                         ("  global_inv matmul (1x)", matmul_only),
                         ("  ddof gather (1x)", gather_only)]:
            t = timed(fn, state)
            print(f"{name}: {t*1e3:.3f} ms")

    # --- render setup
    spec = network.make_spec(bound=1.0, backbone="mlp",
                             compute_dtype="bfloat16")
    params = network.init_params(jax.random.PRNGKey(0), spec)
    pw = field_kernel.pack_weights(params, spec)
    bst = beam_bend.BeamBendSettings(num_seek_ip=3, max_iter_num=1,
                                     ip_dx=1.05 * dx)
    ist = interactive.InteractiveSettings(spec=spec, bend=bst, tile=16,
                                          samples=64, active_frac=0.5,
                                          tile_chunk=32, min_near=0.05)
    H = W = 800
    intr = (1.2 * H, 1.2 * H, W / 2, H / 2)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = (0, 0, -2.5)
    pose_j = jnp.asarray(pose)

    p_def, F, dF = jax.jit(sim.get_ip_info)(consts, state)
    pack = beam_bend.pack_for(bst, p_def, consts.ip_pos.astype(jnp.float32), F, dF)

    if "render" in which:
        def rframe(s):
            p_def, F, dF = sim.get_ip_info(consts, s)
            pk = beam_bend.pack_for(bst, p_def,
                                    consts.ip_pos.astype(jnp.float32), F, dF)
            out = interactive.render_frame(ist, pw, pk, p_def, pose_j, intr,
                                           H, W, jnp.float32(1.0))
            return s._replace(dof_f=s.dof_f + 1e-12 * jnp.sum(out["tiles_ws"]))

        t = timed(rframe, state, n=4)
        print(f"render_frame deformed 800x800: {t*1e3:.2f} ms")

        ist_nod = ist._replace(deformed=False)

        def rframe_nod(s):
            out = interactive.render_frame(
                ist_nod, pw, pack, p_def + 1e-9 * s.dof_f[0, 0, 0],
                pose_j, intr, H, W, jnp.float32(1.0))
            return s._replace(dof_f=s.dof_f + 1e-12 * jnp.sum(out["tiles_ws"]))

        t = timed(rframe_nod, state, n=4)
        print(f"render_frame static 800x800: {t*1e3:.2f} ms")

    if "field" in which:
        N = 8192 * 512  # ~4.2M samples
        key = jax.random.PRNGKey(0)
        xs = jax.random.uniform(key, (3, N), minval=-1, maxval=1)
        ds_ = jax.random.normal(key, (3, N))

        @jax.jit
        def feval(x):
            s, rgb = field_kernel.field_eval(pw, spec,
                                             (x[0], x[1], x[2]),
                                             (ds_[0], ds_[1], ds_[2]),
                                             block_n=8192)
            return x + 1e-12 * jnp.sum(s)

        t = timed(feval, xs, n=4)
        flops = N * 5 * 2 * 64 * 64
        print(f"field_eval {N/1e6:.1f}M samples: {t*1e3:.2f} ms "
              f"({flops/t/1e12:.1f} TFLOP/s)")

    if "bend" in which:
        # isolate bend_tile_samples at frame scale: C=32 chunk, replayed
        C, T2, K = 32, 256, 64
        tids = jnp.arange(C, dtype=jnp.int32) + 600
        o_, d = interactive._tile_rays(tids, ist, H, W, pose_j, intr)
        t0 = jnp.full((C,), 1.5)
        t1 = jnp.full((C,), 3.5)
        kk = (jnp.arange(K, dtype=jnp.float32) + 0.5) / K
        tvals = t0[:, None] + (t1 - t0)[:, None] * kk[None, :]
        xs = tuple(o_[i] + tvals[:, None, :] * d[i][:, :, None] for i in range(3))

        axis = jnp.stack([jnp.mean(d[i], axis=1) for i in range(3)], 1)
        axis = axis / jnp.linalg.norm(axis, axis=1, keepdims=True)
        origin = jnp.broadcast_to(o_, (C, 3))
        tan_half = jnp.full((C,), 16 * 0.75 / intr[0])

        cand, proj, m = beam_bend.select_tile_candidates(
            bst, pack, p_def, origin, axis, tan_half, t0, t1)
        bins = beam_bend.bin_candidates(bst, cand, proj, m, t0,
                                        (t1 - t0) / K, K + 2)

        @jax.jit
        def sel_only(x):
            cand, proj, m = beam_bend.select_tile_candidates(
                bst, pack, p_def, origin + 1e-12 * x[0][0, 0, 0], axis,
                tan_half, t0, t1)
            b = beam_bend.bin_candidates(bst, cand, proj, m, t0,
                                         (t1 - t0) / K, K + 2)
            return tuple(x[i] + 1e-12 * jnp.sum(b) for i in range(3))

        @jax.jit
        def bend_only(x):
            xm, found = beam_bend.bend_tile_samples(bst, bins, x)
            return tuple(x[i] + 1e-12 * xm[i] for i in range(3))

        n_chunks = 39  # ~full frame of active tiles
        t = timed(sel_only, xs, n=4)
        print(f"select+bin per chunk(32 tiles): {t*1e3:.2f} ms "
              f"(x{n_chunks} = {t*n_chunks*1e3:.1f} ms/frame)")
        t = timed(bend_only, xs, n=4)
        print(f"bend_tile_samples per chunk: {t*1e3:.2f} ms "
              f"(x{n_chunks} = {t*n_chunks*1e3:.1f} ms/frame)")


if __name__ == "__main__":
    main()
