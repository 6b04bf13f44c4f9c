"""Interactive frame rendering — the TPU flagship path.

One jitted function renders a full coupled frame:

  tile the image (16x16) -> tile activity vs the deformed bbox ->
  compact active tiles (ray data recomputed arithmetically from tile ids —
  no gathers) -> per-tile beam candidates + depth bins (ops/beam_bend) ->
  tile-uniform stratified samples -> gather-free bending -> fused Pallas
  field evaluation -> masked composite -> scatter tiles into the frame.

Design constraints this satisfies (PERF.md): zero per-sample random memory
access; all bulk math on MXU/VPU with batch dims minormost; static shapes
throughout (one compile per camera resolution + scene).
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pienerf_tpu.models import network
from pienerf_tpu.ops import beam_bend
from pienerf_tpu.ops.pallas import field_kernel, tile_kernel


class InteractiveSettings(NamedTuple):
    spec: network.NetworkSpec
    bend: beam_bend.BeamBendSettings
    tile: int = 16                 # tile side, pixels
    samples: int = 64              # K depth samples per ray (tile-uniform)
    active_frac: float = 0.5       # static capacity of active tiles
    tile_chunk: int = 32           # tiles processed per lax.map step
    min_near: float = 0.05
    density_scale: float = 1.0
    T_thresh: float = 1e-2
    deformed: bool = True
    cut: bool = False              # bend only inside cut_bounds; render the
    #                                rest statically (reference
    #                                raymarching.cu:1197-1212, y-typo fixed)
    bound: float = 1.0             # scene bound (cut mode ray extent)
    seg_samples: int = 8           # fused kernel: depth samples per MLP
    #                                segment (early-termination granularity;
    #                                must divide `samples`). Ablation at
    #                                800x800 (tools/micro_seg.py): 8 -> 41.1
    #                                FPS vs 16 -> 39.1 (finer termination
    #                                beats per-segment overhead), 32 -> 37.8
    bend_sub: int = 4              # fused kernel: depth samples per bend
    #                                sub-window (must divide seg_samples)
    tighten_sampling: bool = False  # fused kernel, deformed non-cut mode:
    #                                crop each tile's depth range to its
    #                                candidates' span (+3*ip_dx margin)
    #                                before distributing the K samples —
    #                                lossless (out-of-span samples are
    #                                provably unfound) and concentrates
    #                                quadrature on the object
    bend_window: int = 64          # fused kernel: Wn candidate rows per
    #                                bend sub-window. Must hold the
    #                                candidates within the bend reach of a
    #                                Ksb-deep sub-segment (overflow is
    #                                counted in dropped_window). 64 covers
    #                                the reach-scaled windows at default
    #                                density (tools/halo_sweep.py: zero
    #                                drops, ~9% FPS vs 32)
    prep_approx_topk: bool = False  # candidate compaction via the TPU's
    #                                approx_max_k (recall 0.95) instead of
    #                                exact top_k — ~3.5 ms/frame cheaper at
    #                                bench shape, but bin collisions drop
    #                                ~5% of candidates; fidelity cost vs
    #                                the exact oracle is priced in PERF.md
    gate_tiles: bool = True        # deformed non-cut mode: a tile is active
    #                                only if >=1 IP passes its beam gate
    #                                (beam_bend.count_in_beam — the same
    #                                test prep runs). LOSSLESS: a tile with
    #                                zero candidates provably renders as
    #                                background (every sample unfound ->
    #                                sigma = 0). Bbox-grazing tiles with no
    #                                nearby IPs stop burning kernel slots
    #                                (round-4 review item 3; priced in
    #                                PERF.md round-5 frame budget)
    cut_split: bool = True         # cut mode: partition tiles into
    #                                cut-box-intersecting (full bend kernel)
    #                                and static-only (bend-free kernel) and
    #                                render each class in its own pass. The
    #                                partition is EXACT — a tile whose rays
    #                                never enter cut_bounds cannot contain
    #                                a bending sample (round-5 trex
    #                                economics; priced in PERF.md)
    cut_static_frac: float = 0.95  # slot capacity of the static class as a
    #                                fraction of n_tiles (cut scenes are
    #                                mostly static tiles; overflow is
    #                                counted in n_tile_overflow).
    #                                active_frac sizes the bend class
    block_tiles: int = 1           # fused kernel: image tiles per Pallas
    #                                grid step (python-unrolled bodies over
    #                                one shared step). >1 amortizes the
    #                                per-step floor; measured neutral at the
    #                                bench point (PERF.md round-5 frame
    #                                budget), so the default keeps the
    #                                round-4 single-tile grid


def _tile_rays(tids, settings, H, W, pose, intrinsics):
    """Componentwise rays for tiles tids [C]: returns o [3], d (3 x [C, T2]).

    Pure arithmetic from the tile id — active-tile compaction needs no ray
    gathers."""
    ts = settings.tile
    fx, fy, cx, cy = intrinsics
    tiles_x = W // ts
    ty = tids // tiles_x
    tx = tids % tiles_x
    j = jnp.arange(ts * ts, dtype=jnp.int32)
    py = (ty[:, None] * ts + j[None, :] // ts).astype(jnp.float32) + 0.5
    px = (tx[:, None] * ts + j[None, :] % ts).astype(jnp.float32) + 0.5
    dx = (px - cx) / fx
    dy = (py - cy) / fy
    dz = jnp.ones_like(dx)
    nrm = jnp.sqrt(dx * dx + dy * dy + 1.0)
    cam = (dx / nrm, dy / nrm, dz / nrm)
    R = pose[:3, :3]
    d = tuple(R[i, 0] * cam[0] + R[i, 1] * cam[1] + R[i, 2] * cam[2]
              for i in range(3))
    o = pose[:3, 3]
    return o, d


def _near_far(o, d, bbmin, bbmax, min_near):
    """Componentwise slab test; misses -> (BIG, BIG)."""
    BIG = jnp.float32(3.4e38)
    near = None
    far = None
    for i in range(3):
        inv = 1.0 / d[i]
        ta = (bbmin[i] - o[i]) * inv
        tb = (bbmax[i] - o[i]) * inv
        lo = jnp.minimum(ta, tb)
        hi = jnp.maximum(ta, tb)
        near = lo if near is None else jnp.maximum(near, lo)
        far = hi if far is None else jnp.minimum(far, hi)
    miss = near > far
    near = jnp.maximum(near, min_near)
    return jnp.where(miss, BIG, near), jnp.where(miss, BIG, far)


def _tiles_with_candidates(st, p_def, o, d_all, near_all, far_all,
                           hit_tile, intrinsics):
    """Per-tile ``count_in_beam > 0`` over the whole frame (see
    InteractiveSettings.gate_tiles). Recomputes the SAME per-tile t0/t1
    and central axis the candidate prep derives for active slots, so a
    gated-out tile is exactly one prep would hand zero candidates."""
    thit = near_all < 1e30
    t0 = jnp.min(jnp.where(thit, near_all, jnp.inf), axis=1)
    t1 = jnp.max(jnp.where(thit, far_all, -jnp.inf), axis=1)
    t0 = jnp.where(hit_tile, t0, 1.0)
    t1 = jnp.where(hit_tile, jnp.maximum(t1, t0 + 1e-3), 1.001)
    ax = tuple(jnp.mean(d_all[i], axis=1) for i in range(3))
    an = jnp.sqrt(ax[0] ** 2 + ax[1] ** 2 + ax[2] ** 2)
    axis = jnp.stack([ax[i] / an for i in range(3)], axis=1)
    tan_half = jnp.float32(st.tile * 0.75 / intrinsics[0])
    n_cand = beam_bend.count_in_beam(
        st.bend, p_def, o, axis, tan_half, t0, t1)
    return n_cand > 0


@functools.partial(
    jax.jit,
    static_argnames=("settings", "H", "W"),
)
def render_frame(
    settings: InteractiveSettings,
    packed_w: jax.Array,
    ip_pack: jax.Array,            # [nIP, 48] (beam_bend.pack_ip_data)
    p_def: jax.Array,              # [nIP, 3]
    pose: jax.Array,               # [4, 4]
    intrinsics: Tuple[float, float, float, float],
    H: int,
    W: int,
    bg_color: jax.Array,
    cut_bounds: Optional[jax.Array] = None,   # [6] when settings.cut
) -> Dict[str, jax.Array]:
    st = settings
    ts = st.tile
    assert H % ts == 0 and W % ts == 0
    n_tiles = (H // ts) * (W // ts)
    T2 = ts * ts
    K = st.samples
    a_cap = int(n_tiles * st.active_frac)
    a_cap = max(st.tile_chunk, (a_cap // st.tile_chunk) * st.tile_chunk)

    marg = 1e-3
    if st.cut or not st.deformed:
        # cut mode marches the full scene box (bending applies inside
        # cut_bounds only, the rest renders statically); a STATIC frame
        # (deformed=False) must too — density exists anywhere in the
        # bound box, and p_def may be a placeholder
        bbmin = jnp.full((3,), -st.bound - marg, jnp.float32)
        bbmax = jnp.full((3,), st.bound + marg, jnp.float32)
    else:
        bbmin = jnp.min(p_def, axis=0) - marg
        bbmax = jnp.max(p_def, axis=0) + marg

    # --- tile activity via the tile's corner rays only (cheap proxy:
    #     test all rays of every tile is fine too; T2 per tile is small)
    all_tids = jnp.arange(n_tiles, dtype=jnp.int32)
    o, d_all = _tile_rays(all_tids, st, H, W, pose, intrinsics)
    near_all, far_all = _near_far(o, d_all, bbmin, bbmax, st.min_near)
    hit_tile = jnp.any(near_all < 1e30, axis=1)                # [n_tiles]
    if st.deformed and not st.cut and st.gate_tiles:
        hit_tile &= _tiles_with_candidates(
            st, p_def, o, d_all, near_all, far_all, hit_tile, intrinsics)

    rank = jnp.cumsum(hit_tile) - 1
    take = hit_tile & (rank < a_cap)
    act_ids = jnp.zeros((a_cap,), jnp.int32)
    act_ids = act_ids.at[jnp.where(take, rank, a_cap)].set(
        jnp.where(take, all_tids, 0), mode="drop")
    act_n = jnp.sum(take)
    act_mask = jnp.arange(a_cap) < act_n                       # [a_cap]

    # --- per-chunk processing
    n_chunks = a_cap // st.tile_chunk
    chunk_ids = act_ids.reshape(n_chunks, st.tile_chunk)
    chunk_mask = act_mask.reshape(n_chunks, st.tile_chunk)

    fx = intrinsics[0]
    tan_half = jnp.float32(ts * 0.75 / fx)    # beam half-width growth

    def process(chunk):
        tids, cmask = chunk
        C = st.tile_chunk
        o_, d = _tile_rays(tids, st, H, W, pose, intrinsics)
        near, far = _near_far(o_, d, bbmin, bbmax, st.min_near)
        thit = near < 1e30
        t0 = jnp.min(jnp.where(thit, near, jnp.inf), axis=1)
        t1 = jnp.max(jnp.where(thit, far, -jnp.inf), axis=1)
        any_hit = jnp.isfinite(t0) & cmask
        t0 = jnp.where(any_hit, t0, 1.0)
        t1 = jnp.where(any_hit, jnp.maximum(t1, t0 + 1e-3), 1.001)

        # central axis = mean ray dir (normalized)
        ax = tuple(jnp.mean(d[i], axis=1) for i in range(3))
        an = jnp.sqrt(ax[0] ** 2 + ax[1] ** 2 + ax[2] ** 2)
        axis = jnp.stack([ax[i] / an for i in range(3)], axis=1)  # [C, 3]
        origin = jnp.broadcast_to(o_, (C, 3))

        if st.deformed:
            cand, proj, m, dr_beam = beam_bend.select_tile_candidates(
                st.bend, ip_pack, p_def, origin, axis,
                jnp.broadcast_to(tan_half, (C,)), t0, t1,
                return_dropped=True)
            dt_bin = (t1 - t0) / K
            bins, dr_bin = beam_bend.bin_candidates(
                st.bend, cand, proj, m, t0, dt_bin,
                K + 2 * st.bend.halo_bins, return_dropped=True)
            dr_beam = jnp.sum(jnp.where(cmask, dr_beam, 0))
            dr_bin = jnp.sum(jnp.where(cmask, dr_bin, 0))
        else:
            dr_beam = dr_bin = jnp.int32(0)

        # tile-uniform stratified depth grid (deterministic centers)
        kk = (jnp.arange(K, dtype=jnp.float32) + 0.5) / K
        t = t0[:, None] + (t1 - t0)[:, None] * kk[None, :]     # [C, K]
        dt = ((t1 - t0) / K)[:, None]                          # [C, 1]

        xs = tuple(
            o_[i] + t[:, None, :] * d[i][:, :, None] for i in range(3)
        )                                                       # [C, T2, K]

        if st.deformed:
            xm, found = beam_bend.bend_tile_samples(st.bend, bins, xs)
            if st.cut:
                assert cut_bounds is not None
                cb = cut_bounds
                in_cut = (
                    (xs[0] > cb[0]) & (xs[0] < cb[1])
                    & (xs[1] > cb[2]) & (xs[1] < cb[3])
                    & (xs[2] > cb[4]) & (xs[2] < cb[5])
                )
                # outside cut_bounds: render the static scene unbent
                xm = tuple(jnp.where(in_cut, xm[i], xs[i]) for i in range(3))
                found = jnp.where(in_cut, found, True)
        else:
            xm, found = xs, jnp.ones(xs[0].shape, bool)

        # per-ray validity: sample must be inside this ray's [near, far]
        valid = found & (t[:, None, :] >= near[..., None]) \
            & (t[:, None, :] <= far[..., None]) & thit[..., None]

        flat = tuple(c.reshape(C * T2 * K) for c in xm)
        ds = tuple(jnp.broadcast_to(d[i][:, :, None],
                                    (C, T2, K)).reshape(-1) for i in range(3))
        sigma, rgb = field_kernel.field_eval(packed_w, st.spec, flat, ds,
                                             block_n=8192)
        sigma = (sigma * st.density_scale).reshape(C, T2, K)
        sigma = jnp.where(valid, sigma, 0.0)
        rgb = rgb.reshape(3, C, T2, K)

        # composite along K (batch-minormost: work on [C, T2, K])
        tau = sigma * dt[:, None, :]
        cum = jnp.cumsum(tau, axis=-1)
        T_excl = jnp.exp(-(cum - tau))
        alpha = 1.0 - jnp.exp(-tau)
        T_prev = jnp.concatenate(
            [jnp.ones_like(cum[..., :1]), jnp.exp(-cum[..., :-1])], axis=-1)
        include = T_prev >= st.T_thresh
        w = jnp.where(include, alpha * T_excl, 0.0)

        ws = jnp.sum(w, axis=-1)                               # [C, T2]
        depth = jnp.sum(w * t[:, None, :], axis=-1)
        img = jnp.stack([jnp.sum(w * rgb[i], axis=-1) for i in range(3)],
                        axis=-1)                               # [C, T2, 3]
        return img, depth, ws, dr_beam, dr_bin

    imgs, depths, wss, dr_beams, dr_bins = jax.lax.map(
        process, (chunk_ids, chunk_mask))
    imgs = imgs.reshape(a_cap, T2, 3)
    depths = depths.reshape(a_cap, T2)
    wss = wss.reshape(a_cap, T2)

    # --- scatter active tiles into the frame
    bg = jnp.broadcast_to(jnp.asarray(bg_color, jnp.float32), (3,))
    frame = jnp.zeros((n_tiles, T2, 3), jnp.float32) + bg
    fdepth = jnp.zeros((n_tiles, T2), jnp.float32)
    fws = jnp.zeros((n_tiles, T2), jnp.float32)

    imgs = imgs + (1.0 - wss)[..., None] * bg
    safe_ids = jnp.where(act_mask, act_ids, n_tiles)
    frame = frame.at[safe_ids].set(imgs, mode="drop")
    fdepth = fdepth.at[safe_ids].set(depths, mode="drop")
    fws = fws.at[safe_ids].set(wss, mode="drop")

    return {"tiles_image": frame, "tiles_depth": fdepth, "tiles_ws": fws,
            "n_active": act_n,
            # same counter names/semantics as render_frame_fused, so an
            # 'uncapped' reference render can be verified drop-free
            "n_tile_overflow": jnp.sum(hit_tile) - act_n,
            "dropped_beam": jnp.sum(dr_beams),
            "dropped_window": jnp.sum(dr_bins)}


def _compact_tiles(mask: jax.Array, cap: int, all_tids: jax.Array):
    """Rank-compact a boolean tile mask into `cap` slots. Returns
    (ids [cap], slot_mask [cap], n, overflow)."""
    rank = jnp.cumsum(mask) - 1
    take = mask & (rank < cap)
    ids = jnp.zeros((cap,), jnp.int32)
    ids = ids.at[jnp.where(take, rank, cap)].set(
        jnp.where(take, all_tids, 0), mode="drop")
    n = jnp.sum(take)
    return ids, jnp.arange(cap) < n, n, jnp.sum(mask) - n


def _fused_tile_pass(st, packed_w, ip_pack, p_def, o, pose, intrinsics,
                     H, W, act_ids, act_mask, bbmin, bbmax,
                     deformed, cut, cut_bounds, t_jitter):
    """One Pallas tile-kernel pass over a compacted slot list: per-tile ray
    data -> (deformed only) candidate prep -> render_tiles. Returns
    (imgs [A, T2, 3], depths, wss, dropped_beam, dropped_window)."""
    ts = st.tile
    T2 = ts * ts
    K = st.samples
    a_cap = act_ids.shape[0]

    o_, d = _tile_rays(act_ids, st, H, W, pose, intrinsics)
    near, far = _near_far(o_, d, bbmin, bbmax, st.min_near)
    thit = near < 1e30
    t0 = jnp.min(jnp.where(thit, near, jnp.inf), axis=1)
    t1 = jnp.max(jnp.where(thit, far, -jnp.inf), axis=1)
    any_hit = jnp.isfinite(t0) & act_mask
    t0 = jnp.where(any_hit, t0, 1.0)
    t1 = jnp.where(any_hit, jnp.maximum(t1, t0 + 1e-3), 1.001)

    dirs = jnp.zeros((a_cap, 8, T2), jnp.float32)
    for i in range(3):
        dirs = dirs.at[:, i, :].set(d[i])

    tile_sc = jnp.zeros((a_cap, 8), jnp.float32)
    tile_sc = tile_sc.at[:, 0].set(t0)
    tile_sc = tile_sc.at[:, 1].set(t1)
    tile_sc = tile_sc.at[:, 2].set(any_hit.astype(jnp.float32))

    # --- candidate prep
    if deformed:
        ax = tuple(jnp.mean(d[i], axis=1) for i in range(3))
        an = jnp.sqrt(ax[0] ** 2 + ax[1] ** 2 + ax[2] ** 2)
        axis = jnp.stack([ax[i] / an for i in range(3)], axis=1)
        origin = jnp.broadcast_to(o, (a_cap, 3))
        fx = intrinsics[0]
        tan_half = jnp.broadcast_to(jnp.float32(ts * 0.75 / fx), (a_cap,))
        # cut mode must march the full range (outside cut_bounds renders
        # the static scene, which has density anywhere in the box).
        # the crop margin must exceed the bend reach so tightening stays
        # lossless (a sample beyond reach of every candidate is unfound)
        tmarg = (max(3.0 * st.bend.ip_dx,
                     beam_bend.reach_of(st.bend) + st.bend.ip_dx)
                 if (st.tighten_sampling and not cut) else 0.0)
        cand, bin_start, n_drop_beam, t0, t1 = tile_kernel.prep_candidates(
            ip_pack, p_def, origin, axis, tan_half, t0, t1,
            n_cand=st.bend.ips_per_tile, n_bins=K + 2,
            beam_margin=beam_bend.margin_of(st.bend), tighten_margin=tmarg,
            approx_topk=st.prep_approx_topk)
        tile_sc = tile_sc.at[:, 0].set(t0)
        tile_sc = tile_sc.at[:, 1].set(t1)
        dropped_beam = jnp.sum(jnp.where(act_mask, n_drop_beam, 0))
    else:
        cand = jnp.zeros((a_cap, max(st.bend.ips_per_tile, 64),
                          tile_kernel.PACK_FAST), jnp.float32)
        bin_start = jnp.zeros((a_cap, K + 4), jnp.int32)
        dropped_beam = jnp.int32(0)

    params = jnp.zeros((24,), jnp.float32)
    params = params.at[0:3].set(o)
    params = params.at[3:6].set(bbmin)
    params = params.at[6:9].set(bbmax)
    params = params.at[9].set(st.T_thresh)
    params = params.at[10].set(st.density_scale)
    params = params.at[11].set(st.bend.ip_dx)
    params = params.at[12].set(st.min_near)
    params = params.at[19].set(t_jitter)
    params = params.at[20].set(beam_bend.reach_of(st.bend))
    if cut:
        assert cut_bounds is not None
        # reorder [xmin,xmax,ymin,ymax,zmin,zmax] (already pairwise)
        params = params.at[13:19].set(cut_bounds)

    # MLP segment length (VMEM batch) and bend sub-window depth; the
    # settings defaults (8/4) are the tuned 800x800 configuration
    # (tools/micro_seg.py ablation), with a fallback for K values they
    # don't divide
    if K % st.seg_samples == 0:
        Ks = st.seg_samples
    else:
        Ks = next(k for k in (16, 8, 4, 2, 1) if K % k == 0)
    Ksb = st.bend_sub if Ks % st.bend_sub == 0 else Ks
    out = tile_kernel.render_tiles(
        st.spec, packed_w, tile_sc, bin_start, params, dirs, cand,
        K=K, Ks=Ks, Ksb=Ksb, Wn=min(st.bend_window, st.bend.ips_per_tile),
        num_seek=st.bend.num_seek_ip,
        deformed=deformed, cut=cut,
        block_tiles=st.block_tiles,
        interpret=jax.default_backend() == "cpu")

    imgs = jnp.moveaxis(out[:, 0:3, :], 1, 2)                   # [A, T2, 3]
    depths = out[:, 3, :]
    wss = out[:, 4, :]
    dropped_window = jnp.sum(jnp.where(act_mask, out[:, 5, 0], 0.0))
    return imgs, depths, wss, dropped_beam, dropped_window


@functools.partial(jax.jit, static_argnames=("settings", "H", "W"))
def render_static_cache(
    settings: InteractiveSettings,
    packed_w: jax.Array,
    pose: jax.Array,
    intrinsics: Tuple[float, float, float, float],
    H: int,
    W: int,
    cut_bounds: jax.Array,
    t_jitter: float = 0.5,
) -> Dict[str, jax.Array]:
    """Cut-mode static-background pass, computed ONCE per camera.

    The cut-split partition (render_frame_fused) classes a tile as STATIC
    when none of its rays intersects cut_bounds; such a tile's image is a
    pure function of (weights, pose, intrinsics) — independent of the sim
    state — so under a fixed camera it renders once and is reused every
    frame. The reference GUI re-renders the full frame each time
    (reference nerf/gui.py test_step); on TPU the static pass dominates
    the trex-class cut frame (PERF.md round-5 trex economics), so caching
    it is the structural win there. Feed the returned dict to
    render_frame_fused(static_cache=...); the composite is BIT-EXACT vs
    the uncached path (same kernel, same slots, same jitter —
    tests/test_interactive.py::test_cut_static_cache_bit_exact).
    Rebuild on any camera / intrinsics / weights / cut_bounds change.
    """
    st = settings
    ts = st.tile
    n_tiles = (H // ts) * (W // ts)
    marg = 1e-3
    bbmin = jnp.full((3,), -st.bound - marg, jnp.float32)
    bbmax = jnp.full((3,), st.bound + marg, jnp.float32)
    all_tids = jnp.arange(n_tiles, dtype=jnp.int32)
    o, d_all = _tile_rays(all_tids, st, H, W, pose, intrinsics)
    near_all, _ = _near_far(o, d_all, bbmin, bbmax, st.min_near)
    hit_tile = jnp.any(near_all < 1e30, axis=1)
    cb = cut_bounds
    cmin = jnp.stack([cb[0], cb[2], cb[4]])
    cmax = jnp.stack([cb[1], cb[3], cb[5]])
    cnear, _ = _near_far(o, d_all, cmin, cmax, st.min_near)
    cut_hit = jnp.any(cnear < 1e30, axis=1)
    static_tiles = hit_tile & ~cut_hit
    s_cap = int(n_tiles * st.cut_static_frac)
    s_cap = max(st.tile_chunk, (s_cap // st.tile_chunk) * st.tile_chunk)
    ids_s, mask_s, n_s, ovf_s = _compact_tiles(static_tiles, s_cap,
                                               all_tids)
    dummy_pack = jnp.zeros((1, tile_kernel.PACK_FAST), jnp.float32)
    dummy_pdef = jnp.zeros((1, 3), jnp.float32)
    imgs_s, dep_s, ws_s, _, _ = _fused_tile_pass(
        st, packed_w, dummy_pack, dummy_pdef, o, pose, intrinsics,
        H, W, ids_s, mask_s, bbmin, bbmax, False, False, None, t_jitter)
    return {"ids": ids_s, "mask": mask_s, "n": n_s, "overflow": ovf_s,
            "imgs": imgs_s, "depths": dep_s, "ws": ws_s}


@functools.partial(jax.jit, static_argnames=("settings", "H", "W"))
def render_frame_fused(
    settings: InteractiveSettings,
    packed_w: jax.Array,
    ip_pack: jax.Array,            # [nIP, 16] fast pack (max_iter_num == 1)
    p_def: jax.Array,              # [nIP, 3]
    pose: jax.Array,               # [4, 4]
    intrinsics: Tuple[float, float, float, float],
    H: int,
    W: int,
    bg_color: jax.Array,
    cut_bounds: Optional[jax.Array] = None,
    t_jitter: float = 0.5,
    static_cache: Optional[Dict[str, jax.Array]] = None,
) -> Dict[str, jax.Array]:
    """Fused-kernel frame: XLA does tile activity + candidate prep; the
    Pallas tile kernel (ops/pallas/tile_kernel.py) does bend -> field ->
    composite per tile with early termination and inactive-slot skip.

    Semantics match render_frame except the per-sample candidate set: the
    kernel considers the full Ks+2-bin depth window (a superset of the
    XLA path's 3 adjacent bins), so nearest-IP selection can only improve.
    Capacity overflow is counted, not silent: see the returned
    ``dropped_beam`` / ``dropped_window`` / ``n_tile_overflow`` scalars.

    Requires settings.bend.max_iter_num == 1 (chair demo config; deeper
    Newton falls back to render_frame) and ip_pack in the 16-float fast
    layout.
    """
    st = settings
    ts = st.tile
    assert ts == 16, "fused kernel is specialized to 16x16 tiles"
    assert ip_pack.shape[1] == tile_kernel.PACK_FAST, (
        "fused path needs beam_bend.pack_ip_data_fast rows")
    n_tiles = (H // ts) * (W // ts)
    T2 = ts * ts
    K = st.samples
    a_cap = int(n_tiles * st.active_frac)
    a_cap = max(st.tile_chunk, (a_cap // st.tile_chunk) * st.tile_chunk)

    marg = 1e-3
    if st.cut or not st.deformed:
        # static frames (deformed=False) march the full scene box — the
        # field has density anywhere and p_def may be a placeholder
        bbmin = jnp.full((3,), -st.bound - marg, jnp.float32)
        bbmax = jnp.full((3,), st.bound + marg, jnp.float32)
    else:
        bbmin = jnp.min(p_def, axis=0) - marg
        bbmax = jnp.max(p_def, axis=0) + marg

    # --- tile activity + compaction (as render_frame)
    all_tids = jnp.arange(n_tiles, dtype=jnp.int32)
    o, d_all = _tile_rays(all_tids, st, H, W, pose, intrinsics)
    near_all, far_all = _near_far(o, d_all, bbmin, bbmax, st.min_near)
    hit_tile = jnp.any(near_all < 1e30, axis=1)
    if st.deformed and not st.cut and st.gate_tiles:
        hit_tile &= _tiles_with_candidates(
            st, p_def, o, d_all, near_all, far_all, hit_tile, intrinsics)

    rank = jnp.cumsum(hit_tile) - 1
    take = hit_tile & (rank < a_cap)
    act_ids = jnp.zeros((a_cap,), jnp.int32)
    act_ids = act_ids.at[jnp.where(take, rank, a_cap)].set(
        jnp.where(take, all_tids, 0), mode="drop")
    act_n = jnp.sum(take)
    act_mask = jnp.arange(a_cap) < act_n
    n_tile_overflow = jnp.sum(hit_tile) - act_n

    if st.cut and st.deformed and st.cut_split:
        # --- cut-split (round-5, trex economics): a tile whose rays never
        # enter cut_bounds renders the STATIC scene exactly (no sample can
        # bend), so it takes a bend-free kernel pass — no candidate prep,
        # no windows, no Newton. Only cut-box-intersecting tiles pay for
        # bending. The partition is exact, not approximate (the in_cut
        # test in the kernel is positional; a sample in the box lies on a
        # ray that intersects the box).
        assert cut_bounds is not None
        cb = cut_bounds
        cmin = jnp.stack([cb[0], cb[2], cb[4]])
        cmax = jnp.stack([cb[1], cb[3], cb[5]])
        cnear, _ = _near_far(o, d_all, cmin, cmax, st.min_near)
        cut_hit = jnp.any(cnear < 1e30, axis=1)
        bend_tiles = hit_tile & cut_hit

        ids_b, mask_b, n_b, ovf_b = _compact_tiles(bend_tiles, a_cap,
                                                   all_tids)
        imgs_b, dep_b, ws_b, dr_beam, dr_win = _fused_tile_pass(
            st, packed_w, ip_pack, p_def, o, pose, intrinsics, H, W,
            ids_b, mask_b, bbmin, bbmax, True, True, cut_bounds, t_jitter)
        if static_cache is None:
            static_tiles = hit_tile & ~cut_hit
            s_cap = int(n_tiles * st.cut_static_frac)
            s_cap = max(st.tile_chunk,
                        (s_cap // st.tile_chunk) * st.tile_chunk)
            ids_s, mask_s, n_s, ovf_s = _compact_tiles(static_tiles, s_cap,
                                                       all_tids)
            imgs_s, dep_s, ws_s, _, _ = _fused_tile_pass(
                st, packed_w, ip_pack, p_def, o, pose, intrinsics, H, W,
                ids_s, mask_s, bbmin, bbmax, False, False, None, t_jitter)
        else:
            # camera-fixed static background reuse (render_static_cache):
            # the static partition and its rendered tiles depend only on
            # (weights, pose, intrinsics, cut_bounds) — identical slots,
            # identical pixels, zero kernel work here
            ids_s = static_cache["ids"]
            mask_s = static_cache["mask"]
            n_s = static_cache["n"]
            ovf_s = static_cache["overflow"]
            imgs_s = static_cache["imgs"]
            dep_s = static_cache["depths"]
            ws_s = static_cache["ws"]

        bg = jnp.broadcast_to(jnp.asarray(bg_color, jnp.float32), (3,))
        frame = jnp.zeros((n_tiles, T2, 3), jnp.float32) + bg
        fdepth = jnp.zeros((n_tiles, T2), jnp.float32)
        fws = jnp.zeros((n_tiles, T2), jnp.float32)
        for ids_, mask_, im_, de_, ws_ in (
                (ids_b, mask_b, imgs_b, dep_b, ws_b),
                (ids_s, mask_s, imgs_s, dep_s, ws_s)):
            im_ = im_ + (1.0 - ws_)[..., None] * bg
            safe = jnp.where(mask_, ids_, n_tiles)
            frame = frame.at[safe].set(im_, mode="drop")
            fdepth = fdepth.at[safe].set(de_, mode="drop")
            fws = fws.at[safe].set(ws_, mode="drop")
        return {"tiles_image": frame, "tiles_depth": fdepth,
                "tiles_ws": fws, "n_active": n_b + n_s,
                "n_tile_overflow": ovf_b + ovf_s,
                "dropped_beam": dr_beam,
                "dropped_window": dr_win.astype(jnp.int32)}

    imgs, depths, wss, dropped_beam, dropped_window = _fused_tile_pass(
        st, packed_w, ip_pack, p_def, o, pose, intrinsics, H, W,
        act_ids, act_mask, bbmin, bbmax, st.deformed, st.cut, cut_bounds,
        t_jitter)

    bg = jnp.broadcast_to(jnp.asarray(bg_color, jnp.float32), (3,))
    frame = jnp.zeros((n_tiles, T2, 3), jnp.float32) + bg
    fdepth = jnp.zeros((n_tiles, T2), jnp.float32)
    fws = jnp.zeros((n_tiles, T2), jnp.float32)

    imgs = imgs + (1.0 - wss)[..., None] * bg
    safe_ids = jnp.where(act_mask, act_ids, n_tiles)
    frame = frame.at[safe_ids].set(imgs, mode="drop")
    fdepth = fdepth.at[safe_ids].set(depths, mode="drop")
    fws = fws.at[safe_ids].set(wss, mode="drop")

    return {"tiles_image": frame, "tiles_depth": fdepth, "tiles_ws": fws,
            "n_active": act_n, "n_tile_overflow": n_tile_overflow,
            "dropped_beam": dropped_beam,
            "dropped_window": dropped_window.astype(jnp.int32)}


@functools.partial(jax.jit,
                   static_argnames=("settings", "H", "W", "tile_chunk"))
def render_frame_exact(
    settings: InteractiveSettings,
    packed_w: jax.Array,
    p_def: jax.Array,              # [nIP, 3]
    p_ori: jax.Array,              # [nIP, 3]
    F: jax.Array,                  # [nIP, 3, 3]
    dF: jax.Array,                 # [nIP, 3, 3, 3]
    pose: jax.Array,
    intrinsics: Tuple[float, float, float, float],
    H: int,
    W: int,
    bg_color: jax.Array,
    tile_chunk: int = 2,
    nn_radius: Optional[jax.Array] = None,
    cut_bounds: Optional[jax.Array] = None,
) -> Dict[str, jax.Array]:
    """Ground-truth fidelity oracle: render_frame with EXACT bending.

    Identical tile lattice, sample placement and composite as render_frame,
    but each sample's k nearest IPs are found by brute force over ALL IPs
    (no beam, no depth bins, no candidate windows) with the same
    bbox / moved<=ip_dx rejections and 1/dist blend as ops/bending
    (the reference's per-sample 27-cell walk, raymarching.cu:986-1119,
    without the cell-size truncation). O(samples x nIP) — offline-only;
    this is what bench's fidelity axis and tools/fidelity_diag.py compare
    the capped interactive paths against. Deformed non-cut mode only.

    ``nn_radius`` (diagnostic, tools/fidelity_decomp.py): when given, the
    k-NN seek only considers IPs within that radius of the sample —
    isolating how much of a capped path's error is *slot occupancy* (the
    global top-k including far, always-rejected IPs that a windowed
    search cannot see).
    """
    st = settings
    assert st.deformed, "oracle covers deformed mode"
    if st.cut:
        assert cut_bounds is not None, "cut mode oracle needs cut_bounds"
    ts = st.tile
    n_tiles = (H // ts) * (W // ts)
    T2 = ts * ts
    K = st.samples
    a_cap = int(n_tiles * st.active_frac)
    a_cap = max(tile_chunk, (a_cap // tile_chunk) * tile_chunk)

    marg = 1e-3
    if st.cut:
        # cut mode marches the full scene box (outside cut_bounds renders
        # the static scene) — same box as render_frame/_fused
        bbmin = jnp.full((3,), -st.bound - marg, jnp.float32)
        bbmax = jnp.full((3,), st.bound + marg, jnp.float32)
    else:
        bbmin = jnp.min(p_def, axis=0) - marg
        bbmax = jnp.max(p_def, axis=0) + marg

    all_tids = jnp.arange(n_tiles, dtype=jnp.int32)
    o, d_all = _tile_rays(all_tids, st, H, W, pose, intrinsics)
    near_all, far_all = _near_far(o, d_all, bbmin, bbmax, st.min_near)
    hit_tile = jnp.any(near_all < 1e30, axis=1)
    if not st.cut and st.gate_tiles:
        # same candidate-count gate as the interactive paths: with
        # margin >= reach the beam provably contains every IP any sample
        # of the tile could accept, so a gated-out tile is exact
        # background here too (and n_active stays comparable)
        hit_tile &= _tiles_with_candidates(
            st, p_def, o, d_all, near_all, far_all, hit_tile, intrinsics)
    rank = jnp.cumsum(hit_tile) - 1
    take = hit_tile & (rank < a_cap)
    act_ids = jnp.zeros((a_cap,), jnp.int32)
    act_ids = act_ids.at[jnp.where(take, rank, a_cap)].set(
        jnp.where(take, all_tids, 0), mode="drop")
    act_n = jnp.sum(take)
    act_mask = jnp.arange(a_cap) < act_n

    n_chunks = a_cap // tile_chunk
    chunk_ids = act_ids.reshape(n_chunks, tile_chunk)
    chunk_mask = act_mask.reshape(n_chunks, tile_chunk)

    # candidates outside the deformed bbox are rejected up front
    # (bend_points' inside test)
    ip_ok = jnp.all((p_def > bbmin) & (p_def < bbmax), axis=-1)  # [nIP]

    def process(chunk):
        tids, cmask = chunk
        C = tile_chunk
        o_, d = _tile_rays(tids, st, H, W, pose, intrinsics)
        near, far = _near_far(o_, d, bbmin, bbmax, st.min_near)
        thit = near < 1e30
        t0 = jnp.min(jnp.where(thit, near, jnp.inf), axis=1)
        t1 = jnp.max(jnp.where(thit, far, -jnp.inf), axis=1)
        any_hit = jnp.isfinite(t0) & cmask
        t0 = jnp.where(any_hit, t0, 1.0)
        t1 = jnp.where(any_hit, jnp.maximum(t1, t0 + 1e-3), 1.001)

        kk = (jnp.arange(K, dtype=jnp.float32) + 0.5) / K
        t = t0[:, None] + (t1 - t0)[:, None] * kk[None, :]
        dt = ((t1 - t0) / K)[:, None]
        xs = tuple(o_[i] + t[:, None, :] * d[i][:, :, None]
                   for i in range(3))                           # [C, T2, K]

        x = jnp.stack([c.reshape(-1) for c in xs], axis=-1)     # [M, 3]
        # exact k-NN over all IPs, in sample blocks to bound the [m, nIP]
        # distance matrix
        M = C * T2 * K
        blk = 8192
        nb = (M + blk - 1) // blk
        pad = nb * blk - M
        xb = jnp.pad(x, ((0, pad), (0, 0))).reshape(nb, blk, 3)

        kseek = st.bend.num_seek_ip

        def nn_block(xq):
            d2 = None
            for i in range(3):
                diff = xq[:, i:i + 1] - p_def[None, :, i]       # [blk, nIP]
                d2 = diff * diff if d2 is None else d2 + diff * diff
            d2 = jnp.where(ip_ok[None, :], d2, jnp.inf)
            if nn_radius is not None:
                d2 = jnp.where(d2 <= nn_radius * nn_radius, d2, jnp.inf)
            rows = jnp.arange(blk)
            ids, dist = [], []
            for _ in range(kseek):
                j = jnp.argmin(d2, axis=1)
                best = d2[rows, j]
                ids.append(j.astype(jnp.int32))
                dist.append(jnp.sqrt(jnp.maximum(best, 0.0)))
                d2 = d2.at[rows, j].set(jnp.inf)
            return jnp.stack(ids, 1), jnp.stack(dist, 1)        # [blk, k]

        idsb, distb = jax.lax.map(nn_block, xb)
        ids = idsb.reshape(-1, kseek)[:M]
        dist = distb.reshape(-1, kseek)[:M]

        from pienerf_tpu.ops import bending as bend_ops
        p_rest, _ = bend_ops.newton_invert(
            x, p_ori[ids], p_def[ids], F[ids], dF[ids],
            st.bend.max_iter_num)                               # [M, k, 3]
        has = jnp.isfinite(dist)
        moved = jnp.abs(p_rest - p_ori[ids])
        ok = has & jnp.all(moved <= st.bend.ip_dx, axis=-1)
        w = jnp.where(ok, 1.0 / jnp.maximum(dist, 1e-8), 0.0)
        wsum = jnp.sum(w, axis=1)
        found_f = wsum > 0
        wn = w / jnp.maximum(wsum, 1e-30)[:, None]
        x_rest = jnp.einsum("mk,mkd->md", wn, p_rest)
        x_rest = jnp.where(found_f[:, None], x_rest, x)

        found = found_f.reshape(C, T2, K)
        xm = tuple(x_rest[:, i].reshape(C, T2, K) for i in range(3))
        if st.cut:
            cb = cut_bounds
            in_cut = (
                (xs[0] > cb[0]) & (xs[0] < cb[1])
                & (xs[1] > cb[2]) & (xs[1] < cb[3])
                & (xs[2] > cb[4]) & (xs[2] < cb[5])
            )
            xm = tuple(jnp.where(in_cut, xm[i], xs[i]) for i in range(3))
            found = jnp.where(in_cut, found, True)

        valid = found & (t[:, None, :] >= near[..., None]) \
            & (t[:, None, :] <= far[..., None]) & thit[..., None]
        flat = tuple(c.reshape(M) for c in xm)
        ds = tuple(jnp.broadcast_to(d[i][:, :, None],
                                    (C, T2, K)).reshape(-1) for i in range(3))
        sigma, rgb = field_kernel.field_eval(packed_w, st.spec, flat, ds,
                                             block_n=8192)
        sigma = (sigma * st.density_scale).reshape(C, T2, K)
        sigma = jnp.where(valid, sigma, 0.0)
        rgb = rgb.reshape(3, C, T2, K)

        tau = sigma * dt[:, None, :]
        cum = jnp.cumsum(tau, axis=-1)
        T_excl = jnp.exp(-(cum - tau))
        alpha = 1.0 - jnp.exp(-tau)
        T_prev = jnp.concatenate(
            [jnp.ones_like(cum[..., :1]), jnp.exp(-cum[..., :-1])], axis=-1)
        include = T_prev >= st.T_thresh
        w2 = jnp.where(include, alpha * T_excl, 0.0)
        ws = jnp.sum(w2, axis=-1)
        depth = jnp.sum(w2 * t[:, None, :], axis=-1)
        img = jnp.stack([jnp.sum(w2 * rgb[i], axis=-1) for i in range(3)],
                        axis=-1)
        return img, depth, ws

    imgs, depths, wss = jax.lax.map(process, (chunk_ids, chunk_mask))
    imgs = imgs.reshape(a_cap, T2, 3)
    depths = depths.reshape(a_cap, T2)
    wss = wss.reshape(a_cap, T2)

    bg = jnp.broadcast_to(jnp.asarray(bg_color, jnp.float32), (3,))
    frame = jnp.zeros((n_tiles, T2, 3), jnp.float32) + bg
    fdepth = jnp.zeros((n_tiles, T2), jnp.float32)
    fws = jnp.zeros((n_tiles, T2), jnp.float32)
    imgs = imgs + (1.0 - wss)[..., None] * bg
    safe_ids = jnp.where(act_mask, act_ids, n_tiles)
    frame = frame.at[safe_ids].set(imgs, mode="drop")
    fdepth = fdepth.at[safe_ids].set(depths, mode="drop")
    fws = fws.at[safe_ids].set(wss, mode="drop")
    return {"tiles_image": frame, "tiles_depth": fdepth, "tiles_ws": fws,
            "n_active": act_n,
            "n_tile_overflow": jnp.sum(hit_tile) - act_n,
            "dropped_beam": jnp.int32(0), "dropped_window": jnp.int32(0)}


def tiles_to_image(tiles: np.ndarray, H: int, W: int, ts: int = 16
                   ) -> np.ndarray:
    """[n_tiles, ts*ts, C] -> [H, W, C]."""
    tiles = np.asarray(tiles)
    c = tiles.shape[-1] if tiles.ndim == 3 else 1
    tw = W // ts
    th = H // ts
    out = tiles.reshape(th, tw, ts, ts, -1).transpose(0, 2, 1, 3, 4)
    out = out.reshape(H, W, -1)
    return out if c > 1 else out[..., 0]
