"""Fused per-tile frame kernel: bend -> field -> composite in one Pallas pass.

This is the round-2 replacement for the hot half of the interactive frame
(reference: the alive-ray loop calling march_rays_quadratic_bending + the
field MLPs + composite_rays, /root/reference/raymarching.cu:1122-1489 and
nerf/renderer.py:755-905). Round-1 ran bending and field eval as separate
XLA stages; the [3B, T2, K] bending intermediates alone moved ~50 MB of HBM
per 32-tile chunk (~90 ms/frame). Here every per-sample intermediate lives
in VMEM; HBM traffic per tile is ~45 KB in + 8 KB out.

Structure (one grid step = block_tiles 16x16 image tiles, each:)

  slab near/far per ray (in-kernel, from dirs + bbox scalars)
  for each depth segment of Ks samples (fori over K/Ks, early-exit when the
      whole tile's transmittance drops below T_thresh):
    candidate window = contiguous slice of the tile's DEPTH-SORTED candidate
        list (pl.ds with per-bin prefix counts; replaces round-1's
        scatter-built depth bins)
    d2 against <=W candidates -> 3x (argmin, one-hot MXU fetch, single-step
        Newton p_rest = p_ori + F^-1 (x - p_def), ip_dx reject, IDW blend)
    freq-encode -> sigma MLP -> trunc-exp, SH4 + geo -> color MLP  (bf16 MXU,
        VMEM-resident weights; same math as field_kernel.py)
    transmittance-carried composite, accumulate rgb/depth/ws

Capacity semantics: the per-segment window holds Wn candidates; anything
past Wn in a segment's depth range is dropped AND COUNTED (out[:, 5, 0] =
dropped candidate-slots for the tile; VERDICT round-1 "silent caps" item).
Unlike round-1's +-1-bin windows, the window is a superset of each sample's
3-bin neighborhood, so truncation is strictly rarer.

Only the max_iter_num == 1 fast path (the chair demo config, reference
README.md:123) runs in-kernel; callers fall back to the XLA path for deeper
Newton. Inference-only, like field_kernel.py.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pienerf_tpu.models import network
from pienerf_tpu.ops.pallas import field_kernel as _fk

T2 = 256          # rays per 16x16 tile
PACK_FAST = 16    # beam_bend.PACK_FAST rows: p_def(3) p_ori(3) Finv(9) valid


# ---------------------------------------------------------------------------
# XLA-side per-tile candidate prep (amortized over the tile's T2*K samples)
# ---------------------------------------------------------------------------

def prep_candidates(
    ip_pack: jax.Array,      # [nIP, 16] fast-pack rows
    p_def: jax.Array,        # [nIP, 3]
    origin: jax.Array,       # [A, 3]
    axis: jax.Array,         # [A, 3] unit central dirs
    tan_half: jax.Array,     # [A]
    t0: jax.Array,           # [A]
    t1: jax.Array,           # [A]
    n_cand: int,             # P candidate capacity per tile
    n_bins: int,             # K + 2 (1-bin halo each side)
    beam_margin: float,
    tighten_margin: float = 0.0,
    approx_topk: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Depth-sorted beam candidates + per-bin prefix counts.

    Returns (cand [A, P, 16] sorted by depth along the beam axis with
    invalid rows pushed to the end, bin_start [A, n_bins+2] int32 prefix
    counts aligned to bin edges t0e + (j-1)*dt with the tile's total valid
    count appended as the last entry (so the kernel's end-clamped windows
    can include candidates projecting past the binned range — they are
    physically reachable from samples near the range ends), n_dropped [A]
    candidates past the P capacity, t0e [A], t1e [A]).

    ``tighten_margin`` > 0 crops each tile's depth range [t0, t1] to its
    candidates' projection span +- the margin before binning. In deformed
    (non-cut) rendering, a sample farther than the bend-reject reach from
    every candidate is provably unfound (sigma = 0), so cropping to the
    span is lossless — it concentrates the K samples on the object
    (finer quadrature) instead of the whole march box. Returned t0e/t1e
    are the effective range (== t0/t1 when the margin is 0 or a tile has
    no candidates); callers MUST sample with them since the bins are built
    against them.
    """
    P = n_cand
    # componentwise beam test — materializing [A, nIP, 3] pads the trailing
    # dim 3 -> 128 lanes (42x HBM, PERF.md layout rule); [A, nIP] planes only
    proj = None
    lat2 = None
    for i in range(3):
        rel = p_def[None, :, i] - origin[:, i:i + 1]            # [A, nIP]
        c = rel * axis[:, i:i + 1]
        proj = c if proj is None else proj + c
        lat2 = rel * rel if lat2 is None else lat2 + rel * rel
    lat2 = lat2 - proj * proj
    radius = tan_half[:, None] * jnp.clip(proj, 0.0, None) + beam_margin
    ok = (
        (lat2 <= radius * radius)
        & (proj >= t0[:, None] - beam_margin)
        & (proj <= t1[:, None] + beam_margin)
    )

    # top_k on -proj compacts AND depth-sorts in one op (replaces round-1's
    # serialized rank scatter + argsort: 30 ms -> 4 ms at [1248, 3053]).
    # Overflow keeps the P front-most candidates and is counted.
    keyv = jnp.where(ok, -proj, -jnp.inf)
    k_eff = min(P, keyv.shape[1])                 # small scenes: nIP < P
    if approx_topk and keyv.shape[1] > k_eff:
        # TPU-native approximate top-k (bin-reduce + exact aggregate):
        # ~2x the exact top_k's rate at [1248, 3053] (tools/micro_prep2.py:
        # 7.2 -> 3.5 ms). Bin collisions can drop ~ (1 - recall) of
        # candidates even on non-overflowing tiles; the image cost is
        # priced on the trained field vs the exact-bending oracle before
        # this is allowed anywhere near default-on (PERF.md).
        negproj, ids = jax.lax.approx_max_k(
            keyv, k_eff, recall_target=0.95, aggregate_to_topk=True)
    else:
        negproj, ids = jax.lax.top_k(keyv, k_eff)               # [A, k]
    if k_eff < P:
        padn = P - k_eff
        negproj = jnp.concatenate(
            [negproj, jnp.full((negproj.shape[0], padn), -jnp.inf)], axis=1)
        ids = jnp.concatenate(
            [ids, jnp.zeros((ids.shape[0], padn), ids.dtype)], axis=1)
    cproj = -negproj
    valid = jnp.isfinite(cproj)
    count = jnp.sum(valid, axis=1)
    n_dropped = jnp.sum(ok, axis=1) - count
    cproj = jnp.where(valid, cproj, jnp.inf)

    cand = ip_pack[ids]                                         # [A, P, 16]
    # zero the validity slot of invalid rows so the kernel can reject them
    cand = cand.at[..., PACK_FAST - 1].set(
        jnp.where(valid, cand[..., PACK_FAST - 1], 0.0))

    if tighten_margin > 0.0:
        pmin = cproj[:, 0]                     # sorted ascending, valid first
        pmax = jnp.max(jnp.where(valid, cproj, -jnp.inf), axis=1)
        has = count > 0
        t0e = jnp.where(has, jnp.maximum(t0, pmin - tighten_margin), t0)
        t1e = jnp.where(has, jnp.minimum(t1, pmax + tighten_margin), t1)
        # keep the tightened range inside the original interval even when a
        # tile's only candidates sit in the beam-margin zone beyond t1
        # (possible when beam_margin > tighten_margin)
        t0e = jnp.minimum(t0e, t1 - 1e-3)
        t1e = jnp.maximum(t1e, t0e + 1e-3)
    else:
        t0e, t1e = t0, t1

    # prefix counts at bin edges: edge_j = t0e + (j - 1) * dt, j = 0..n_bins
    dt = (t1e - t0e) / (n_bins - 2)
    edges = (t0e[:, None]
             + (jnp.arange(n_bins + 1, dtype=jnp.float32)[None, :] - 1.0)
             * dt[:, None])                                     # [A, n_bins+1]
    bin_start = jnp.sum(cproj[:, :, None] < edges[:, None, :],
                        axis=1).astype(jnp.int32)
    # append the tile's valid count: candidates whose projection falls
    # outside [edge_0, edge_last) stay reachable through the end-clamped
    # windows (rows [0, bin_start[0]) and [bin_start[-2], count) of the
    # sorted list), so they are NOT counted as dropped — n_dropped is
    # purely the P-capacity overflow
    bin_start = jnp.concatenate(
        [bin_start, count[:, None].astype(jnp.int32)], axis=1)
    return cand, bin_start, n_dropped, t0e, t1e


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

def _cumsum_lanes(x, n, step):
    """Inclusive prefix sum over n groups of `step` lanes (axis 1).

    x is [1, n*step] in depth-major flat layout (lane index = k*step + r);
    sums over k for each r. Pallas TPU has no cumsum lowering; this is
    Hillis-Steele with log2(n) lane-shifted adds.
    """
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    shift = 1
    while shift < n:
        r = pltpu.roll(x, shift * step, 1)
        x = x + jnp.where(lane >= shift * step, r, 0.0)
        shift *= 2
    return x


def _sum_depth(x, n, step):
    """Sum [1, n*step] over the depth axis -> [1, step] (unrolled adds)."""
    out = x[:, 0:step]
    for k in range(1, n):
        out = out + x[:, k * step:(k + 1) * step]
    return out


def _freq_rows(x0, x1, x2, n_freqs, bound, dtype):
    """Frequency features from [1, Nb] rows -> [F, Nb] (2-D-only twin of
    field_kernel._freq_encode_block; Mosaic rejects 1-D shape casts)."""
    rows = []
    for c in (x0, x1, x2):
        cn = c / bound
        rows.append(cn)
        s = jnp.sin(jnp.pi * cn)
        co = jnp.cos(jnp.pi * cn)
        sins, coss = [s], [co]
        for _ in range(n_freqs - 1):
            s, co = 2.0 * s * co, co * co - s * s
            sins.append(s)
            coss.append(co)
        rows.extend(sins)
        rows.extend(coss)
    return jnp.concatenate(rows, axis=0).astype(dtype)


def _sh4_rows(x, y, z, dtype):
    """Degree-4 real SH from [1, Nb] rows -> [16, Nb]."""
    from pienerf_tpu.models.sh_encoder import C0, C1, C2, C3
    xy, xz, yz = x * y, x * z, y * z
    x2, y2, z2 = x * x, y * y, z * z
    one = jnp.ones_like(x)
    rows = [
        C0 * one, -C1 * y, C1 * z, -C1 * x,
        C2[0] * xy, -C2[0] * yz, C2[1] * z2 - C2[2], -C2[0] * xz,
        C2[3] * (x2 - y2),
        C3[0] * y * (-3.0 * x2 + y2), C3[1] * xy * z,
        C3[2] * y * (1.0 - 5.0 * z2), C3[3] * z * (5.0 * z2 - 3.0),
        C3[2] * x * (1.0 - 5.0 * z2), C3[4] * z * (x2 - y2),
        C3[0] * x * (-x2 + 3.0 * y2),
    ]
    return jnp.concatenate(rows, axis=0).astype(dtype)


def _make_kernel(spec, *, K, Ks, Ksb, Wn, P, n_sigma, n_color, num_seek,
                 deformed, cut, compute_dtype, wd=64, B=1, paired=False):
    n_seg = K // Ks
    Nb = T2 * Ks
    lp = max(n_sigma, n_color)

    def kernel(sc_ref, bs_ref, par_ref, dirs_ref, cand_ref, w_ref, out_ref,
               cum_ref, st_ref, geo_ref=None):
        # sc_ref  [B, 1, 8]  SMEM:  t0, t1, active, pad...
        # bs_ref  [B, 1, BS] SMEM:  bin_start prefix counts (BS >= K + 3)
        # par_ref [1, 1, 24] SMEM:  o(3) bbmin(3) bbmax(3) T_thresh dscale ip_dx
        #                        min_near cut_bounds(6) t_jitter (slot 19,
        #                        in [0,1), 0.5 = bin centers; spp jitter)
        #                        bend reach (slot 20, world units)
        # dirs_ref [B, 8, T2] VMEM: rows 0..2 = ray dir components
        # cand_ref [B, P, 16] VMEM: depth-sorted fast-pack candidate rows
        # w_ref    [L, Wd, Wd] VMEM: packed MLP weights (Wd = 64 or 128)
        # out_ref  [B, 8, T2]: rgb(3) depth ws drop_cnt pad pad
        # cum_ref  [1, T2] VMEM scratch: accumulated optical depth (per tile,
        #          re-zeroed for each of the B tiles in the block)
        # st_ref   [2] SMEM scratch: alive flag, dropped-candidate count
        #
        # B tiles share one grid step: the per-step floor (block DMA latency
        # + Mosaic step machinery) measured ~9 us/step at the bench point —
        # 11.2 ms of a 33 ms frame at a_cap=1248 (tools/kernel_decomp.py).
        # Batching B tiles divides that floor by B; the per-tile body is
        # unchanged (python-level unroll, per-tile scalar windows intact).
        # geo_ref [16, Nb] VMEM scratch (paired only): rows 0..14 = the
        #          previous executed segment's geo features, row 15 = its
        #          composite weights; st_ref[2] = pending flag (see the
        #          paired-MLP note in `segment`)
        for b in range(B):
            _tile_body(b, sc_ref, bs_ref, par_ref, dirs_ref, cand_ref,
                       w_ref, out_ref, cum_ref, st_ref, geo_ref)

    def _tile_body(b, sc_ref, bs_ref, par_ref, dirs_ref, cand_ref, w_ref,
                   out_ref, cum_ref, st_ref, geo_ref):
        cdt = compute_dtype
        t0 = sc_ref[b, 0, 0]
        t1 = sc_ref[b, 0, 1]
        active = sc_ref[b, 0, 2] > 0.0
        ox = par_ref[0, 0, 0]
        oy = par_ref[0, 0, 1]
        oz = par_ref[0, 0, 2]
        T_thresh = par_ref[0, 0, 9]
        dscale = par_ref[0, 0, 10]
        ip_dx = par_ref[0, 0, 11]
        min_near = par_ref[0, 0, 12]
        t_jit = par_ref[0, 0, 19]

        out_ref[b, :, :] = jnp.zeros((8, T2), jnp.float32)
        cum_ref[0, :] = jnp.zeros((T2,), jnp.float32)
        st_ref[0] = 1
        st_ref[1] = 0
        if paired:
            st_ref[2] = 0
            # scratch must not hold garbage: the first segment's color
            # half runs on it (masked by the pending flag, but 0 * NaN
            # would still poison the composite)
            geo_ref[:, :] = jnp.zeros((16, Nb), jnp.float32)

        @pl.when(active)
        def _body():
            # Everything below stays strictly 2-D (Mosaic rejects 1-D shape
            # casts). Flat sample layout: [1, Nb] rows with lane n = k*T2 + r
            # (depth-major); per-ray [1, T2] rows tile across lanes.
            d_rows = (dirs_ref[b, 0:1, :], dirs_ref[b, 1:2, :],
                      dirs_ref[b, 2:3, :])                       # 3 x [1, T2]

            # per-ray slab near/far against the march bbox
            BIG = jnp.float32(3.4e38)
            near = jnp.full((1, T2), -BIG)
            far = jnp.full((1, T2), BIG)
            o = (ox, oy, oz)
            for i in range(3):
                inv = 1.0 / d_rows[i]
                ta = (par_ref[0, 0, 3 + i] - o[i]) * inv
                tb = (par_ref[0, 0, 6 + i] - o[i]) * inv
                near = jnp.maximum(near, jnp.minimum(ta, tb))
                far = jnp.minimum(far, jnp.maximum(ta, tb))
            thit = near <= far
            near = jnp.maximum(near, min_near)

            dt_s = (t1 - t0) / K
            df = tuple(jnp.concatenate([d_rows[i]] * Ks, axis=1)
                       for i in range(3))                        # [1, Nb]
            # SH rows depend only on the (per-ray) directions — hoisted
            # out of the segment loop (they used to be recomputed
            # identically per segment)
            sh = _sh4_rows(df[0], df[1], df[2], cdt)             # [16, Nb]

            def paired_chain(hp):
                """max(n_sigma, n_color) block-diagonal [128,128] matmuls;
                ReLU applies per half only between ITS chain's layers (the
                shorter chain's identity tail passes its output through
                untouched)."""
                rowi = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)
                for li in range(lp):
                    hp = jax.lax.dot_general(
                        w_ref[li].astype(cdt), hp,
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32).astype(cdt)
                    rt = li < n_sigma - 1
                    rb = li < n_color - 1
                    if rt and rb:
                        hp = jnp.maximum(hp, 0.0)
                    elif rt or rb:
                        m = (rowi < 64) if rt else (rowi >= 64)
                        hp = jnp.where(m, jnp.maximum(hp, 0.0), hp)
                return hp
            near_f = jnp.concatenate([near] * Ks, axis=1)
            far_f = jnp.concatenate([far] * Ks, axis=1)
            thit_f = jnp.concatenate([thit] * Ks, axis=1)
            kidx = (jax.lax.broadcasted_iota(jnp.int32, (1, Nb), 1)
                    // T2).astype(jnp.float32)                   # depth index

            # per-tile dynamic halo: the candidate window must cover the
            # world-space bend reach (beam_bend.reach_of: the per-axis
            # Newton reject admits IPs up to ~2*ip_dx from a sample) on
            # each side, and THIS tile's bin width is dt_s = (t1-t0)/K.
            # A static bin-count halo under-covers short-span (grazing /
            # tightened) tiles — the round-3 silhouette-error find
            # (tools/halo_probe2.py)
            reach = par_ref[0, 0, 20]
            halo = jnp.maximum(
                jnp.ceil(reach / jnp.maximum(dt_s, 1e-9)).astype(jnp.int32),
                1)    # floor at the legacy 1-bin halo (reach 0 = unset)

            def bend_sub(s, sb, xf_sub):
                """Bend one Ksb-deep sub-segment [1, Nbb] against its own
                (Ksb + 2*halo)-bin candidate window (Wn rows). Returns
                (xm parts, found).

                The sub-window keeps the per-sample candidate neighborhood
                tight, which is what bounds the VPU cost of the d2/argmin
                passes — a full Ks-segment window was measured 2.6x more
                work with worse truncation. When the window clamps at
                either end of the binned range it extends to the sorted
                list's edge (row 0 / the appended valid count), keeping
                outside-binning candidates reachable from end samples."""
                Nbb = T2 * Ksb
                k0 = s * Ks + sb * Ksb
                # sample depth k -> bin k+1; window bins [k0+1-halo,
                # k0+Ksb+halo] -> prefix edges [k0+1-halo, k0+Ksb+1+halo]
                lo_i = k0 + 1 - halo
                hi_i = k0 + Ksb + 1 + halo
                lo = jnp.where(lo_i <= 0, 0,
                               bs_ref[b, 0, jnp.maximum(lo_i, 0)])
                hi = jnp.where(hi_i >= K + 2, bs_ref[b, 0, K + 3],
                               bs_ref[b, 0, jnp.minimum(hi_i, K + 2)])
                # When [lo, hi) exceeds Wn rows, CENTER the kept rows on
                # the sub-segment's own bins: a depth-sorted prefix would
                # keep only the window's near end, starving far samples of
                # their own neighborhoods (measured WORSE than the legacy
                # 1-bin halo on dense wide-FOV tiles —
                # test_reach_halo_beats_legacy_one_bin_halo_vs_exact).
                # Overflow is counted either way.
                own_lo = bs_ref[b, 0, k0 + 1]
                own_hi = bs_ref[b, 0, k0 + Ksb + 1]
                a = own_lo - (Wn - (own_hi - own_lo)) // 2
                a = jnp.clip(a, lo, jnp.maximum(lo, hi - Wn))
                a = jnp.clip(a, 0, P - Wn)
                st_ref[1] += jnp.maximum(hi - lo - Wn, 0)
                cw = cand_ref[b, pl.ds(a, Wn), :]               # [Wn, 16]
                rowi = jax.lax.broadcasted_iota(jnp.int32, (Wn, 1), 0)
                row_ok = ((rowi >= lo - a) & (rowi < hi - a)
                          & (cw[:, PACK_FAST - 1:PACK_FAST] > 0.0))

                dd = None
                for i in range(3):
                    diff = xf_sub[i] - cw[:, i:i + 1]           # [Wn, Nbb]
                    dd = diff * diff if dd is None else dd + diff * diff
                dd = jnp.where(row_ok, dd, jnp.inf)

                m0 = jnp.zeros((1, Nbb), jnp.float32)
                m1 = jnp.zeros((1, Nbb), jnp.float32)
                m2 = jnp.zeros((1, Nbb), jnp.float32)
                wsum = jnp.zeros((1, Nbb), jnp.float32)
                ddw = dd
                widx = jax.lax.broadcasted_iota(jnp.int32, (Wn, Nbb), 0)
                for _ in range(num_seek):
                    best = jnp.min(ddw, axis=0, keepdims=True)  # [1, Nbb]
                    j = jnp.argmin(ddw, axis=0, keepdims=True)
                    has = jnp.isfinite(best)
                    onehot = ((widx == j) & has).astype(jnp.float32)
                    # fetch [16, Nbb] = cw^T [16, Wn] @ onehot [Wn, Nbb].
                    # The fetch must run at FULL f32 precision even when
                    # the MLP matmuls are bf16: TPU's default f32 matmul
                    # is a single bf16 pass, and truncating the fetched
                    # p_def/p_ori/F^-1 rows to bf16 (~0.4% relative)
                    # smears the |p_rest - p_ori| <= ip_dx accept
                    # boundary ~1000x wider than f32 rounding — measured
                    # as ~400 near-full-scale pixel flips vs the exact
                    # oracle (38.2 dB floor, tools/fidelity_decomp.py;
                    # same rule as beam_bend._HI for the XLA path).
                    sel = jax.lax.dot_general(
                        cw, onehot,
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)
                    q0 = xf_sub[0] - sel[0:1]
                    q1 = xf_sub[1] - sel[1:2]
                    q2 = xf_sub[2] - sel[2:3]
                    pr0 = (sel[3:4] + sel[6:7] * q0 + sel[7:8] * q1
                           + sel[8:9] * q2)
                    pr1 = (sel[4:5] + sel[9:10] * q0 + sel[10:11] * q1
                           + sel[11:12] * q2)
                    pr2 = (sel[5:6] + sel[12:13] * q0 + sel[13:14] * q1
                           + sel[14:15] * q2)
                    ok3 = (has
                           & (jnp.abs(pr0 - sel[3:4]) <= ip_dx)
                           & (jnp.abs(pr1 - sel[4:5]) <= ip_dx)
                           & (jnp.abs(pr2 - sel[5:6]) <= ip_dx))
                    wgt = jnp.where(
                        ok3, jax.lax.rsqrt(jnp.maximum(best, 1e-16)), 0.0)
                    m0 = m0 + wgt * pr0
                    m1 = m1 + wgt * pr1
                    m2 = m2 + wgt * pr2
                    wsum = wsum + wgt
                    ddw = jnp.where(widx == j, jnp.inf, ddw)

                found = wsum > 0.0
                invw = 1.0 / jnp.maximum(wsum, 1e-30)
                xm = tuple(jnp.where(found, m * invw, xf_sub[i])
                           for i, m in enumerate((m0, m1, m2)))
                return xm, found

            def segment(s):
                t = t0 + (s * Ks + kidx + t_jit) * dt_s          # [1, Nb]
                xf = tuple(o[i] + t * df[i] for i in range(3))

                if deformed:
                    Nbb = T2 * Ksb
                    parts = []
                    for sb in range(Ks // Ksb):
                        xf_sub = tuple(xf[i][:, sb * Nbb:(sb + 1) * Nbb]
                                       for i in range(3))
                        parts.append(bend_sub(s, sb, xf_sub))
                    xm = tuple(
                        jnp.concatenate([p[0][i] for p in parts], axis=1)
                        for i in range(3))
                    found = jnp.concatenate([p[1] for p in parts], axis=1)
                    if cut:
                        in_cut = jnp.ones((1, Nb), bool)
                        for i in range(3):
                            in_cut = (in_cut
                                      & (xf[i] > par_ref[0, 0, 13 + 2 * i])
                                      & (xf[i] < par_ref[0, 0, 14 + 2 * i]))
                        xm = tuple(jnp.where(in_cut, xm[i], xf[i])
                                   for i in range(3))
                        # logical form of where(in_cut, found, True):
                        # an i1 select against a scalar broadcast hits a
                        # Mosaic legalization hole at some kernel widths
                        # ("Unsupported target bitwidth for truncation",
                        # seen at the trex 1008x752 / num_seek_IP=1 point)
                        found = found | jnp.logical_not(in_cut)
                else:
                    xm = xf
                    found = jnp.ones((1, Nb), bool)

                # ---- field eval (same math as field_kernel._make_kernel)
                enc = _freq_rows(xm[0], xm[1], xm[2],
                                 spec.n_freqs, spec.bound, cdt)
                f = enc.shape[0]
                if paired:
                    # MXU co-scheduling (field_kernel.pack_weights_paired):
                    # THIS segment's sigma chain runs in lanes 0..63
                    # against the PREVIOUS executed segment's color chain
                    # in lanes 64..127. The pair is dependency-free —
                    # color consumes the stored geo features — so each
                    # [128,128] block-diagonal matmul replaces two
                    # quarter-utilization 64-wide ones (n_sigma + n_color
                    # passes -> max of the two). The previous segment's
                    # rgb composites here against its stored weights; the
                    # final pending segment drains after the loop. Values
                    # are bit-identical to the unpaired chain: the off-
                    # diagonal blocks are exactly zero and zero products
                    # cannot perturb the f32 partial sums.
                    geo_prev = geo_ref[0:15, :].astype(cdt)
                    hp = jnp.concatenate(
                        [enc, jnp.zeros((64 - f, Nb), cdt), sh, geo_prev,
                         jnp.zeros((33, Nb), cdt)], axis=0)
                    hp = paired_chain(hp)
                    sigma = jnp.exp(jnp.clip(
                        hp[0:1, :].astype(jnp.float32), -15.0, 15.0))
                    geo = hp[1:16, :]
                    rgb_prev = jax.nn.sigmoid(
                        hp[64:67, :].astype(jnp.float32))
                else:
                    h = jnp.concatenate(
                        [enc, jnp.zeros((wd - f, Nb), cdt)], axis=0)
                    for li in range(n_sigma):
                        h = jax.lax.dot_general(
                            w_ref[li].astype(cdt), h,
                            dimension_numbers=(((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32).astype(cdt)
                        if li != n_sigma - 1:
                            h = jnp.maximum(h, 0.0)
                    sigma = jnp.exp(
                        jnp.clip(h[0:1, :].astype(jnp.float32), -15.0, 15.0))
                    geo = h[1:16, :]

                    hc = jnp.concatenate(
                        [sh, geo, jnp.zeros((wd - 31, Nb), cdt)], axis=0)
                    for li in range(n_color):
                        hc = jax.lax.dot_general(
                            w_ref[n_sigma + li].astype(cdt), hc,
                            dimension_numbers=(((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32).astype(cdt)
                        if li != n_color - 1:
                            hc = jnp.maximum(hc, 0.0)
                    rgb = jax.nn.sigmoid(hc[:3, :].astype(jnp.float32))

                # ---- composite (transmittance carried in cum_ref), flat
                vmask = (found & (t >= near_f) & (t <= far_f) & thit_f)
                sg = jnp.where(vmask, sigma * dscale, 0.0)
                tau = sg * dt_s                                  # [1, Nb]
                csum = _cumsum_lanes(tau, Ks, T2)
                c_before = (jnp.concatenate([cum_ref[0:1, :]] * Ks, axis=1)
                            + (csum - tau))
                T_prev = jnp.exp(-c_before)
                include = T_prev >= T_thresh
                wgt = jnp.where(include, (1.0 - jnp.exp(-tau)) * T_prev, 0.0)

                if paired:
                    # rgb contribution of the PREVIOUS executed segment
                    # (zero the first time through via the pending flag);
                    # depth/ws rows need no rgb and accumulate immediately
                    wp = (geo_ref[15:16, :]
                          * (st_ref[2] == 1).astype(jnp.float32))
                    out_ref[b, 0:1, :] += _sum_depth(
                        wp * rgb_prev[0:1, :], Ks, T2)
                    out_ref[b, 1:2, :] += _sum_depth(
                        wp * rgb_prev[1:2, :], Ks, T2)
                    out_ref[b, 2:3, :] += _sum_depth(
                        wp * rgb_prev[2:3, :], Ks, T2)
                else:
                    out_ref[b, 0:1, :] += _sum_depth(wgt * rgb[0:1, :],
                                                     Ks, T2)
                    out_ref[b, 1:2, :] += _sum_depth(wgt * rgb[1:2, :],
                                                     Ks, T2)
                    out_ref[b, 2:3, :] += _sum_depth(wgt * rgb[2:3, :],
                                                     Ks, T2)
                out_ref[b, 3:4, :] += _sum_depth(wgt * t, Ks, T2)
                out_ref[b, 4:5, :] += _sum_depth(wgt, Ks, T2)
                cum_ref[0:1, :] += csum[:, (Ks - 1) * T2:]
                alive = jnp.max(jnp.exp(-cum_ref[0:1, :])) >= T_thresh
                st_ref[0] = alive.astype(jnp.int32)
                if paired:
                    geo_ref[0:15, :] = geo.astype(jnp.float32)
                    geo_ref[15:16, :] = wgt
                    st_ref[2] = 1

            def seg_step(s, _):
                pred = st_ref[0] == 1
                if deformed and not cut:
                    # (in cut mode, samples outside cut_bounds render the
                    # static scene even with no candidates — no skip)
                    # whole-segment skip: no candidates in the segment's
                    # depth range (including the halo) means every sample
                    # is unfound -> sigma 0 -> zero contribution
                    # (reference semantics: samples with no nearby IP are
                    # skipped, raymarching.cu:1316-1371); saves the MLP too
                    slo_i = s * Ks + 1 - halo
                    shi_i = s * Ks + Ks + 1 + halo
                    slo = jnp.where(slo_i <= 0, 0,
                                    bs_ref[b, 0, jnp.maximum(slo_i, 0)])
                    shi = jnp.where(shi_i >= K + 2, bs_ref[b, 0, K + 3],
                                    bs_ref[b, 0, jnp.minimum(shi_i, K + 2)])
                    nonempty = (shi - slo) > 0
                    pred = pred & nonempty

                @pl.when(pred)
                def _():
                    segment(s)
                return 0

            jax.lax.fori_loop(0, n_seg, seg_step, 0)
            if paired:
                @pl.when(st_ref[2] == 1)
                def _drain():
                    # flush the last pending segment's color (its sigma
                    # chain input is zeros; the nets are bias-free so the
                    # top half stays exactly zero)
                    geo_prev = geo_ref[0:15, :].astype(cdt)
                    hp = jnp.concatenate(
                        [jnp.zeros((64, Nb), cdt), sh, geo_prev,
                         jnp.zeros((33, Nb), cdt)], axis=0)
                    hp = paired_chain(hp)
                    rgb = jax.nn.sigmoid(hp[64:67, :].astype(jnp.float32))
                    wp = geo_ref[15:16, :]
                    out_ref[b, 0:1, :] += _sum_depth(wp * rgb[0:1, :],
                                                     Ks, T2)
                    out_ref[b, 1:2, :] += _sum_depth(wp * rgb[1:2, :],
                                                     Ks, T2)
                    out_ref[b, 2:3, :] += _sum_depth(wp * rgb[2:3, :],
                                                     Ks, T2)
            out_ref[b, 5, :] = jnp.full((T2,), st_ref[1].astype(jnp.float32))

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("spec", "K", "Ks", "Ksb", "Wn", "num_seek",
                     "deformed", "cut", "interpret", "block_tiles",
                     "paired"),
)
def render_tiles(
    spec: network.NetworkSpec,
    packed_w: jax.Array,       # [L, Wd, Wd] (Wd = 64 or 128)
    tile_sc: jax.Array,        # [A, 8]  t0, t1, active
    bin_start: jax.Array,      # [A, BS] int32
    params: jax.Array,         # [24] f32
    dirs: jax.Array,           # [A, 8, T2]
    cand: jax.Array,           # [A, P, 16]
    *,
    K: int = 64,
    Ks: int = 16,
    Ksb: int = 4,
    Wn: int = 32,
    num_seek: int = 3,
    deformed: bool = True,
    cut: bool = False,
    interpret: bool = False,
    block_tiles: int = 1,
    paired: "bool | None" = None,
) -> jax.Array:
    """Run the fused kernel over A tiles. Returns out [A, 8, T2]
    (rows: r, g, b, depth, ws, dropped-candidates, pad, pad).

    ``block_tiles`` tiles share one grid step to amortize the per-step
    floor (~9 us at the bench point — 11.2 ms/frame at a_cap=1248,
    tools/kernel_decomp.py). A is padded up to a multiple with inactive
    slots (the pad rows come back zero and callers index by slot)."""
    P = cand.shape[1]
    assert P >= Wn, f"candidate capacity {P} must be >= window {Wn}"
    n_sigma = spec.num_layers
    n_color = spec.num_layers_color
    cdt = jnp.dtype(spec.compute_dtype)
    BS = bin_start.shape[1]
    assert BS >= K + 4, (
        f"bin_start width {BS} < K+4 (prefix counts + appended valid "
        f"count — prep_candidates)")

    assert K % Ks == 0 and Ks % Ksb == 0
    B = max(1, block_tiles)
    A0 = tile_sc.shape[0]
    if A0 % B:
        pad = B - A0 % B
        tile_sc = jnp.concatenate(
            [tile_sc, jnp.zeros((pad,) + tile_sc.shape[1:],
                                tile_sc.dtype)], axis=0)
        bin_start = jnp.concatenate(
            [bin_start, jnp.zeros((pad,) + bin_start.shape[1:],
                                  bin_start.dtype)], axis=0)
        dirs = jnp.concatenate(
            [dirs, jnp.ones((pad,) + dirs.shape[1:], dirs.dtype)], axis=0)
        cand = jnp.concatenate(
            [cand, jnp.zeros((pad,) + cand.shape[1:], cand.dtype)], axis=0)
    A = tile_sc.shape[0]
    wd = packed_w.shape[-1]
    if paired is None:
        # a 128-wide pack for a 64-wide net can only be the block-
        # diagonal sigma||color pairing (wide students have
        # kernel_width == 128 and pack 128-wide to begin with), so
        # callers opt in simply by packing with pack_weights_paired
        paired = (wd == 128 and _fk.kernel_width(spec) == 64)
    if paired:
        assert packed_w.shape == (max(n_sigma, n_color), 128, 128), (
            f"paired=True expects pack_weights_paired layout "
            f"[{max(n_sigma, n_color)}, 128, 128], got {packed_w.shape}")
    kernel = _make_kernel(
        spec, K=K, Ks=Ks, Ksb=Ksb, Wn=Wn, P=P, n_sigma=n_sigma,
        n_color=n_color, num_seek=num_seek, deformed=deformed, cut=cut,
        compute_dtype=cdt, wd=wd, B=B, paired=paired)

    out = pl.pallas_call(
        kernel,
        grid=(A // B,),
        in_specs=[
            pl.BlockSpec((B, 1, 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((B, 1, BS), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 24), lambda i: (0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((B, 8, T2), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, P, PACK_FAST), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((packed_w.shape[0], wd, wd), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, 8, T2), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((A, 8, T2), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((1, T2), jnp.float32),
            pltpu.SMEM((3,), jnp.int32),
        ] + ([pltpu.VMEM((16, T2 * Ks), jnp.float32)] if paired else []),
        interpret=interpret,
    )(tile_sc[:, None, :], bin_start[:, None, :],
      params.reshape(1, 1, 24), dirs, cand, packed_w)
    return out[:A0]
