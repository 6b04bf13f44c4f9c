"""Tile-beam quadratic bending — gather-free inner loop.

The cached spatial-hash bending (ops/bending.py) costs ~12 random-memory
touches per sample; at the measured 0.1 G touches/s (PERF.md) that is
seconds per frame. This module restructures the candidate search around
image tiles:

1. per (tile, frame): IPs intersecting the tile's view beam are compacted
   into a fixed candidate set (ONE row-gather of ~192 packed rows per tile,
   amortized over ~16k samples),
2. candidates are scattered into depth bins aligned with the tile's uniform
   sample grid, so every sample's candidate set is a STATIC slice of three
   adjacent bins — zero per-sample gathers,
3. nearest-IP selection and data fetch run as argmin passes + one-hot
   einsum contractions (MXU), and the Newton inversion (see ops/bending.py
   for the math/conventions) runs on [..., T2, K]-shaped component arrays
   (batch dims minormost).

IP data is packed per frame as rows of 42 floats:
    [p_def(3), p_ori(3), F(9, row-major d*3+c), dF(27, j*9+d*3+c)]
padded to 48.
"""

from __future__ import annotations


from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

# true-f32 contractions: DEFAULT f32 matmul precision on TPU is one bf16
# pass; the one-hot data fetch in particular must not truncate the fetched
# candidate rows (positions / F entries) to bf16 (see sim/solver._HI)
_HI = jax.lax.Precision.HIGHEST

PACK = 48
PACK_FAST = 16


def pack_ip_data(p_def: jax.Array, p_ori: jax.Array, F: jax.Array,
                 dF: jax.Array) -> jax.Array:
    """[nIP, 48] packed rows (see module doc)."""
    n = p_def.shape[0]
    flat = jnp.concatenate([
        p_def, p_ori,
        F.reshape(n, 9),
        dF.reshape(n, 27),
        jnp.zeros((n, PACK - 43), p_def.dtype),
        jnp.ones((n, 1), p_def.dtype),        # last slot: validity flag
    ], axis=1)
    return flat


def pack_ip_data_fast(p_def: jax.Array, p_ori: jax.Array, F: jax.Array,
                      dF: jax.Array) -> jax.Array:
    """[nIP, 16] compact rows for the single-Newton-step fast path.

    With max_iter_num == 1 the Newton inversion is exactly
    p_rest = p_ori + F^{-1} (x - p_def)  (dF terms vanish at q = 0), so the
    per-sample fetch only needs [p_def(3), p_ori(3), F^{-1}(9, row-major),
    valid(1)]. F is inverted once per frame per IP. The chair demo runs
    --max_iter_num 1 (reference README.md:123)."""
    n = p_def.shape[0]
    from pienerf_tpu.ops.bending import _inv3x3
    Finv, ok = _inv3x3(F)
    flat = jnp.concatenate([
        p_def, p_ori,
        Finv.reshape(n, 9),
        jnp.where(ok, 1.0, 0.0)[:, None],     # last slot: validity flag
    ], axis=1)
    return flat


def pack_for(settings: "BeamBendSettings", p_def, p_ori, F, dF) -> jax.Array:
    """Choose the pack layout matching the settings' Newton depth."""
    if settings.max_iter_num == 1:
        return pack_ip_data_fast(p_def, p_ori, F, dF)
    return pack_ip_data(p_def, p_ori, F, dF)


class BeamBendSettings(NamedTuple):
    num_seek_ip: int = 3
    max_iter_num: int = 1
    ip_dx: float = 0.0525
    ips_per_tile: int = 192       # P: beam candidate capacity
    bin_capacity: int = 8         # B: IPs per depth bin
    beam_margin: float = 0.0      # world-space slack around the beam.
    #                               0 = auto: max(0.08, bend reach). The
    #                               beam test is the candidate-list GATE —
    #                               a margin below the bend reach excludes
    #                               IPs that can still influence edge-of-
    #                               beam samples, and the round-5 sweep
    #                               measured that as the mid-amplitude
    #                               fidelity floor (amp-0.6 twist: 48.4 dB
    #                               vs exact at margin 0.08, 94.3 dB at
    #                               margin = reach; margin-only vs
    #                               reach-only isolation in PERF.md).
    halo_bins: int = 1            # XLA fallback path only: bins each side
    #                               of a sample's own bin in its candidate
    #                               window (static; see auto_halo). The
    #                               fused kernel instead derives a PER-TILE
    #                               halo from bend_reach, which adapts to
    #                               each tile's bin width.
    bend_reach: float = 0.0       # world-space candidate reach per sample
    #                               (fused kernel). 0 = auto: 2 * ip_dx.
    #                               The Newton reject bounds the PER-AXIS
    #                               rest-space move |F^-1 (x - p_def)| by
    #                               ip_dx, so an accepted IP can sit up to
    #                               sqrt(3) * ||F|| * ip_dx ~ 2 * ip_dx
    #                               from the sample in deformed space. The
    #                               round-3 fidelity find (tools/
    #                               halo_probe*.py): the round-2 fixed
    #                               +-1-bin halo truncated this reach to
    #                               one bin (span/K world units), losing
    #                               2-7 dB vs exact bending as K grew.


def reach_of(settings: "BeamBendSettings") -> float:
    """Effective world-space candidate reach (see bend_reach)."""
    return (settings.bend_reach if settings.bend_reach > 0.0
            else 2.0 * settings.ip_dx)


def margin_of(settings: "BeamBendSettings") -> float:
    """Effective beam margin (see beam_margin): never below the bend
    reach, or edge-of-beam samples lose reachable IPs at the gate.
    Measured at the amp-0.6 worst point of the round-5 amplitude sweep
    (tools/fidelity_sweep.py + PERF.md): margin factors 0.9-1.1x of the
    reach all read 94.3 dB vs exact (vs 48.4 dB at the old fixed 0.08);
    1.25x reads 92.3 and >=1.4x floods the Wn=64 windows and falls to 81.
    1.0x is the principled point: the gate is never tighter than the
    influence radius it feeds."""
    return (settings.beam_margin if settings.beam_margin > 0.0
            else max(0.08, reach_of(settings)))


def auto_halo(reach: float, span: float, K: int) -> int:
    """Static halo bins for the XLA fallback path: cover `reach` world
    units each side of a sample when a bin is span/K wide. Use a LOWER
    span estimate when unsure — too many halo bins costs VPU work, too
    few silently misassigns nearest IPs (tools/halo_probe.py)."""
    import math
    return max(1, int(math.ceil(reach * K / max(span, 1e-6))))


def count_in_beam(
    settings: "BeamBendSettings",
    p_def: jax.Array,            # [nIP, 3]
    origin: jax.Array,           # [3] shared camera origin
    axis: jax.Array,             # [A, 3] central ray directions (unit)
    tan_half: jax.Array,         # [A] or scalar
    t0: jax.Array,               # [A]
    t1: jax.Array,               # [A]
) -> jax.Array:
    """Per-tile count of IPs passing the beam candidate gate — the SAME
    test as select_tile_candidates / tile_kernel.prep_candidates (same
    margin_of slack), evaluated for every tile of the frame.

    Used for candidate-count tile activity (round-4 review item 3): in
    deformed non-cut rendering a tile with count 0 provably renders as
    pure background (every sample is unfound -> sigma = 0), so it never
    needs a kernel slot. Componentwise [A, nIP] planes only (the [A, nIP,
    3] form pads 3 -> 128 lanes; PERF.md layout rule)."""
    proj = None
    lat2 = None
    for i in range(3):
        rel = p_def[None, :, i] - origin[i]                     # [A broadcast]
        c = rel * axis[:, i:i + 1]
        proj = c if proj is None else proj + c
        lat2 = rel * rel if lat2 is None else lat2 + rel * rel
    lat2 = lat2 - proj * proj
    margin = margin_of(settings)
    tan_half = jnp.broadcast_to(tan_half, t0.shape)
    radius = tan_half[:, None] * jnp.clip(proj, 0.0, None) + margin
    ok = (
        (lat2 <= radius * radius)
        & (proj >= t0[:, None] - margin)
        & (proj <= t1[:, None] + margin)
    )
    return jnp.sum(ok, axis=1)


def select_tile_candidates(
    settings: BeamBendSettings,
    ip_pack: jax.Array,          # [nIP, 48]
    p_def: jax.Array,            # [nIP, 3]
    origin: jax.Array,           # [C, 3] tile beam origins (camera)
    axis: jax.Array,             # [C, 3] central ray directions (unit)
    tan_half: jax.Array,         # [C] beam half-width growth per unit depth
    t0: jax.Array,               # [C] tile near
    t1: jax.Array,               # [C] tile far
    return_dropped: bool = False,
) -> Tuple[jax.Array, ...]:
    """Per-tile candidate compaction.

    Returns (cand_pack [C, P, 48], proj [C, P] depth along axis,
    mask [C, P]); with ``return_dropped`` also the per-tile count of
    in-beam IPs that did not fit in P (the capacity-drop counter the
    fused kernel reports natively — needed so an 'uncapped' reference
    render can PROVE it dropped nothing).
    """
    P = settings.ips_per_tile
    rel = p_def[None, :, :] - origin[:, None, :]               # [C, nIP, 3]
    proj = jnp.einsum("cnd,cd->cn", rel, axis)                 # [C, nIP]
    lat2 = jnp.sum(rel * rel, axis=-1) - proj * proj
    margin = margin_of(settings)
    radius = tan_half[:, None] * jnp.clip(proj, 0.0, None) + margin
    ok = (
        (lat2 <= radius * radius)
        & (proj >= t0[:, None] - margin)
        & (proj <= t1[:, None] + margin)
    )                                                           # [C, nIP]

    # rank-compact up to P candidate ids per tile
    rank = jnp.cumsum(ok, axis=1) - 1
    take = ok & (rank < P)
    c_rows = jnp.broadcast_to(jnp.arange(ok.shape[0])[:, None], ok.shape)
    src = jnp.broadcast_to(jnp.arange(ok.shape[1], dtype=jnp.int32)[None],
                           ok.shape)
    ids = jnp.zeros((ok.shape[0], P), jnp.int32)
    ids = ids.at[c_rows, jnp.where(take, rank, P)].set(
        jnp.where(take, src, 0), mode="drop")
    count = jnp.sum(take, axis=1)
    mask = jnp.arange(P)[None, :] < count[:, None]

    cand_pack = ip_pack[ids]                                    # [C, P, 48]
    cand_proj = jnp.einsum("cpd,cd->cp", cand_pack[..., :3] - origin[:, None, :],
                           axis, precision=_HI)
    if return_dropped:
        dropped = jnp.sum(ok, axis=1) - count                   # [C]
        return cand_pack, cand_proj, mask, dropped
    return cand_pack, cand_proj, mask


def bin_candidates(
    settings: BeamBendSettings,
    cand_pack: jax.Array,        # [C, P, 48]
    cand_proj: jax.Array,        # [C, P]
    mask: jax.Array,             # [C, P]
    t0: jax.Array,               # [C]
    dt_bin: jax.Array,           # [C] bin width ((t1-t0)/K)
    n_bins: int,                 # K + 2*halo_bins (halo bins at each end)
    return_dropped: bool = False,
):
    """Scatter candidates into depth bins. Returns [C, n_bins, B, 48]
    (zero rows where empty; p_def rows of empties stay at 0 which is
    rejected later by the distance test). With ``return_dropped`` also
    returns the per-tile count of candidates that overflowed their bin's
    capacity B (window-truncation counter)."""
    B = settings.bin_capacity
    C, P = cand_proj.shape
    width = cand_pack.shape[-1]
    b = jnp.clip(jnp.floor((cand_proj - t0[:, None]) / dt_bin[:, None]).astype(
        jnp.int32) + settings.halo_bins, 0, n_bins - 1)         # halo offset
    b = jnp.where(mask, b, n_bins)                              # dropped

    # rank within (tile, bin): sort by bin then positional scan
    order = jnp.argsort(b, axis=1)
    b_sorted = jnp.take_along_axis(b, order, axis=1)
    pos = jnp.broadcast_to(jnp.arange(P)[None], (C, P))
    changed = jnp.concatenate(
        [jnp.ones((C, 1), bool), b_sorted[:, 1:] != b_sorted[:, :-1]], axis=1)
    start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(changed, pos, 0), axis=1)
    rank = pos - start

    rows = jnp.broadcast_to(jnp.arange(C)[:, None], (C, P))
    keep = (b_sorted < n_bins) & (rank < B)
    slot = jnp.where(keep, b_sorted * B + rank, n_bins * B)
    src_pack = jnp.take_along_axis(cand_pack, order[..., None], axis=1)
    bins = jnp.zeros((C, n_bins * B, width), cand_pack.dtype)
    bins = bins.at[rows, slot].set(
        jnp.where(keep[..., None], src_pack, 0.0), mode="drop")
    if return_dropped:
        dropped = jnp.sum((b_sorted < n_bins) & (rank >= B), axis=1)  # [C]
        return bins.reshape(C, n_bins, B, width), dropped
    return bins.reshape(C, n_bins, B, width)


def _inv3x3_c(m):
    """Closed-form inverse of 3x3 given as tuple-of-rows-of-components
    [(m00, m01, m02), ...] with each entry an array. Returns (inv, ok)."""
    (a, b, c), (d, e, f), (g, h, i) = m
    A = e * i - f * h
    B = f * g - d * i
    Cc = d * h - e * g
    det = a * A + b * B + c * Cc
    ok = jnp.abs(det) > 1e-20
    r = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
    inv = (
        (r * A, r * (c * h - b * i), r * (b * f - c * e)),
        (r * B, r * (a * i - c * g), r * (c * d - a * f)),
        (r * Cc, r * (b * g - a * h), r * (a * e - b * d)),
    )
    return inv, ok


def newton_invert_packed(x, sel, max_iter: int):
    """Newton rest-space solve on one-hot-selected candidate data.

    x: tuple of 3 arrays [...]; sel: [42+, ...] packed candidate data with
    the PACK axis FIRST (batch dims minormost). Returns (p_rest tuple of 3,
    moved_ok-independent raw solve; callers apply the ip_dx test).
    """
    pd = sel[0:3]
    po = sel[3:6]
    Fm = tuple(tuple(sel[6 + r * 3 + c] for c in range(3)) for r in range(3))
    dFm = tuple(
        tuple(tuple(sel[15 + j * 9 + r * 3 + c] for c in range(3))
              for r in range(3))
        for j in range(3))

    qt = tuple(x[i] - pd[i] for i in range(3))                 # target
    q = tuple(jnp.zeros_like(qt[0]) for _ in range(3))

    for _ in range(max_iter):
        # dFq[d][c] = sum_j dF[j][d][c] q[j]
        dFq = tuple(
            tuple(sum(dFm[j][d][c] * q[j] for j in range(3)) for c in range(3))
            for d in range(3))
        J = tuple(
            tuple(Fm[d][c] + dFq[d][c] for c in range(3)) for d in range(3))
        Jinv, ok = _inv3x3_c(J)
        # residual r = F q + 0.5 dFq q - qt
        Fq = tuple(sum(Fm[d][c] * q[c] for c in range(3)) for d in range(3))
        dFqq = tuple(sum(dFq[d][c] * q[c] for c in range(3)) for d in range(3))
        res = tuple(Fq[d] + 0.5 * dFqq[d] - qt[d] for d in range(3))
        dq = tuple(sum(Jinv[d][c] * res[c] for c in range(3)) for d in range(3))
        q = tuple(jnp.where(ok, q[d] - dq[d], q[d]) for d in range(3))

    return tuple(po[d] + q[d] for d in range(3))


def bend_tile_samples(
    settings: BeamBendSettings,
    bins: jax.Array,             # [C, n_bins, B, 48]
    x: Tuple[jax.Array, jax.Array, jax.Array],   # each [C, T2, K]
    sample_bin: None = None,     # samples are bin-aligned: sample k -> bin
    #                              k + halo_bins
) -> Tuple[Tuple[jax.Array, jax.Array, jax.Array], jax.Array]:
    """Bend tile samples. Sample at depth index k sees candidate bins
    k .. k + 2*halo_bins (i.e. its own bin plus halo_bins neighbors each
    side — enough to cover ip_dx in world units, see auto_halo).

    Returns (mapped positions (3 x [C, T2, K]), found [C, T2, K])."""
    C, n_bins, B, width = bins.shape
    fast = width == PACK_FAST      # single-Newton-step compact layout
    h = settings.halo_bins
    K = n_bins - 2 * h
    T2 = x[0].shape[1]
    kseek = settings.num_seek_ip

    # candidate window per depth index: [C, K, (2h+1)B, width]
    win = jnp.concatenate(
        [bins[:, j:K + j] for j in range(2 * h + 1)], axis=2)

    # distances laid out [C, WB, T2, K] (WB = (2h+1)B): the candidate axis
    # must stay OFF the minor dims — a [.., K, WB] layout pads WB=24 lanes
    # to 128 (5.3x HBM inflation, measured dominant; PERF.md layout rule)
    WB = (2 * h + 1) * B
    d2 = None
    for i in range(3):
        pc = win[..., i]                                        # [C, K, WB]
        diff = x[i][:, None, :, :] - jnp.swapaxes(pc, 1, 2)[:, :, None, :]
        d2 = diff * diff if d2 is None else d2 + diff * diff
    # empty slots carry validity flag 0 (last pack slot)
    empty = jnp.swapaxes(win[..., width - 1] == 0.0, 1, 2)      # [C, WB, K]
    d2 = jnp.where(empty[:, :, None, :], jnp.inf, d2)

    sidx = jnp.arange(WB)[None, :, None, None]                  # [1,WB,1,1]
    mapped = [jnp.zeros_like(x[i]) for i in range(3)]
    wsum = jnp.zeros_like(x[0])
    d2_work = d2
    for _ in range(kseek):
        j = jnp.argmin(d2_work, axis=1)                         # [C, T2, K]
        best = jnp.min(d2_work, axis=1)
        has = jnp.isfinite(best)
        onehot = (sidx == j[:, None, :, :]).astype(bins.dtype)  # [C,3B,T2,K]
        onehot = onehot * has[:, None, :, :]
        # fetch candidate rows: [width, C, T2, K]
        sel = jnp.einsum("cstk,cksp->pctk", onehot, win, precision=_HI)
        if fast:
            # p_rest = p_ori + F^{-1} (x - p_def): exact single Newton step
            pd, po, Fi = sel[0:3], sel[3:6], sel[6:15]
            q = tuple(x[i] - pd[i] for i in range(3))
            p_rest = tuple(
                po[d] + Fi[d * 3 + 0] * q[0] + Fi[d * 3 + 1] * q[1]
                + Fi[d * 3 + 2] * q[2]
                for d in range(3))
        else:
            p_rest = newton_invert_packed(
                tuple(x[i] for i in range(3)), sel, settings.max_iter_num)
        # reject diverged solutions (> ip_dx per axis from the rest IP)
        ok = has
        for i in range(3):
            ok = ok & (jnp.abs(p_rest[i] - sel[3 + i]) <= settings.ip_dx)
        w = jnp.where(ok, 1.0 / jnp.maximum(jnp.sqrt(best), 1e-8), 0.0)
        for i in range(3):
            mapped[i] = mapped[i] + w * p_rest[i]
        wsum = wsum + w
        d2_work = jnp.where(sidx == j[:, None, :, :], jnp.inf, d2_work)

    found = wsum > 0
    inv = 1.0 / jnp.maximum(wsum, 1e-30)
    out = tuple(jnp.where(found, mapped[i] * inv, x[i]) for i in range(3))
    return out, found
