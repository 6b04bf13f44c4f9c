"""Decompose prep_candidates cost at the bench shape ([~1248 tiles x
3053 IPs], P=256): beam test, top_k, the [A, P, 16] row gather, binning.
Round-3: prep is ~10.4 ms of the 21.6 ms default frame
(tools/profile_fused.py) — find the milliseconds."""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def median_ms(step, fetch, n=16, reps=3):
    step(0)
    fetch()
    outs = []
    k = 1
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            step(k)
            k += 1
        fetch()
        outs.append((time.perf_counter() - t0) / n * 1e3)
    return float(np.median(outs))


def main():
    A, nIP, P, K = 1248, 3053, 256, 128
    rng = np.random.RandomState(0)
    ip_pack = jnp.asarray(rng.randn(nIP, 16).astype(np.float32))
    p_def = jnp.asarray(rng.uniform(-0.5, 0.5, (nIP, 3)).astype(np.float32))
    origin = jnp.asarray(np.tile([[0.0, 0.0, -2.5]], (A, 1)).astype(np.float32))
    ax = rng.randn(A, 3).astype(np.float32)
    ax[:, 2] = np.abs(ax[:, 2]) + 3.0
    ax /= np.linalg.norm(ax, axis=1, keepdims=True)
    axis = jnp.asarray(ax)
    tan_half = jnp.full((A,), 0.0125, jnp.float32)
    t0v = jnp.full((A,), 1.0, jnp.float32)
    t1v = jnp.full((A,), 4.0, jnp.float32)

    @jax.jit
    def beam_topk(eps):
        proj = None
        lat2 = None
        pd = p_def + eps
        for i in range(3):
            rel = pd[None, :, i] - origin[:, i:i + 1]
            c = rel * axis[:, i:i + 1]
            proj = c if proj is None else proj + c
            lat2 = rel * rel if lat2 is None else lat2 + rel * rel
        lat2 = lat2 - proj * proj
        radius = tan_half[:, None] * jnp.clip(proj, 0.0, None) + 0.1
        ok = (lat2 <= radius * radius) & (proj >= t0v[:, None]) \
            & (proj <= t1v[:, None])
        keyv = jnp.where(ok, -proj, -jnp.inf)
        negproj, ids = jax.lax.top_k(keyv, P)
        return negproj, ids

    @jax.jit
    def beam_only(eps):
        proj = None
        lat2 = None
        pd = p_def + eps
        for i in range(3):
            rel = pd[None, :, i] - origin[:, i:i + 1]
            c = rel * axis[:, i:i + 1]
            proj = c if proj is None else proj + c
            lat2 = rel * rel if lat2 is None else lat2 + rel * rel
        lat2 = lat2 - proj * proj
        radius = tan_half[:, None] * jnp.clip(proj, 0.0, None) + 0.1
        ok = (lat2 <= radius * radius) & (proj >= t0v[:, None]) \
            & (proj <= t1v[:, None])
        return jnp.where(ok, -proj, -jnp.inf)

    @jax.jit
    def approx_topk(eps):
        keyv = beam_only.__wrapped__(eps) if hasattr(beam_only, "__wrapped__") \
            else None
        # recompute inline (jit boundaries keep the comparison honest)
        proj = None
        lat2 = None
        pd = p_def + eps
        for i in range(3):
            rel = pd[None, :, i] - origin[:, i:i + 1]
            c = rel * axis[:, i:i + 1]
            proj = c if proj is None else proj + c
            lat2 = rel * rel if lat2 is None else lat2 + rel * rel
        lat2 = lat2 - proj * proj
        radius = tan_half[:, None] * jnp.clip(proj, 0.0, None) + 0.1
        ok = (lat2 <= radius * radius) & (proj >= t0v[:, None]) \
            & (proj <= t1v[:, None])
        keyv = jnp.where(ok, -proj, -jnp.inf)
        return jax.lax.approx_max_k(keyv, P, recall_target=0.95,
                                    aggregate_to_topk=True)

    @jax.jit
    def gather_rows(ids):
        return ip_pack[ids]                                    # [A, P, 16]

    @jax.jit
    def onehot_rows(ids):
        # MXU fetch: one-hot [A, P, nIP] @ ip_pack [nIP, 16]
        oh = (ids[:, :, None] ==
              jnp.arange(nIP, dtype=jnp.int32)[None, None, :])
        return jnp.einsum("apn,nf->apf", oh.astype(jnp.bfloat16),
                          ip_pack.astype(jnp.bfloat16))

    @jax.jit
    def binning(negproj, t0e, t1e):
        cproj = -negproj
        valid = jnp.isfinite(cproj)
        count = jnp.sum(valid, axis=1)
        cp = jnp.where(valid, cproj, jnp.inf)
        dt = (t1e - t0e) / K
        edges = (t0e[:, None]
                 + (jnp.arange(K + 3, dtype=jnp.float32)[None, :] - 1.0)
                 * dt[:, None])
        bs = jnp.sum(cp[:, :, None] < edges[:, None, :], axis=1)
        return bs.astype(jnp.int32), count

    acc = [None]

    def mk(stepfn):
        def step(k):
            acc[0] = stepfn(jnp.float32(1e-6 * k))
        return step

    def fetch():
        leaf = jax.tree_util.tree_leaves(acc[0])[0]
        return float(jnp.asarray(leaf).ravel()[0])

    t_beam = median_ms(mk(beam_only), fetch)
    print(f"beam test only:            {t_beam:.2f} ms")
    t_bt = median_ms(mk(beam_topk), fetch)
    print(f"beam + top_k(P=256):       {t_bt:.2f} ms   (top_k ~ "
          f"{t_bt - t_beam:.2f})")
    t_ap = median_ms(mk(approx_topk), fetch)
    print(f"beam + approx_max_k:       {t_ap:.2f} ms")

    _, ids = beam_topk(jnp.float32(0.0))

    def g_step(k):
        acc[0] = gather_rows(jnp.where(ids < nIP - 1, ids + (k % 2), ids))
    print(f"row gather [A,P,16]:       {median_ms(g_step, fetch):.2f} ms")

    def o_step(k):
        acc[0] = onehot_rows(jnp.where(ids < nIP - 1, ids + (k % 2), ids))
    print(f"one-hot MXU fetch:         {median_ms(o_step, fetch):.2f} ms")

    npj, _ = beam_topk(jnp.float32(0.0))

    def b_step(k):
        acc[0] = binning(npj + 1e-6 * k, t0v, t1v)
    print(f"binning (K+3 edges):       {median_ms(b_step, fetch):.2f} ms")


if __name__ == "__main__":
    main()
