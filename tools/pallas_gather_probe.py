"""Round-2 roadmap item 5, settled with numbers: can a Mosaic kernel beat
the 0.03 G rows/s gather ceiling (PERF.md "Row-gather spike") that makes
imported hashgrid checkpoints non-interactive?

Three mechanisms a TPU kernel has for data-dependent fetch:

  A. one-hot MXU fetch from a VMEM-resident table: out = onehot @ table.
     Exact, but the MAC cost per fetch is table_rows * row_width — it
     scales INVERSELY with table size. Measured at several table sizes to
     price the "small dense levels via MXU" hybrid.
  B. per-row dynamic slice (pl.ds) from a VMEM-resident table inside a
     fori_loop — the raw dynamic-addressing rate of the memory system
     (serial by construction; measures the per-access floor).
  C. XLA take() baseline on the same shapes (the known ~0.03 G rows/s).

A hashgrid frame needs ~134M fetches (8.4M samples x 16 levels); go/no-go
is whether ANY mechanism reaches O(10) G rows/s. Results land in PERF.md.
"""
import json
import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def time_it(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    s = float(jnp.sum(out))        # force through the tunnel
    t0 = time.perf_counter()
    for i in range(reps):
        out = fn(*args)
        s += float(jnp.sum(out))   # distinct fetch per rep via sum chain
    dt = (time.perf_counter() - t0) / reps
    return dt, s


# --- A: one-hot MXU fetch, table resident in VMEM --------------------------

def onehot_fetch(table, idx, chunk=2048):
    """out[b] = table[idx[b]] via chunked one-hot matmuls (exact: the
    one-hot rows select f32 values untruncated when accumulated at
    HIGHEST; here default precision is fine because a 0/1 matmul with
    bf16 passes still moves each f32 row... NO — it truncates. Use
    HIGHEST: this probe prices the exact fetch)."""
    T, Wd = table.shape
    B = idx.shape[0]

    def kernel(idx_ref, tab_ref, out_ref):
        acc = jnp.zeros((out_ref.shape[0], Wd), jnp.float32)
        iv = idx_ref[0, :].astype(jnp.int32)                 # [Bb]
        Bb = iv.shape[0]
        iv2 = jax.lax.broadcast_in_dim(iv, (Bb, 1), (0,))
        for c0 in range(0, T, chunk):
            rows = jax.lax.broadcasted_iota(
                jnp.int32, (Bb, chunk), 1) + c0
            oh = (rows == iv2).astype(jnp.float32)           # [Bb, chunk]
            acc += jax.lax.dot_general(
                oh, tab_ref[pl.ds(c0, chunk), :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
        out_ref[:, :] = acc

    Bb = 512
    return pl.pallas_call(
        kernel,
        grid=(B // Bb,),
        in_specs=[
            pl.BlockSpec((1, Bb), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((T, Wd), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Bb, Wd), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Wd), jnp.float32),
    )(idx.reshape(B // Bb, Bb), table)


# --- D: per-row async DMA from an HBM-resident table ------------------------
# (round-3 review asked for the "HBM with double-buffered DMA" arm by name.)

def dma_fetch(table, idx, depth=8):
    """out[b] = table[idx[b]] via row DMAs HBM->VMEM, `depth` in flight.

    This is the mechanism a persistent-table kernel would use when the
    table exceeds VMEM (the 2^19-row hashgrid levels): dynamic-address
    row copies issued ahead of consumption. The per-descriptor cost is
    the quantity being measured."""
    T, Wd = table.shape
    B = idx.shape[0]
    Bb = 512

    def kernel(idx_ref, tab_hbm, out_ref):
        def body(scratch, sems):
            def get_dma(slot, b):
                return pltpu.make_async_copy(
                    tab_hbm.at[pl.ds(idx_ref[0, b].astype(jnp.int32), 1), :],
                    scratch.at[pl.ds(slot, 1), :],
                    sems.at[slot])

            # warm-up: fill the pipeline
            for s in range(depth):
                get_dma(s, s).start()

            def loop(b, _):
                slot = jax.lax.rem(b, depth)
                get_dma(slot, b).wait()
                out_ref[pl.ds(b, 1), :] = scratch[pl.ds(slot, 1), :]

                nb = b + depth

                @pl.when(nb < Bb)
                def _():
                    get_dma(slot, nb).start()

                return 0

            jax.lax.fori_loop(0, Bb, loop, 0)

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((depth, Wd), jnp.float32),
            sems=pltpu.SemaphoreType.DMA((depth,)),
        )

    return pl.pallas_call(
        kernel,
        grid=(B // Bb,),
        in_specs=[
            pl.BlockSpec((1, Bb), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),   # table stays in HBM
        ],
        out_specs=pl.BlockSpec((Bb, Wd), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Wd), jnp.float32),
    )(idx.reshape(B // Bb, Bb), table)


# --- E: Mosaic-native take() on a VMEM-resident table ------------------------

def vmem_take_fetch(table, idx):
    """out[b] = table[idx[b]] via jnp.take INSIDE the kernel — probes
    whether Mosaic lowers a vector gather on a VMEM table to something
    better than the serial pl.ds loop (it has a dynamic-gather path for
    small tables on newer toolchains)."""
    T, Wd = table.shape
    B = idx.shape[0]
    Bb = 2048

    def kernel(idx_ref, tab_ref, out_ref):
        iv = idx_ref[0, :].astype(jnp.int32)
        out_ref[:, :] = jnp.take(tab_ref[:, :], iv, axis=0)

    return pl.pallas_call(
        kernel,
        grid=(B // Bb,),
        in_specs=[
            pl.BlockSpec((1, Bb), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((T, Wd), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Bb, Wd), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Wd), jnp.float32),
    )(idx.reshape(B // Bb, Bb), table)


# --- B: serial pl.ds dynamic-slice fetch -----------------------------------

def dynslice_fetch(table, idx):
    T, Wd = table.shape
    B = idx.shape[0]

    def kernel(idx_ref, tab_ref, out_ref):
        Bb = out_ref.shape[0]

        def body(b, _):
            out_ref[pl.ds(b, 1), :] = tab_ref[
                pl.ds(idx_ref[0, b].astype(jnp.int32), 1), :]
            return 0

        jax.lax.fori_loop(0, Bb, body, 0)

    Bb = 512
    return pl.pallas_call(
        kernel,
        grid=(B // Bb,),
        in_specs=[
            pl.BlockSpec((1, Bb), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((T, Wd), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Bb, Wd), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Wd), jnp.float32),
    )(idx.reshape(B // Bb, Bb), table)


def main():
    res = {}
    key = jax.random.PRNGKey(0)
    B = 1 << 16                                   # fetches per call

    for T in (1 << 11, 1 << 13, 1 << 15):
        Wd = 128                                  # padded row (2 f32 used)
        table = jax.random.normal(key, (T, Wd), jnp.float32)
        idx = jax.random.randint(key, (B,), 0, T, jnp.int32)

        fa = jax.jit(functools.partial(onehot_fetch, chunk=min(T, 2048)))
        dt, _ = time_it(fa, table, idx)
        res[f"A_onehot_T{T}"] = {
            "rows_per_s": round(B / dt / 1e9, 4),
            "unit": "G rows/s", "ms_per_call": round(dt * 1e3, 3)}

        if T <= (1 << 13):
            fb = jax.jit(dynslice_fetch)
            try:
                dt, _ = time_it(fb, table, idx, reps=2)
                res[f"B_dynslice_T{T}"] = {
                    "rows_per_s": round(B / dt / 1e9, 5),
                    "ms_per_call": round(dt * 1e3, 3)}
            except Exception as e:  # Mosaic may reject; that IS the result
                res[f"B_dynslice_T{T}"] = {"error": str(e)[:300]}

        fc = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
        dt, _ = time_it(fc, table, idx)
        res[f"C_xla_take_T{T}"] = {
            "rows_per_s": round(B / dt / 1e9, 4),
            "ms_per_call": round(dt * 1e3, 3)}

        fd = jax.jit(dma_fetch)
        try:
            dt, _ = time_it(fd, table, idx, reps=2)
            res[f"D_dma_T{T}"] = {
                "rows_per_s": round(B / dt / 1e9, 5),
                "ms_per_call": round(dt * 1e3, 3)}
        except Exception as e:
            res[f"D_dma_T{T}"] = {"error": str(e)[:300]}

        fe = jax.jit(vmem_take_fetch)
        try:
            dt, _ = time_it(fe, table, idx)
            res[f"E_vmem_take_T{T}"] = {
                "rows_per_s": round(B / dt / 1e9, 4),
                "ms_per_call": round(dt * 1e3, 3)}
        except Exception as e:
            res[f"E_vmem_take_T{T}"] = {"error": str(e)[:300]}

    # price the hashgrid hybrid: levels 0..L-1 have min(res_l^3, 2^19)
    # rows; one-hot cost per fetch ~ rows * 128 MAC. Assume measured MXU
    # rate from the largest A probe.
    a_big = res.get("A_onehot_T32768", res.get("A_onehot_T8192"))
    res["verdict_hint"] = (
        "one-hot scales inversely with table size; dynslice is the "
        "serial floor; see PERF.md for the go/no-go arithmetic")
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
