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


def time_it(fetch, table, idx, reps=5):
    """Per-call time of `fetch(table, idx)` with DEVICE-side rep loops:
    the tunnel's host fetch costs ~30 ms flat, so reps run inside one jit
    (index perturbed per rep against memoization/DCE), R is auto-scaled to
    ~0.5 s of device work, and the flat dispatch+fetch constant is removed
    by differencing median R-rep and 1-rep timings."""
    del reps
    T = table.shape[0]

    def looped(R):
        @jax.jit
        def f(tab, ix, base):
            def body(i, s):
                out = fetch(tab, (ix + base + i) % T)
                return s + jnp.sum(out)
            return jax.lax.fori_loop(0, R, body, jnp.float32(0.0))
        return f

    def timed(f, base):
        t0 = time.perf_counter()
        s = float(f(table, idx, base))
        return time.perf_counter() - t0, s

    f1 = looped(1)
    _, s = timed(f1, 0)                        # warm / compile
    f8 = looped(8)
    timed(f8, 1)                               # warm / compile
    dt8, _ = timed(f8, 2)
    R = int(min(2048, max(16, 0.5 / max(dt8 / 8, 1e-6))))
    fR = looped(R)
    timed(fR, 3)                               # warm / compile
    t1s, tRs = [], []
    for k in (4, 5, 6):
        tRs.append(timed(fR, k)[0])
        t1s.append(timed(f1, k)[0])
    t1 = sorted(t1s)[1]
    dt = (sorted(tRs)[1] - t1) / (R - 1)
    # a non-positive (or <2% of the 1-rep wall) difference means timer
    # noise swamped the per-rep cost: report it as invalid rather than
    # clamping to 1e-9 and printing ~1e9x throughput (ADVICE r4)
    if dt <= max(0.02 * t1 / max(R - 1, 1), 0.0):
        raise ValueError(
            f"noise-dominated: diff {dt*1e6:.2f} us/rep vs 1-rep wall "
            f"{t1*1e3:.2f} ms (R={R})")
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
        Bb = out_ref.shape[0]
        acc = jnp.zeros((Bb, Wd), jnp.float32)
        g = pl.program_id(0)
        row = idx_ref[pl.ds(g, 1), :].astype(jnp.int32)      # [1, Bb]
        for c0 in range(0, T, chunk):
            # transpose-free one-hot: build [chunk, Bb] and contract dim 0
            rows = jax.lax.broadcasted_iota(
                jnp.int32, (chunk, Bb), 0) + c0
            oh_t = (rows == row).astype(jnp.float32)         # [chunk, Bb]
            acc += jax.lax.dot_general(
                oh_t, tab_ref[pl.ds(c0, chunk), :],
                dimension_numbers=(((0,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
        out_ref[:, :] = acc

    Bb = 512
    return pl.pallas_call(
        kernel,
        grid=(B // Bb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # full idx array
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
                    tab_hbm.at[pl.ds(
                        idx_ref[pl.program_id(0), b].astype(jnp.int32), 1), :],
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
            pl.BlockSpec(memory_space=pltpu.SMEM),   # full idx array
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
        iv = idx_ref[pl.ds(pl.program_id(0), 1), :].astype(jnp.int32)
        ivb = jax.lax.broadcast_in_dim(iv.reshape(Bb), (Bb, Wd), (0,))
        out_ref[:, :] = jnp.take_along_axis(tab_ref[:, :], ivb, axis=0)

    return pl.pallas_call(
        kernel,
        grid=(B // Bb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # full idx array
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
                pl.ds(idx_ref[pl.program_id(0), b].astype(jnp.int32), 1), :]
            return 0

        jax.lax.fori_loop(0, Bb, body, 0)

    Bb = 512
    return pl.pallas_call(
        kernel,
        grid=(B // Bb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # full idx array
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

    def arm(name, fn, *args, reps=5):
        try:
            dt, _ = time_it(fn, *args, reps=reps)
            res[name] = {"rows_per_s": round(B / dt / 1e9, 5),
                         "ms_per_call": round(dt * 1e3, 3)}
        except Exception as e:  # Mosaic may reject; that IS the result
            res[name] = {"error": str(e)[:300]}
        print(name, res[name], flush=True)

    for T in (1 << 11, 1 << 13, 1 << 19):
        Wd = 128                                  # padded row (2 f32 used)
        table = jax.random.normal(key, (T, Wd), jnp.float32)
        idx = jax.random.randint(key, (B,), 0, T, jnp.int32)

        if T * Wd * 4 <= (8 << 20):   # VMEM-resident arms (16M scoped cap)
            arm(f"A_onehot_T{T}",
                functools.partial(onehot_fetch, chunk=min(T, 2048)),
                table, idx)
            arm(f"B_dynslice_T{T}", dynslice_fetch, table, idx, reps=2)
            arm(f"E_vmem_take_T{T}", vmem_take_fetch, table, idx)

        arm(f"C_xla_take_T{T}", lambda t, i: jnp.take(t, i, axis=0),
            table, idx)
        arm(f"D_dma_T{T}", dma_fetch, table, idx, reps=2)

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
