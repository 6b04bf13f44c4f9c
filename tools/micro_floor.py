"""Isolate the fused kernel's per-slot floor (tools/kernel_decomp.py:
~9.6 ms for 1248 ALL-INACTIVE slots even at block_tiles=4 — so it is not
grid-step launch count). Arms strip one input/output at a time from a
trivial kernel with the production BlockSpecs:

  full        sc+bs SMEM, dirs+cand VMEM, out zero-write (as production)
  no-bs       bin_start SMEM input removed (134 int32/tile scalar copy)
  no-cand     cand [P,16] VMEM input removed (16 KB/tile)
  no-dirs     dirs [8,T2] VMEM input removed (8 KB/tile)
  no-out0     out written once per 8-row block instead of zeroed row-wise
  smem-only   sc+bs only (no VMEM inputs at all)

Each kernel body does the same minimal work: read the active flag, zero
the output block. Grid = A/B with B = 4.
"""

from __future__ import annotations

import sys
import os
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T2 = 256
P = 256
BS = 134
A = 1248
B = 4


def median_ms(fn, args, n=24, reps=3):
    out = fn(*args, jnp.float32(0.0))
    float(jnp.sum(out))
    vals = []
    k = 1
    for _ in range(reps):
        t0 = time.perf_counter()
        acc = None
        for _ in range(n):
            o = fn(*args, jnp.float32(1e-6 * k))
            k += 1
            acc = o if acc is None else acc + o
        float(jnp.sum(acc))
        vals.append((time.perf_counter() - t0) / n * 1e3)
    return float(np.median(vals))


def build_arm(use_bs=True, use_cand=True, use_dirs=True, row_zero=True,
              smem_int16=False):
    bs_dtype = jnp.int16 if smem_int16 else jnp.int32

    def kernel(*refs):
        i = 0
        sc_ref = refs[i]; i += 1
        if use_bs:
            bs_ref = refs[i]; i += 1
        if use_dirs:
            dirs_ref = refs[i]; i += 1
        if use_cand:
            cand_ref = refs[i]; i += 1
        out_ref = refs[i]
        for b in range(B):
            active = sc_ref[b, 0, 2] > 0.0
            if row_zero:
                out_ref[b, :, :] = jnp.zeros((8, T2), jnp.float32)
            else:
                pass
            if not row_zero:
                out_ref[b, :, :] = jnp.zeros((8, T2), jnp.float32)

            @pl.when(active)
            def _():
                out_ref[b, 0:1, :] += 1.0

    in_specs = [pl.BlockSpec((B, 1, 8), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM)]
    if use_bs:
        in_specs.append(pl.BlockSpec((B, 1, BS), lambda i: (i, 0, 0),
                                     memory_space=pltpu.SMEM))
    if use_dirs:
        in_specs.append(pl.BlockSpec((B, 8, T2), lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
    if use_cand:
        in_specs.append(pl.BlockSpec((B, P, 16), lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM))

    @jax.jit
    def run(sc, bs, dirs, cand, eps):
        args = [sc + eps]
        if use_bs:
            args.append(bs)
        if use_dirs:
            args.append(dirs + eps)
        if use_cand:
            args.append(cand + eps)
        return pl.pallas_call(
            kernel,
            grid=(A // B,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((B, 8, T2), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((A, 8, T2), jnp.float32),
        )(*args)

    bs_arr = jnp.zeros((A, 1, BS), bs_dtype)
    return run, bs_arr


def main():
    print("platform:", jax.devices()[0].platform)
    sc = jnp.zeros((A, 1, 8), jnp.float32)        # all inactive
    dirs = jnp.ones((A, 8, T2), jnp.float32)
    cand = jnp.zeros((A, P, 16), jnp.float32)

    arms = [
        ("full", dict()),
        ("no-bs", dict(use_bs=False)),
        ("no-cand", dict(use_cand=False)),
        ("no-dirs", dict(use_dirs=False)),
        ("smem-only", dict(use_cand=False, use_dirs=False)),
        ("bs-int16", dict(smem_int16=True)),
    ]
    for name, kw in arms:
        run, bs_arr = build_arm(**kw)
        ms = median_ms(run, (sc, bs_arr, dirs, cand))
        print(f"{name:12s} {ms:7.2f} ms")


if __name__ == "__main__":
    main()
