"""Fused radiance-field evaluation kernel (Pallas/Mosaic).

TPU equivalent of the reference's fused-MLP CUDA extension (reference:
ffmlp/, nerf/network_ff.py): one kernel evaluates

    freq-encode(x) -> sigma MLP -> trunc-exp
    SH(d) + geo    -> color MLP -> sigmoid

entirely in VMEM. XLA materializes every MLP layer's activations in HBM
([64, N] per layer — the measured pipeline was HBM-bound at ~4 TFLOP/s);
here the only HBM traffic is x, d in (24 B/sample) and sigma, rgb out
(16 B/sample). Weights (~50 KB padded) are VMEM-resident across the grid.

Inference-only (the training path uses the XLA implementation, which JAX
differentiates; batches there are 100x smaller).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pienerf_tpu.models import network
from pienerf_tpu.models.sh_encoder import C0, C1, C2, C3


def _pad_to(x: np.ndarray, rows: int, cols: int) -> np.ndarray:
    out = np.zeros((rows, cols), np.float32)
    out[: x.shape[0], : x.shape[1]] = x
    return out


def kernel_width(spec: network.NetworkSpec) -> int:
    """MXU tile width for the fused kernels: 64 for the classic student,
    128 when any hidden layer is wider (128-wide students fill the whole
    128x128 systolic array — ~4x capacity at the same matmul wall time)."""
    wd = max(64, spec.hidden_dim, spec.hidden_dim_color, spec.sigma_in_dim)
    assert wd <= 128, f"fused kernel supports widths <= 128, got {wd}"
    return 64 if wd <= 64 else 128


def pack_weights(params, spec: network.NetworkSpec):
    """Pad all layer weights to [Wd, Wd] tiles and stack them (Wd = 64 or
    128, see kernel_width).

    sigma net: enc(3+6*n_freqs, padded) -> hidden -> ... -> 16(padded)
    color net: (16 SH + 15 geo = 31, padded) -> hidden -> ... -> 3(padded)
    """
    assert spec.backbone == "mlp", "fused kernel supports the mlp backbone"
    wd = kernel_width(spec)
    ws = []
    for w in params["sigma_net"]:
        ws.append(_pad_to(np.asarray(w, np.float32), wd, wd))
    for w in params["color_net"]:
        ws.append(_pad_to(np.asarray(w, np.float32), wd, wd))
    return jnp.asarray(np.stack(ws))   # [L_total, Wd, Wd]


def pack_weights_paired(params, spec: network.NetworkSpec):
    """Block-diagonal sigma||color weight pairs for the MXU-co-scheduled
    tile kernel (round-5, VERDICT item 3): position li holds
    diag(sigma_li or I, color_li or I) as one [128, 128] tile.

    A 64-wide matmul streams the same N cycles through the 128x128
    systolic array as a 128-wide one but fills only a quarter of it, so
    the classic net's n_sigma + n_color sequential 64-wide layers run at
    ~25% MXU utilization. The tile kernel pipelines segment s's sigma
    chain against segment s-1's color chain (they are independent: color
    consumes the PREVIOUS segment's stored geo features), turning the
    per-segment chain into max(n_sigma, n_color) full-width matmuls.
    The off-diagonal blocks are exactly zero, so each half's values are
    bit-identical to the unpaired chain (zero products cannot perturb
    f32 partial sums). The shorter chain is padded with identity blocks
    at the tail, which pass its finished output through unchanged.
    """
    assert spec.backbone == "mlp", "paired packing supports the mlp backbone"
    assert kernel_width(spec) == 64, (
        "paired packing co-schedules two 64-wide chains; 128-wide "
        "students already fill the MXU")
    sig = [np.asarray(w, np.float32) for w in params["sigma_net"]]
    col = [np.asarray(w, np.float32) for w in params["color_net"]]
    lp = max(len(sig), len(col))
    eye = np.eye(64, dtype=np.float32)
    out = np.zeros((lp, 128, 128), np.float32)
    for li in range(lp):
        out[li, :64, :64] = _pad_to(sig[li], 64, 64) if li < len(sig) else eye
        out[li, 64:, 64:] = _pad_to(col[li], 64, 64) if li < len(col) else eye
    return jnp.asarray(out)   # [max(n_sigma, n_color), 128, 128]


def _freq_encode_block(x0, x1, x2, n_freqs, bound, dtype):
    """[51ish, Nb] frequency features via the double-angle ladder."""
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
    return jnp.stack(rows, axis=0).astype(dtype)


def _sh4_block(d0, d1, d2, dtype):
    """Degree-4 real SH [16, Nb] (see models/sh_encoder.py)."""
    x, y, z = d0, d1, d2
    xy, xz, yz = x * y, x * z, y * z
    x2, y2, z2 = x * x, y * y, z * z
    z4 = z2 * z2
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
    return jnp.stack(rows, axis=0).astype(dtype)


def _make_kernel(spec: network.NetworkSpec, n_sigma: int, n_color: int,
                 compute_dtype, wd: int = 64):
    n_freqs = spec.n_freqs
    bound = spec.bound

    def kernel(x_ref, d_ref, w_ref, out_ref):
        dt = compute_dtype
        x0, x1, x2 = x_ref[0, :], x_ref[1, :], x_ref[2, :]
        enc = _freq_encode_block(x0, x1, x2, n_freqs, bound, dt)  # [F, Nb]
        f = enc.shape[0]
        nb = enc.shape[1]
        h = jnp.concatenate([enc, jnp.zeros((wd - f, nb), dt)], axis=0)

        for li in range(n_sigma):
            w = w_ref[li].astype(dt)                              # [Wd, Wd]
            h = jax.lax.dot_general(
                w, h, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dt)
            if li != n_sigma - 1:
                h = jnp.maximum(h, 0.0)

        sigma = jnp.exp(jnp.clip(h[0, :].astype(jnp.float32), -15.0, 15.0))
        geo = h[1:16, :]                                          # [15, Nb]

        sh = _sh4_block(d_ref[0, :], d_ref[1, :], d_ref[2, :], dt)  # [16, Nb]
        hc = jnp.concatenate([sh, geo, jnp.zeros((wd - 31, nb), dt)], axis=0)

        for li in range(n_color):
            w = w_ref[n_sigma + li].astype(dt)
            hc = jax.lax.dot_general(
                w, hc, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dt)
            if li != n_color - 1:
                hc = jnp.maximum(hc, 0.0)

        rgb = jax.nn.sigmoid(hc[:3, :].astype(jnp.float32))
        out_ref[0, :] = sigma
        out_ref[1:4, :] = rgb

    return kernel


def field_eval(packed_w: jax.Array, spec: network.NetworkSpec,
               x: Tuple[jax.Array, jax.Array, jax.Array],
               d: Tuple[jax.Array, jax.Array, jax.Array],
               block_n: int = 2048) -> Tuple[jax.Array, jax.Array]:
    """Evaluate the fused field at N points.

    x, d: tuples of component arrays [N]. Returns (sigma [N], rgb [3, N]).
    N must be a multiple of block_n (callers pad). Falls back to Pallas
    interpret mode off-TPU (tests run on CPU).
    """
    interpret = jax.default_backend() == "cpu"
    return _field_eval(packed_w, spec, x, d, block_n, interpret)


@functools.partial(jax.jit, static_argnames=("spec", "block_n", "interpret"))
def _field_eval(packed_w, spec, x, d, block_n, interpret):
    n = x[0].shape[0]
    assert n % block_n == 0, f"N={n} not a multiple of {block_n}"
    n_sigma = len_sigma = spec.num_layers
    n_color = spec.num_layers_color
    dtype = jnp.dtype(spec.compute_dtype)
    wd = packed_w.shape[-1]

    xs = jnp.stack(x, axis=0)          # [3, N]
    ds = jnp.stack(d, axis=0)

    kernel = _make_kernel(spec, n_sigma, n_color, dtype, wd=wd)
    grid = (n // block_n,)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, block_n), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, block_n), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_sigma + n_color, wd, wd), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((4, block_n), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, n), jnp.float32),
        interpret=interpret,
    )(xs, ds, packed_w)
    return out[0], out[1:4]
