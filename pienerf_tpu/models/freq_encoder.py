"""Fourier-feature (frequency) positional encoding — gather-free.

The reference ships a frequency encoder as an alternative backbone
(reference: nerf/encoding.py:8-46, freqencoder CUDA ext). On TPU this
encoding is the basis of the flagship `mlp` backbone: it is evaluated
entirely with vector math + matmuls (zero table lookups), which is the only
fast regime on this hardware (see PERF.md).

Encoding: [x, sin(2^k pi x), cos(2^k pi x)] for k = 0..n_freqs-1, per axis.
Feature-major output ([F, N]) keeps the batch dim minormost.
"""

from __future__ import annotations

from typing import Tuple, Union

import jax
import jax.numpy as jnp


Coords = Union[jax.Array, Tuple[jax.Array, ...]]


def output_dim(input_dim: int, n_freqs: int, include_input: bool = True) -> int:
    return input_dim * (2 * n_freqs + (1 if include_input else 0))


def freq_encode(inputs: Coords, n_freqs: int = 10, bound: float = 1.0,
                include_input: bool = True,
                feature_major: bool = False) -> jax.Array:
    """inputs: [N, D] in [-bound, bound] (or tuple of D component arrays).

    Returns [N, F] (or [F, N] with feature_major).
    """
    if isinstance(inputs, (tuple, list)):
        comps = [jnp.asarray(c).reshape(-1) for c in inputs]
    else:
        comps = [inputs[..., i].reshape(-1) for i in range(inputs.shape[-1])]

    rows = []
    for c in comps:
        cn = c / bound                                          # [-1, 1]
        if include_input:
            rows.append(cn[None])
        # sin/cos(2^k pi x) via the double-angle ladder: one sin+cos pair of
        # transcendentals per point, then multiplies only. TPU VPU
        # transcendentals are ~50x slower than mults (PERF.md).
        s = jnp.sin(jnp.pi * cn)
        co = jnp.cos(jnp.pi * cn)
        sins, coss = [s], [co]
        for _ in range(n_freqs - 1):
            s, co = 2.0 * s * co, co * co - s * s
            sins.append(s)
            coss.append(co)
        rows.append(jnp.stack(sins, axis=0))
        rows.append(jnp.stack(coss, axis=0))
    out = jnp.concatenate(rows, axis=0)                          # [F, N]
    return out if feature_major else out.T
