"""NeRF network: hash encoding -> sigma MLP; SH encoding -> color MLP.

Functional twin of the reference NeRFNetwork (reference: nerf/network.py:13-209):
- sigma net: 2 bias-free linear layers 32 -> 64 -> 16 (1 sigma + 15 geo
  features), sigma through trunc_exp (nerf/activation.py:5-18).
- color net: 3 bias-free layers (16 SH + 15 geo) -> 64 -> 64 -> 3, sigmoid.
- optional background net on a sphere: 2D hash encoding (4 levels) + SH dirs
  -> 2 layers -> rgb (nerf/network.py:74-95).

Parameters live in a plain nested dict pytree. Matmuls run in a configurable
compute dtype (bfloat16 on TPU replaces the reference's fp16 autocast); the
master params stay float32.
"""

from __future__ import annotations

import math
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pienerf_tpu.models import freq_encoder, hash_encoder
from pienerf_tpu.models.sh_encoder import sh_encode


@jax.custom_vjp
def trunc_exp(x):
    """exp with clamped forward AND clamped-input gradient.

    The reference clamps only the gradient (nerf/activation.py:5-18) and
    leaves the forward unbounded; it survives runaway raw densities via
    fp16 GradScaler step-skipping. Here the forward saturates at
    exp(15) ~ 3.3e6 too: alpha = 1 - exp(-sigma*dt) is already 1.0 to
    f32 precision at sigma*dt > 20, so the clamp is invisible to any
    rendered output, while unbounded exp is a measured divergence: raw
    densities in occluded/unsupervised regions drift upward (nothing in
    the loss opposes growth once T = 0 behind a surface) until exp
    overflows f32 at x > 88 — observed at step ~9k of a healthy 48-dB
    800x800 run, permanently NaN-ing the params. The backward keeps the
    straight-through clamped-exp gradient, so a >15 raw density is still
    pulled back down whenever the loss asks for less density (a zeroed
    gradient would leave it stranded). The Pallas inference kernels
    apply the identical clamp (ops/pallas/{field,tile}_kernel.py).
    """
    return jnp.exp(jnp.clip(x, -15.0, 15.0))


def _trunc_exp_fwd(x):
    return jnp.exp(jnp.clip(x, -15.0, 15.0)), x


def _trunc_exp_bwd(x, g):
    return (g * jnp.exp(jnp.clip(x, -15.0, 15.0)),)


trunc_exp.defvjp(_trunc_exp_fwd, _trunc_exp_bwd)


class NetworkSpec(NamedTuple):
    """Static architecture description (hashable).

    backbone:
    - "hashgrid": reference-compatible multiresolution hash encoding
      (checkpoint import/export; gather-bound on TPU — see PERF.md).
    - "mlp": TPU-native Fourier-feature MLP — gather-free, all-MXU; the
      flagship interactive backbone.
    """
    grid: hash_encoder.HashGridSpec
    backbone: str = "hashgrid"
    n_freqs: int = 8
    num_layers: int = 2
    hidden_dim: int = 64
    geo_feat_dim: int = 15
    num_layers_color: int = 3
    hidden_dim_color: int = 64
    sh_degree: int = 4
    bound: float = 1.0
    bg_radius: float = -1.0
    grid_bg: Optional[hash_encoder.HashGridSpec] = None
    num_layers_bg: int = 2
    hidden_dim_bg: int = 64
    compute_dtype: str = "float32"

    @property
    def sigma_in_dim(self) -> int:
        if self.backbone == "mlp":
            return freq_encoder.output_dim(3, self.n_freqs)
        return self.grid.output_dim


def make_spec(bound: float = 1.0, bg_radius: float = -1.0,
              compute_dtype: str = "float32", backbone: str = "hashgrid",
              **kw) -> NetworkSpec:
    grid = hash_encoder.make_spec(desired_resolution=2048 * bound)
    grid_bg = None
    if bg_radius > 0:
        grid_bg = hash_encoder.make_spec(
            input_dim=2, num_levels=4, desired_resolution=2048
        )
    if backbone == "mlp" and "num_layers" not in kw:
        kw["num_layers"] = 4      # deeper sigma net compensates the encoding
    return NetworkSpec(grid=grid, bound=bound, bg_radius=bg_radius,
                       grid_bg=grid_bg, compute_dtype=compute_dtype,
                       backbone=backbone, **kw)


def _linear_init(rng, fan_in, fan_out):
    """Kaiming-uniform, matching torch.nn.Linear's default initializer."""
    bd = 1.0 / math.sqrt(fan_in) * math.sqrt(3.0)
    return jax.random.uniform(rng, (fan_in, fan_out), jnp.float32, -bd, bd)


def init_params(rng: jax.Array, spec: NetworkSpec) -> Dict[str, Any]:
    keys = jax.random.split(rng, 16)
    in_dim = spec.sigma_in_dim
    sh_dim = spec.sh_degree**2                         # 16

    sigma_dims = [in_dim] + [spec.hidden_dim] * (spec.num_layers - 1) + [
        1 + spec.geo_feat_dim
    ]
    color_dims = [sh_dim + spec.geo_feat_dim] + [spec.hidden_dim_color] * (
        spec.num_layers_color - 1
    ) + [3]

    params: Dict[str, Any] = {
        "sigma_net": [
            _linear_init(keys[1 + i], sigma_dims[i], sigma_dims[i + 1])
            for i in range(spec.num_layers)
        ],
        "color_net": [
            _linear_init(keys[5 + i], color_dims[i], color_dims[i + 1])
            for i in range(spec.num_layers_color)
        ],
    }
    if spec.backbone == "hashgrid":
        params["encoder"] = hash_encoder.init_params(keys[0], spec.grid)
    if spec.bg_radius > 0:
        assert spec.grid_bg is not None
        bg_dims = [spec.grid_bg.output_dim + sh_dim] + [spec.hidden_dim_bg] * (
            spec.num_layers_bg - 1
        ) + [3]
        params["encoder_bg"] = hash_encoder.init_params(keys[9], spec.grid_bg)
        params["bg_net"] = [
            _linear_init(keys[10 + i], bg_dims[i], bg_dims[i + 1])
            for i in range(spec.num_layers_bg)
        ]
    return params


def _mlp_fm(layers, h, dtype):
    """Feature-major MLP: h is [F, N] (batch minormost — the TPU-friendly
    layout; see hash_encoder module doc). Weights stay [in, out]."""
    h = h.astype(dtype)
    for i, w in enumerate(layers):
        h = jax.lax.dot_general(
            w.astype(dtype), h,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=dtype,
        )                                                       # [out, N]
        if i != len(layers) - 1:
            h = jax.nn.relu(h)
    return h


def density(params, spec: NetworkSpec, x,
            feature_major_out: bool = False) -> Tuple[jax.Array, jax.Array]:
    """x: [N, 3] in [-bound, bound] (or a tuple of 3 component arrays)
    -> (sigma [N], geo_feat [N, 15] or [15, N])."""
    dtype = jnp.dtype(spec.compute_dtype)
    if spec.backbone == "mlp":
        enc = freq_encoder.freq_encode(x, spec.n_freqs, spec.bound,
                                       feature_major=True)
    else:
        enc = hash_encoder.encode(params["encoder"], spec.grid, x, spec.bound,
                                  feature_major=True)           # [32, N]
    h = _mlp_fm(params["sigma_net"], enc, dtype).astype(jnp.float32)
    sigma = trunc_exp(h[0])
    geo = h[1:]
    return sigma, (geo if feature_major_out else geo.T)


def color(params, spec: NetworkSpec, d, geo_feat: jax.Array,
          feature_major_in: bool = False) -> jax.Array:
    """d: [N, 3] normalized dirs (or component tuple); geo_feat [N, 15]
    (or [15, N] when feature_major_in) -> rgb [N, 3]."""
    dtype = jnp.dtype(spec.compute_dtype)
    enc_d = sh_encode(d, spec.sh_degree, feature_major=True)    # [16, N]
    gf = geo_feat if feature_major_in else geo_feat.T
    h = jnp.concatenate([enc_d.astype(dtype), gf.astype(dtype)], axis=0)
    h = _mlp_fm(params["color_net"], h, dtype).astype(jnp.float32)
    return jax.nn.sigmoid(h).T


def forward(params, spec: NetworkSpec, x, d) -> Tuple[jax.Array, jax.Array]:
    """Full query (reference nerf/network.py:98-127): (sigma [N], rgb [N,3]).

    x, d: [N, 3] arrays or tuples of 3 component arrays [N] each.
    """
    sigma, geo = density(params, spec, x, feature_major_out=True)
    return sigma, color(params, spec, d, geo, feature_major_in=True)


def background(params, spec: NetworkSpec, sph, d) -> jax.Array:
    """Background sphere color (reference nerf/network.py:133-148).

    sph: [N, 2] in [-1, 1] (or component tuple); d: [N, 3].
    """
    assert spec.grid_bg is not None
    dtype = jnp.dtype(spec.compute_dtype)
    h_pos = hash_encoder.encode(params["encoder_bg"], spec.grid_bg, sph, 1.0,
                                feature_major=True)
    enc_d = sh_encode(d, spec.sh_degree, feature_major=True)
    h = jnp.concatenate([enc_d.astype(dtype), h_pos.astype(dtype)], axis=0)
    h = _mlp_fm(params["bg_net"], h, dtype).astype(jnp.float32)
    return jax.nn.sigmoid(h).T


def param_count(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
