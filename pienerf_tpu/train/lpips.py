"""LPIPS perceptual distance in JAX (reference: nerf/utils.py:286-316 uses
the `lpips` torch package with the AlexNet backbone).

The metric is DEFINED by pretrained weights, which are not vendored in this
image (zero egress). The implementation is complete and differentiable —
usable both as an eval meter and as the reference's patch training loss
(trainer.py:207-218) — and activates when a weight file is present at
``$PIENERF_LPIPS_WEIGHTS`` or ``pienerf_tpu/assets/lpips_alex.npz``.

Export the npz once from any machine with the `lpips` package::

    import lpips, numpy as np
    m = lpips.LPIPS(net='alex')
    sd = {k: v.numpy() for k, v in m.state_dict().items()}
    np.savez("lpips_alex.npz", **sd)

The loader accepts the raw `lpips` state_dict key layout
(``net.slice{K}.{idx}.weight`` / ``lin{K}.model.1.weight``).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

# AlexNet feature extractor: (in_ch, out_ch, kernel, stride, pad), with a
# 3x3/2 maxpool before slices 2 and 3 (torchvision AlexNet.features).
_ALEX = [
    (3, 64, 11, 4, 2),
    (64, 192, 5, 1, 2),
    (192, 384, 3, 1, 1),
    (384, 256, 3, 1, 1),
    (256, 256, 3, 1, 1),
]
# conv layer indices inside torchvision AlexNet.features
_FEATURE_IDX = [0, 3, 6, 8, 10]
# LPIPS input normalization (ScalingLayer constants)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

_DEFAULT_PATH = os.path.join(os.path.dirname(__file__), os.pardir,
                             "assets", "lpips_alex.npz")


def weights_path() -> Optional[str]:
    p = os.environ.get("PIENERF_LPIPS_WEIGHTS", _DEFAULT_PATH)
    return p if os.path.exists(p) else None


def available() -> bool:
    return weights_path() is not None


def load_weights(path: Optional[str] = None) -> dict:
    """Load and canonicalize LPIPS-alex weights from npz.

    Accepts either canonical keys (conv{i}_w, conv{i}_b, lin{i}_w) or the
    raw `lpips` torch state_dict layout."""
    path = path or weights_path()
    if path is None:
        raise FileNotFoundError(
            "LPIPS needs pretrained AlexNet weights; export them to "
            "pienerf_tpu/assets/lpips_alex.npz or set "
            "$PIENERF_LPIPS_WEIGHTS (see train/lpips.py docstring)")
    raw = dict(np.load(path))
    out = {}
    if "conv0_w" in raw:
        out = raw
    else:
        # raw lpips state_dict: net.slice{k+1}.{feature_idx}.weight
        for i, fi in enumerate(_FEATURE_IDX):
            out[f"conv{i}_w"] = raw[f"net.slice{i + 1}.{fi}.weight"]
            out[f"conv{i}_b"] = raw[f"net.slice{i + 1}.{fi}.bias"]
            out[f"lin{i}_w"] = raw[f"lin{i}.model.1.weight"]
    for i, (ci, co, k, _, _) in enumerate(_ALEX):
        assert out[f"conv{i}_w"].shape == (co, ci, k, k), \
            f"conv{i}_w shape {out[f'conv{i}_w'].shape}"
        assert out[f"lin{i}_w"].reshape(-1).shape == (co,), \
            f"lin{i}_w shape {out[f'lin{i}_w'].shape}"
    return out


def _features(x, w):
    """AlexNet relu-tap features. x: [B, 3, H, W] in [-1, 1]."""
    import jax
    import jax.numpy as jnp

    h = (x - _SHIFT[None, :, None, None]) / _SCALE[None, :, None, None]
    taps = []
    for i, (_, _, _, stride, pad) in enumerate(_ALEX):
        if i in (1, 2):   # maxpool 3x3 stride 2 before slices 2 and 3
            h = jax.lax.reduce_window(
                h, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2),
                "VALID")
        h = jax.lax.conv_general_dilated(
            h, jnp.asarray(w[f"conv{i}_w"]),
            window_strides=(stride, stride),
            padding=[(pad, pad), (pad, pad)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        h = h + jnp.asarray(w[f"conv{i}_b"])[None, :, None, None]
        h = jnp.maximum(h, 0.0)
        taps.append(h)
    return taps


def lpips(pred, gt, w: dict):
    """LPIPS distance per batch item. pred, gt: [B, H, W, 3] in [0, 1].

    Differentiable (usable as the 1e-3-weighted patch loss the reference
    adds, nerf/trainer.py:218)."""
    import jax.numpy as jnp

    assert pred.shape[1] >= 32 and pred.shape[2] >= 32, (
        "LPIPS(alex) needs >=32px inputs (the conv/pool stack collapses "
        "below that — same constraint as the torch implementation)")

    def prep(img):
        img = jnp.asarray(img, jnp.float32) * 2.0 - 1.0
        return jnp.transpose(img, (0, 3, 1, 2))

    fa = _features(prep(pred), w)
    fb = _features(prep(gt), w)
    total = 0.0
    for i, (a, b) in enumerate(zip(fa, fb)):
        na = a / jnp.sqrt(jnp.sum(a * a, axis=1, keepdims=True) + 1e-10)
        nb = b / jnp.sqrt(jnp.sum(b * b, axis=1, keepdims=True) + 1e-10)
        d = (na - nb) ** 2                               # [B, C, H, W]
        lin = jnp.asarray(w[f"lin{i}_w"]).reshape(1, -1, 1, 1)
        total = total + jnp.mean(jnp.sum(d * lin, axis=1), axis=(1, 2))
    return total
