"""Checkpointing: native npz format + torch-ngp `.pth` importer.

The reference trains/saves torch checkpoints named ngp_ep{epoch:04d}.pth with
a state dict holding `encoder.embeddings`, `sigma_net.{i}.weight`,
`color_net.{i}.weight`, optional `encoder_bg.embeddings`/`bg_net.{i}.weight`,
plus density-grid buffers (reference: nerf/trainer.py:794-916). Torch Linear
stores weights [out, in]; our matmuls use [in, out], so weights transpose on
import/export.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np


def _to_np(tree):
    if isinstance(tree, dict):
        return {k: _to_np(v) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return [_to_np(v) for v in tree]
    return np.asarray(tree)


# ---------------------------------------------------------------------------
# native format
# ---------------------------------------------------------------------------

def save_native(path: str, params: Dict[str, Any],
                extra: Optional[Dict[str, Any]] = None) -> None:
    """Write a flat npz with slash-joined keys + a JSON sidecar of metadata."""
    flat: Dict[str, np.ndarray] = {}

    def rec(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                rec(f"{prefix}/{k}" if prefix else k, v)
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                rec(f"{prefix}.{i}", v)
        else:
            flat[prefix] = np.asarray(node)

    rec("", params)
    if extra:
        for k, v in extra.items():
            if isinstance(v, (np.ndarray, jnp.ndarray)):
                flat[f"__extra__/{k}"] = np.asarray(v)
    np.savez(path, **flat)
    meta = {k: v for k, v in (extra or {}).items()
            if not isinstance(v, (np.ndarray, jnp.ndarray))}
    with open(path + ".json", "w") as f:
        json.dump(meta, f)


def load_native(path: str) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    data = np.load(path)
    params: Dict[str, Any] = {}
    extra: Dict[str, Any] = {}
    for key in data.files:
        if key.startswith("__extra__/"):
            extra[key.split("/", 1)[1]] = data[key]
            continue
        node = params
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        leaf = parts[-1]
        if "." in leaf:
            name, idx = leaf.rsplit(".", 1)
            lst = node.setdefault(name, [])
            idx = int(idx)
            while len(lst) <= idx:
                lst.append(None)
            lst[idx] = jnp.asarray(data[key])
        else:
            node[leaf] = jnp.asarray(data[key])
    if os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            extra.update(json.load(f))
    return params, extra


# ---------------------------------------------------------------------------
# torch-ngp .pth import / export
# ---------------------------------------------------------------------------

def _collect_layers(sd: Dict[str, np.ndarray], prefix: str):
    layers = []
    i = 0
    while f"{prefix}.{i}.weight" in sd:
        layers.append(jnp.asarray(sd[f"{prefix}.{i}.weight"]).T)  # [in, out]
        i += 1
    return layers


def load_torch_ngp(path: str) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Import a reference `ngp_ep*.pth` checkpoint.

    Returns (params, extra) where extra carries density_grid [CAS, H^3]
    (Morton order), mean_density, epoch/global_step when present.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt)
    sd = {k: v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
          for k, v in sd.items()}

    params: Dict[str, Any] = {
        "encoder": jnp.asarray(sd["encoder.embeddings"], jnp.float32),
        "sigma_net": _collect_layers(sd, "sigma_net"),
        "color_net": _collect_layers(sd, "color_net"),
    }
    if "encoder_bg.embeddings" in sd:
        params["encoder_bg"] = jnp.asarray(sd["encoder_bg.embeddings"], jnp.float32)
        params["bg_net"] = _collect_layers(sd, "bg_net")

    extra: Dict[str, Any] = {}
    if "density_grid" in sd:
        extra["density_grid"] = jnp.asarray(sd["density_grid"], jnp.float32)
    for k in ("mean_density", "mean_count", "epoch", "global_step"):
        if k in ckpt:
            extra[k] = ckpt[k]
    return params, extra


def save_torch_ngp(path: str, params: Dict[str, Any],
                   extra: Optional[Dict[str, Any]] = None) -> None:
    """Export params in the reference's .pth layout (for interop)."""
    import torch

    sd: Dict[str, Any] = {
        "encoder.embeddings": torch.from_numpy(
            np.array(params["encoder"], np.float32)),
    }
    for name in ("sigma_net", "color_net", "bg_net"):
        if name in params:
            for i, w in enumerate(params[name]):
                sd[f"{name}.{i}.weight"] = torch.from_numpy(
                    np.asarray(w, np.float32).T.copy())
    if "encoder_bg" in params:
        sd["encoder_bg.embeddings"] = torch.from_numpy(
            np.asarray(params["encoder_bg"], np.float32))
    ckpt: Dict[str, Any] = {"model": sd}
    if extra:
        dg = extra.get("density_grid")
        if dg is not None:
            sd["density_grid"] = torch.from_numpy(np.asarray(dg, np.float32))
        for k, v in extra.items():
            if k != "density_grid":
                ckpt[k] = v
    torch.save(ckpt, path)
