"""CLIP text-guided training loss in JAX (reference: nerf/clip_utils.py,
used by the rand_pose mode, nerf/trainer.py:138-141,163-178).

The reference wraps OpenAI ``clip`` ViT-B/16 and minimizes the negative
image-text cosine similarity of low-res frames rendered from random orbit
poses. Like LPIPS (train/lpips.py), the loss is DEFINED by pretrained
weights that are not vendorable in this image (zero egress): the full
differentiable model (vision ViT + text transformer, faithful to the
Hugging Face ``CLIPModel`` computation so its checkpoints import directly)
is implemented here and activates when a weight npz is present at
``$PIENERF_CLIP_WEIGHTS`` or ``pienerf_tpu/assets/clip_vit_b16.npz``.

Export the npz once from any machine with ``transformers``::

    import numpy as np
    from transformers import CLIPModel
    m = CLIPModel.from_pretrained("openai/clip-vit-base-patch16")
    sd = {k: v.numpy() for k, v in m.state_dict().items()}
    np.savez("clip_vit_b16.npz", **sd,
             __v_heads__=m.config.vision_config.num_attention_heads,
             __t_heads__=m.config.text_config.num_attention_heads)

Equivalence with the torch model is tested against a randomly-initialized
tiny ``transformers.CLIPModel`` (tests/test_clip_guidance.py) — no
download needed for the test.

Text tokenization needs the CLIP vocab (also not vendorable); pass
pre-tokenized ids to :meth:`CLIPGuidance.prepare_text`, or a local
tokenizer directory for ``transformers.CLIPTokenizer``.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

# CLIP preprocessing constants (reference nerf/clip_utils.py:24-27)
_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)

_DEFAULT_PATH = os.path.join(os.path.dirname(__file__), os.pardir,
                             "assets", "clip_vit_b16.npz")


def weights_path() -> Optional[str]:
    p = os.environ.get("PIENERF_CLIP_WEIGHTS", _DEFAULT_PATH)
    return p if os.path.exists(p) else None


def available() -> bool:
    return weights_path() is not None


# ---------------------------------------------------------------------------
# weight import (HF CLIPModel state_dict layout)
# ---------------------------------------------------------------------------

def _layer(sd: Dict[str, np.ndarray], pre: str) -> Dict[str, np.ndarray]:
    def g(k):
        return np.asarray(sd[pre + k], np.float32)
    return {
        "ln1_g": g("layer_norm1.weight"), "ln1_b": g("layer_norm1.bias"),
        "q_w": g("self_attn.q_proj.weight"), "q_b": g("self_attn.q_proj.bias"),
        "k_w": g("self_attn.k_proj.weight"), "k_b": g("self_attn.k_proj.bias"),
        "v_w": g("self_attn.v_proj.weight"), "v_b": g("self_attn.v_proj.bias"),
        "o_w": g("self_attn.out_proj.weight"),
        "o_b": g("self_attn.out_proj.bias"),
        "ln2_g": g("layer_norm2.weight"), "ln2_b": g("layer_norm2.bias"),
        "fc1_w": g("mlp.fc1.weight"), "fc1_b": g("mlp.fc1.bias"),
        "fc2_w": g("mlp.fc2.weight"), "fc2_b": g("mlp.fc2.bias"),
    }


def import_hf_state_dict(sd: Dict[str, np.ndarray], v_heads: int,
                         t_heads: int) -> Dict:
    """Canonical params from a ``transformers.CLIPModel`` state dict."""
    sd = {k: np.asarray(v) for k, v in sd.items()}

    def g(k):
        return np.asarray(sd[k], np.float32)

    n_v = len({k.split(".")[3] for k in sd
               if k.startswith("vision_model.encoder.layers.")})
    n_t = len({k.split(".")[3] for k in sd
               if k.startswith("text_model.encoder.layers.")})
    vision = {
        "class_emb": g("vision_model.embeddings.class_embedding"),
        "patch_w": g("vision_model.embeddings.patch_embedding.weight"),
        "pos_emb": g("vision_model.embeddings.position_embedding.weight"),
        # sic: the HF module is named `pre_layrnorm`
        "pre_ln_g": g("vision_model.pre_layrnorm.weight"),
        "pre_ln_b": g("vision_model.pre_layrnorm.bias"),
        "layers": [_layer(sd, f"vision_model.encoder.layers.{i}.")
                   for i in range(n_v)],
        "post_ln_g": g("vision_model.post_layernorm.weight"),
        "post_ln_b": g("vision_model.post_layernorm.bias"),
        "proj": g("visual_projection.weight"),
        "heads": v_heads,
    }
    text = {
        "tok_emb": g("text_model.embeddings.token_embedding.weight"),
        "pos_emb": g("text_model.embeddings.position_embedding.weight"),
        "layers": [_layer(sd, f"text_model.encoder.layers.{i}.")
                   for i in range(n_t)],
        "final_ln_g": g("text_model.final_layer_norm.weight"),
        "final_ln_b": g("text_model.final_layer_norm.bias"),
        "proj": g("text_projection.weight"),
        "heads": t_heads,
    }
    return {"vision": vision, "text": text}


def load_weights(path: Optional[str] = None) -> Dict:
    path = path or weights_path()
    if path is None:
        raise FileNotFoundError(
            "CLIP weights not found; set $PIENERF_CLIP_WEIGHTS or place "
            "clip_vit_b16.npz under pienerf_tpu/assets/ (export recipe in "
            "train/clip_guidance.py docstring)")
    z = np.load(path)
    sd = {k: z[k] for k in z.files if not k.startswith("__")}
    return import_hf_state_dict(sd, int(z["__v_heads__"]),
                                int(z["__t_heads__"]))


# ---------------------------------------------------------------------------
# forward (matches transformers.CLIPModel: pre-LN ViT, quick_gelu MLPs)
# ---------------------------------------------------------------------------

def _ln(x, g, b, eps=1e-5):
    m = jnp.mean(x, -1, keepdims=True)
    v = jnp.var(x, -1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + eps) * g + b


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def _attention(x, p, heads, causal=False):
    B, N, h = x.shape
    hd = h // heads
    scale = hd ** -0.5

    def proj(w, b):
        y = x @ w.T + b
        return y.reshape(B, N, heads, hd).transpose(0, 2, 1, 3)

    # HF CLIPAttention scales q BEFORE the product
    q = proj(p["q_w"], p["q_b"]) * scale
    k = proj(p["k_w"], p["k_b"])
    v = proj(p["v_w"], p["v_b"])
    att = jnp.einsum("bhqd,bhkd->bhqk", q, k)
    if causal:
        mask = jnp.tril(jnp.ones((N, N), bool))
        att = jnp.where(mask[None, None], att, -jnp.inf)
    att = jax.nn.softmax(att, axis=-1)
    y = jnp.einsum("bhqk,bhkd->bhqd", att, v)
    y = y.transpose(0, 2, 1, 3).reshape(B, N, h)
    return y @ p["o_w"].T + p["o_b"]


def _encoder(x, layers, heads, causal=False):
    for p in layers:
        x = x + _attention(_ln(x, p["ln1_g"], p["ln1_b"]), p, heads,
                           causal=causal)
        h = _ln(x, p["ln2_g"], p["ln2_b"])
        h = _quick_gelu(h @ p["fc1_w"].T + p["fc1_b"])
        x = x + (h @ p["fc2_w"].T + p["fc2_b"])
    return x


def encode_image(params: Dict, images: jax.Array) -> jax.Array:
    """images [B, 3, S, S] preprocessed -> L2-normalized features [B, d]."""
    v = params["vision"]
    patches = jax.lax.conv_general_dilated(
        images, jnp.asarray(v["patch_w"]),
        window_strides=(v["patch_w"].shape[2],) * 2, padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))     # [B, h, g, g]
    B, h = patches.shape[:2]
    x = patches.reshape(B, h, -1).transpose(0, 2, 1)    # [B, g*g, h]
    cls = jnp.broadcast_to(jnp.asarray(v["class_emb"]), (B, 1, h))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + jnp.asarray(v["pos_emb"])[None]
    x = _ln(x, v["pre_ln_g"], v["pre_ln_b"])
    x = _encoder(x, v["layers"], v["heads"])
    pooled = _ln(x[:, 0], v["post_ln_g"], v["post_ln_b"])
    z = pooled @ jnp.asarray(v["proj"]).T
    return z / jnp.linalg.norm(z, axis=-1, keepdims=True)


def encode_text(params: Dict, ids: jax.Array,
                eos_token_id: Optional[int] = None) -> jax.Array:
    """ids [B, N] int32 token ids -> L2-normalized features [B, d].

    Pooled token: with eos_token_id=None, the argmax(ids) position (the
    EOT token has the largest id in the OpenAI CLIP vocab — the
    convention of the reference's `clip` package and of HF checkpoints
    with the legacy eos_token_id=2 config); otherwise the FIRST position
    equal to eos_token_id (transformers' post-#24773 pooling)."""
    t = params["text"]
    x = jnp.asarray(t["tok_emb"])[ids]
    x = x + jnp.asarray(t["pos_emb"])[None, :x.shape[1]]
    x = _encoder(x, t["layers"], t["heads"], causal=True)
    x = _ln(x, t["final_ln_g"], t["final_ln_b"])
    if eos_token_id is None:
        pos = jnp.argmax(ids, axis=-1)
    else:
        pos = jnp.argmax((ids == eos_token_id).astype(jnp.int32), axis=-1)
    pooled = x[jnp.arange(x.shape[0]), pos]
    z = pooled @ jnp.asarray(t["proj"]).T
    return z / jnp.linalg.norm(z, axis=-1, keepdims=True)


def preprocess(images: jax.Array, size: int = 224) -> jax.Array:
    """[B, H, W, 3] in [0, 1] -> resized, normalized [B, 3, S, S]
    (reference transform: Resize((224, 224)) + Normalize, clip_utils.py)."""
    x = jax.image.resize(images, (images.shape[0], size, size, 3),
                         method="bilinear")
    x = (x - _MEAN) / _STD
    return x.transpose(0, 3, 1, 2)


def clip_loss(params: Dict, images: jax.Array, text_z: jax.Array,
              size: Optional[int] = None) -> jax.Array:
    """Negative mean image-text cosine similarity
    (reference nerf/clip_utils.py:41-58). images [B, H, W, 3] in [0, 1].

    ``size`` overrides the 224 input resolution — the ViT is
    resolution-agnostic apart from position embeddings, so tests use tiny
    sizes; pass None for the standard 224."""
    img_z = encode_image(params, preprocess(images, size or 224))
    return -jnp.mean(jnp.sum(img_z * text_z, axis=-1))


class CLIPGuidance:
    """Reference-API wrapper (clip_utils.CLIPLoss): prepare_text once, then
    call with rendered images. Only image-text mode ('dreamfields') is
    implemented, like the reference's own __call__."""

    def __init__(self, params: Optional[Dict] = None):
        self.params = params if params is not None else load_weights()
        self.text_z = None

    def prepare_text(self, texts: Sequence[str] | None = None,
                     ids: Optional[np.ndarray] = None,
                     tokenizer_dir: Optional[str] = None) -> None:
        if ids is None:
            if tokenizer_dir is None:
                raise ValueError(
                    "pass pre-tokenized `ids` or a local `tokenizer_dir` "
                    "(the CLIP vocab is not vendored; zero egress)")
            from transformers import CLIPTokenizer
            tok = CLIPTokenizer.from_pretrained(tokenizer_dir)
            ids = tok(list(texts), padding="max_length", max_length=77,
                      return_tensors="np")["input_ids"]
        self.text_z = encode_text(self.params, jnp.asarray(ids, jnp.int32))

    def __call__(self, images: jax.Array,
                 size: Optional[int] = None) -> jax.Array:
        assert self.text_z is not None, "call prepare_text first"
        # more than one prompt: the reference picks one at random per call;
        # deterministic mean keeps the jitted loss pure
        return clip_loss(self.params, images, self.text_z, size=size)
