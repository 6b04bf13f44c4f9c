"""Backbone distillation: hashgrid teacher -> mlp student.

Why this exists (PERF.md row-gather spike): the hash-grid encoder is
gather-bound at ~0.03 G rows/s on this hardware — imported reference
checkpoints (`ngp_ep*.pth`, reference nerf/trainer.py:794-916 format)
render bit-exactly but at seconds per frame. The interactive path (the
fused tile kernel) runs the Fourier-feature mlp backbone on the MXU. This
module bridges them: a few minutes of field-space distillation turns an
imported checkpoint into an interactive scene.

Losses are field-space (no rendering in the loop): density is matched in
log space (sigma spans orders of magnitude) and color is matched where the
teacher has mass (alpha-weighted — empty space has no meaningful color).
Sample positions mix uniform coverage with density-importance resampling
around the teacher's occupied set so thin structures get capacity.
"""

from __future__ import annotations

import functools
import time
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pienerf_tpu.models import network


def make_distill_step(teacher_spec, student_spec, optimizer):
    """Jitted distillation step: batch of (x, d) -> student update."""

    @jax.jit
    def step(t_params, s_params, opt_state, x, d):
        sig_t, rgb_t = network.forward(t_params, teacher_spec, x, d)
        alpha_t = 1.0 - jnp.exp(-jnp.clip(sig_t, 0.0, 1e4) * 0.01)

        def loss_fn(sp):
            sig_s, rgb_s = network.forward(sp, student_spec, x, d)
            l_sig = jnp.mean(
                (jnp.log1p(sig_s) - jnp.log1p(sig_t)) ** 2)
            l_rgb = jnp.mean(
                alpha_t[:, None] * (rgb_s - rgb_t) ** 2)
            return l_sig + 4.0 * l_rgb

        loss, grads = jax.value_and_grad(loss_fn)(s_params)
        updates, opt_state = optimizer.update(grads, opt_state, s_params)
        s_params = optax.apply_updates(s_params, updates)
        return s_params, opt_state, loss

    return step


@functools.partial(jax.jit, static_argnames=("n",))
def _importance_positions(rng, x_pool, w_pool, n, bound):
    """Resample positions near high-density pool points with jitter."""
    k1, k2 = jax.random.split(rng)
    ids = jax.random.categorical(k1, jnp.log(w_pool + 1e-8), shape=(n,))
    jitter = jax.random.normal(k2, (n, 3)) * (bound * 0.02)
    return jnp.clip(x_pool[ids] + jitter, -bound, bound)


def make_student_spec(teacher_spec: network.NetworkSpec,
                      width: int = 64) -> network.NetworkSpec:
    """Student architecture for a given MXU tile width.

    width=64: the classic 64-wide student (quarter of the 128x128 MXU).
    width=128: fills the systolic array — ~4x parameter capacity per layer
    at the same matmul wall time in the fused kernels (PERF.md roofline
    note: the 64-wide MLP is shape-bound at ~20-30 TFLOP/s). The wider
    student also gets more Fourier frequencies (10 vs 8; 63 input rows
    still fit one 128 tile) — capacity helps only if the encoding can
    express the teacher's highest bands.
    """
    assert width in (64, 128), width
    kw = {}
    if width == 128:
        kw = dict(hidden_dim=128, hidden_dim_color=128, n_freqs=10)
    return network.make_spec(
        bound=teacher_spec.bound, bg_radius=teacher_spec.bg_radius,
        compute_dtype=teacher_spec.compute_dtype, backbone="mlp", **kw)


def distill(
    teacher_params: Dict[str, Any],
    teacher_spec: network.NetworkSpec,
    student_spec: Optional[network.NetworkSpec] = None,
    steps: int = 4000,
    batch: int = 8192,
    lr: float = 5e-3,
    seed: int = 0,
    log_every: int = 500,
    log_fn=print,
    student_width: int = 64,
) -> Tuple[Dict[str, Any], network.NetworkSpec, float]:
    """Distill a hashgrid field into the interactive mlp backbone.

    Returns (student_params, student_spec, final_loss)."""
    assert teacher_spec.backbone == "hashgrid"
    bound = teacher_spec.bound
    if student_spec is None:
        student_spec = make_student_spec(teacher_spec, width=student_width)

    rng = jax.random.PRNGKey(seed)
    rng, k = jax.random.split(rng)
    s_params = network.init_params(k, student_spec)
    optimizer = optax.adam(
        optax.exponential_decay(lr, steps, 0.1), b1=0.9, b2=0.99)
    opt_state = optimizer.init(s_params)
    step = make_distill_step(teacher_spec, student_spec, optimizer)

    # density-importance pool: one coarse teacher sweep
    rng, k = jax.random.split(rng)
    x_pool = jax.random.uniform(k, (1 << 16, 3), minval=-bound,
                                maxval=bound)
    w_pool = network.density(teacher_params, teacher_spec, x_pool)[0]
    w_pool = jnp.clip(w_pool, 0.0, None)

    t0 = time.time()
    loss = float("nan")
    for i in range(steps):
        rng, k1, k2, k3 = jax.random.split(rng, 4)
        n_u = batch // 2
        x_u = jax.random.uniform(k1, (n_u, 3), minval=-bound, maxval=bound)
        x_i = _importance_positions(k2, x_pool, w_pool, batch - n_u, bound)
        x = jnp.concatenate([x_u, x_i], axis=0)
        d = jax.random.normal(k3, (batch, 3))
        d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
        s_params, opt_state, loss_j = step(teacher_params, s_params,
                                           opt_state, x, d)
        if (i + 1) % log_every == 0 or i == 0:
            loss = float(loss_j)
            log_fn(f"[distill] step {i + 1}/{steps} loss={loss:.5f} "
                   f"({time.time() - t0:.1f}s)")
    return s_params, student_spec, float(loss_j)


def image_agreement(
    t_params, t_spec, s_params, s_spec,
    poses, intrinsics, H: int, W: int,
    grid=None, n_grid_updates: int = 6,
    teacher_max_samples: int = 256,
    student_samples: int = 128,   # the round-3 default operating point K
    bg_color: float = 1.0,
    teacher_chunk: int = 8192,
) -> Dict[str, Any]:
    """IMAGE-space distillation fidelity (round-3 item 2).

    Renders the teacher through the offline bit-exact occupancy path
    (reference renderer semantics, /root/reference/nerf/renderer.py:552-585)
    and the student through the fused tile kernel (static frame) at the
    SAME poses, and reports per-view + mean PSNR/SSIM. Field-space
    agreement (field_agreement) can miss visible blur; this is the number
    a user sees.

    H, W must be multiples of 16 (fused tile size).
    """
    import jax.numpy as jnp

    from pienerf_tpu.ops import beam_bend
    from pienerf_tpu.ops import grid as gridlib
    from pienerf_tpu.ops.pallas import field_kernel
    from pienerf_tpu.render import interactive
    from pienerf_tpu.render import renderer as rlib
    from pienerf_tpu.train.metrics import psnr as psnr_fn
    from pienerf_tpu.train.metrics import ssim as ssim_fn

    assert H % 16 == 0 and W % 16 == 0, "fused tiles need 16-aligned frames"
    bound = t_spec.bound
    cascade = 1 + int(np.ceil(np.log2(max(bound, 1.0))))
    settings = rlib.RenderSettings(
        bound=bound, cascade=cascade, min_near=0.05,
        max_samples=teacher_max_samples, max_steps=1024)
    if grid is None:
        grid = gridlib.init(cascade)
        rng = jax.random.PRNGKey(0)

        def dens(x):
            s, _ = network.density(t_params, t_spec, x)
            return s

        for _ in range(n_grid_updates):
            rng, k = jax.random.split(rng)
            grid = gridlib.update(grid, dens, bound, 0.01, k)

    pw = field_kernel.pack_weights(s_params, s_spec)
    bst = beam_bend.BeamBendSettings(num_seek_ip=1, max_iter_num=1)
    ist = interactive.InteractiveSettings(
        spec=s_spec, bend=bst, tile=16, samples=student_samples,
        active_frac=1.0, min_near=0.05, deformed=False, bound=bound)
    dummy_pack = jnp.zeros((1, 16), jnp.float32)
    dummy_pdef = jnp.zeros((1, 3), jnp.float32)

    psnrs, ssims = [], []
    for pose in poses:
        # small ray chunks: a hashgrid teacher's encode materializes
        # [8, L, rays*K] corner arrays — 65536-ray chunks at K=256 are an
        # 8.6 GB HLO temp (OOM on a 16 GB chip); 8192 keeps it ~1 GB
        t_out = rlib.render_image(t_params, t_spec, settings, grid,
                                  pose, intrinsics, H, W, bg_color,
                                  chunk=teacher_chunk)
        s_out = interactive.render_frame_fused(
            ist, pw, dummy_pack, dummy_pdef, jnp.asarray(pose, jnp.float32),
            intrinsics, H, W, jnp.float32(bg_color))
        s_img = interactive.tiles_to_image(
            np.asarray(s_out["tiles_image"]), H, W, 16)
        t_img = np.asarray(t_out["image"])
        psnrs.append(float(psnr_fn(s_img, t_img)))
        ssims.append(float(ssim_fn(s_img, t_img)))
    return {
        "psnr_per_view": psnrs,
        "ssim_per_view": ssims,
        "psnr_mean": float(np.mean(psnrs)),
        "ssim_mean": float(np.mean(ssims)),
    }


def field_agreement(t_params, t_spec, s_params, s_spec, n: int = 4096,
                    seed: int = 1) -> Dict[str, float]:
    """Held-out field-space agreement diagnostics."""
    rng = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(rng)
    x = jax.random.uniform(k1, (n, 3), minval=-t_spec.bound,
                           maxval=t_spec.bound)
    d = jax.random.normal(k2, (n, 3))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    sig_t, rgb_t = network.forward(t_params, t_spec, x, d)
    sig_s, rgb_s = network.forward(s_params, s_spec, x, d)
    a_t = 1.0 - jnp.exp(-jnp.clip(sig_t, 0, 1e4) * 0.01)
    return {
        "sigma_logmse": float(jnp.mean(
            (jnp.log1p(sig_s) - jnp.log1p(sig_t)) ** 2)),
        "rgb_mse_weighted": float(jnp.mean(
            a_t[:, None] * (rgb_s - rgb_t) ** 2)),
        "occupancy_iou": float(
            jnp.sum((sig_s > 1.0) & (sig_t > 1.0))
            / jnp.maximum(jnp.sum((sig_s > 1.0) | (sig_t > 1.0)), 1)),
    }
