"""Training loop for the radiance field.

Functional core (`make_train_step`) + a `Trainer` facade with the reference's
workflow surface: train / evaluate / test, EMA weights, density-grid refresh
every `update_extra_interval` steps, checkpoint save/load with rotation
(reference: nerf/trainer.py:5-916).

Optimizer matches the reference recipe (main_train.py:69-79): Adam(0.9, 0.99,
eps=1e-15), exponential lr decay to 0.1x over `iters`, EMA(0.95) of params.
"""

from __future__ import annotations

import functools
import glob
import os
import time
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pienerf_tpu.config import PieNeRFConfig
from pienerf_tpu.data.rays import (get_rays_sampled, sample_patch_indices,
                                   sample_pixel_indices)
from pienerf_tpu.io import checkpoint as ckpt_io
from pienerf_tpu.models import network
from pienerf_tpu.ops import grid as gridlib
from pienerf_tpu.render import renderer
from pienerf_tpu.train.metrics import PSNRMeter


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    ema_params: Any
    step: jax.Array


def _params_finite(tree) -> bool:
    """True iff every float leaf of a param tree is finite everywhere."""
    for leaf in jax.tree_util.tree_leaves(tree):
        a = np.asarray(leaf)
        if np.issubdtype(a.dtype, np.floating) and not np.isfinite(a).all():
            return False
    return True


def make_optimizer(lr: float, total_iters: int,
                   lr_decay_rate: float = 0.1) -> optax.GradientTransformation:
    # Default decay matches the reference (main_train.py:69-74: exponential
    # LambdaLR to 0.1x over `iters`). `lr_decay_rate` below 0.1 is a measured
    # extra: at PSNR >= 46 dB the 1e-3 floor leaves Adam's parameter jitter
    # visible as ~+-0.5 dB held-out eval noise; a deeper tail (e.g. 0.01)
    # freezes the plateau (see PERF.md "Training quality at scale").
    sched = optax.exponential_decay(
        init_value=lr, transition_steps=total_iters, decay_rate=lr_decay_rate
    )
    # apply_if_finite = the TPU translation of the reference's fp16
    # GradScaler step-skipping (reference nerf/trainer.py:84: scaler.step
    # silently skips updates with inf/nan grads). Without it one stray
    # non-finite gradient (observed once in 10k steps at 800x800/bf16:
    # a trunc_exp overflow on a grazing sample) permanently NaNs the
    # params mid-run.
    return optax.apply_if_finite(
        optax.adam(sched, b1=0.9, b2=0.99, eps=1e-15),
        max_consecutive_errors=100)


def make_train_step(
    spec: network.NetworkSpec,
    settings: renderer.RenderSettings,
    optimizer: optax.GradientTransformation,
    ema_decay: float = 0.95,
    use_fast_path: bool = False,
    patch_size: int = 1,
    lpips_weights: Optional[dict] = None,
) -> Callable:
    """Build the jitted train step.

    batch: dict with rays_o [N,3], rays_d [N,3], pixels [N,3or4].
    RGBA targets composite onto a per-step random background
    (reference nerf/trainer.py:187-198).

    use_fast_path trains through the gather-free hierarchical renderer
    (render/fast.py) instead of the occupancy-grid march — the right choice
    for the mlp backbone on TPU (occupancy bit tests are random gathers,
    PERF.md; measured ~40 ms/step of pure lookup cost at 4096x1024).
    """
    if use_fast_path:
        from pienerf_tpu.render import fast as fastlib

        fast_settings = fastlib.FastSettings(
            bound=settings.bound, min_near=settings.min_near,
            density_scale=settings.density_scale,
            T_thresh=settings.T_thresh,
            num_coarse=settings.max_samples // 2,
            num_fine=settings.max_samples - settings.max_samples // 2,
            bg_radius=settings.bg_radius,
        )

    @jax.jit
    def train_step(state: TrainState, bitfield: jax.Array,
                   batch: Dict[str, jax.Array], rng: jax.Array
                   ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        k_bg, k_perturb = jax.random.split(rng)
        pixels = batch["pixels"]
        if pixels.shape[-1] == 4:
            bg = jax.random.uniform(k_bg, (pixels.shape[0], 3))
            target = pixels[:, :3] * pixels[:, 3:] + bg * (1.0 - pixels[:, 3:])
        else:
            bg = jnp.ones((pixels.shape[0], 3))
            target = pixels

        def loss_fn(params):
            if use_fast_path:
                out = fastlib.render_rays_fast(
                    params, spec, fast_settings,
                    batch["rays_o"], batch["rays_d"], bg, k_perturb,
                )
            else:
                out = renderer.render_rays(
                    params, spec, settings, bitfield,
                    batch["rays_o"], batch["rays_d"], bg,
                    rng=k_perturb, perturb=True,
                )
            loss = jnp.mean((out["image"] - target) ** 2)
            per_ray = jnp.mean((out["image"] - target) ** 2, axis=-1)
            if patch_size >= 32 and lpips_weights is not None:
                # LPIPS needs >=32px patches (reference patch sizes:
                # 64/32/16, but alex features collapse below 32)
                # perceptual patch loss, 1e-3-weighted like the reference
                # (nerf/trainer.py:207-218); rays arrive patch-major
                from pienerf_tpu.train import lpips as lp
                p = patch_size
                pred = out["image"].reshape(-1, p, p, 3)
                gt = target.reshape(-1, p, p, 3)
                loss = loss + 1e-3 * jnp.mean(
                    lp.lpips(pred, gt, lpips_weights))
            return loss, per_ray

        (loss, per_ray), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        ema = jax.tree_util.tree_map(
            lambda e, p: ema_decay * e + (1.0 - ema_decay) * p,
            state.ema_params, params,
        )
        new_state = TrainState(params, opt_state, ema, state.step + 1)
        return new_state, {"loss": loss, "per_ray_loss": per_ray}

    return train_step


def make_clip_step(
    spec: network.NetworkSpec,
    optimizer: optax.GradientTransformation,
    clip_params,
    text_z,
    rH: int,
    rW: int,
    intrinsics,
    radius: float = 1.0,
    bound: float = 1.0,
    num_samples: int = 64,
    clip_size: int = 224,
    ema_decay: float = 0.95,
) -> Callable:
    """CLIP-guided train step (reference rand_pose mode,
    nerf/trainer.py:163-178 + provider.py:277-297): render a LOW-RES full
    frame from a random orbit pose through the differentiable hierarchical
    path on a white background, descend the negative image-text cosine
    similarity. Entirely device-side (the orbit pose is sampled in-jit,
    unlike the reference's host-side rand_poses).

    ``clip_size`` overrides the 224 CLIP input so tests can run a tiny
    vision tower.
    """
    from pienerf_tpu.data.rays import get_rays_full
    from pienerf_tpu.render import fast as fastlib
    from pienerf_tpu.train import clip_guidance as cg

    fast_settings = fastlib.FastSettings(
        bound=bound, num_coarse=num_samples // 2,
        num_fine=num_samples - num_samples // 2)

    @jax.jit
    def clip_step(state: TrainState, rng: jax.Array):
        k_pose, k_perturb = jax.random.split(rng)
        # orbit pose (reference provider.py:57-91 ranges):
        # theta in [pi/3, 2pi/3], phi in [0, 2pi), look-at origin
        u1, u2 = jax.random.uniform(k_pose, (2,))
        theta = jnp.pi / 3.0 + u1 * jnp.pi / 3.0
        phi = u2 * 2.0 * jnp.pi
        center = radius * jnp.stack([
            jnp.sin(theta) * jnp.sin(phi), jnp.cos(theta),
            jnp.sin(theta) * jnp.cos(phi)])
        fwd = -center / jnp.linalg.norm(center)
        up = jnp.asarray([0.0, 1.0, 0.0])
        right = jnp.cross(fwd, up)
        right = right / jnp.maximum(jnp.linalg.norm(right), 1e-8)
        upv = jnp.cross(right, fwd)
        pose = jnp.eye(4, dtype=jnp.float32)
        pose = pose.at[:3, 0].set(right).at[:3, 1].set(upv)
        pose = pose.at[:3, 2].set(-fwd).at[:3, 3].set(center)
        rays_o, rays_d = get_rays_full(pose, intrinsics, rH, rW)

        def loss_fn(params):
            out = fastlib.render_rays_fast(
                params, spec, fast_settings, rays_o, rays_d,
                jnp.ones((rays_o.shape[0], 3)), k_perturb)
            img = out["image"].reshape(1, rH, rW, 3)
            return cg.clip_loss(clip_params, img, text_z, size=clip_size)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        ema = jax.tree_util.tree_map(
            lambda e, p: ema_decay * e + (1.0 - ema_decay) * p,
            state.ema_params, params)
        return TrainState(params, opt_state, ema, state.step + 1), loss

    return clip_step


def make_train_chunk(
    train_step: Callable,
    H: int,
    W: int,
    intrinsics,
    num_rays: int,
    patch_size: int = 1,
    use_error_map: bool = False,
) -> Callable:
    """Scan `n_steps` full training iterations inside ONE jit.

    Round-1 weakness: the python loop dispatched ~8 eager device ops per
    step (view randint + host int(), index sampling, ray gen, pixel
    gather, error-map EMA) plus a float(loss) sync — each dispatch costs
    ~4 ms through the hosted TPU tunnel. Here view choice, sampling, ray
    generation, pixel gather, the optimizer step, and the error-map EMA
    all live in a single lax.scan; the host syncs once per chunk.

    Returns chunk(state, bitfield, poses, images, error_map, rng, n_steps)
    -> (state, error_map, losses [n_steps]).
    """

    @functools.partial(jax.jit, static_argnames=("n_steps",))
    def chunk(state, bitfield, poses, images, error_map, rng, n_steps: int):
        B = poses.shape[0]
        imgs_flat = images.reshape(B, H * W, images.shape[-1])

        def body(carry, k):
            st, emap = carry
            k1, k2, k3 = jax.random.split(k, 3)
            vi = jax.random.randint(k1, (), 0, B)
            if patch_size > 1:
                inds = sample_patch_indices(k2, H, W, num_rays, patch_size)
                coarse = None
            elif use_error_map:
                inds, coarse = sample_pixel_indices(k2, H, W, num_rays,
                                                    emap[vi])
            else:
                inds, coarse = sample_pixel_indices(k2, H, W, num_rays)
            rays_o, rays_d = get_rays_sampled(poses[vi], intrinsics, H, W,
                                              inds)
            pix = imgs_flat[vi][inds]
            batch = {"rays_o": rays_o, "rays_d": rays_d, "pixels": pix}
            st, m = train_step(st, bitfield, batch, k3)
            if coarse is not None:
                err = 0.9 * emap[vi][coarse] + 0.1 * m["per_ray_loss"]
                emap = emap.at[vi, coarse].set(err)
            return (st, emap), m["loss"]

        keys = jax.random.split(rng, n_steps)
        (state, error_map), losses = jax.lax.scan(
            body, (state, error_map), keys)
        return state, error_map, losses

    return chunk


class Trainer:
    """Workflow facade (reference nerf/trainer.py Trainer)."""

    def __init__(self, name: str, cfg: PieNeRFConfig,
                 spec: Optional[network.NetworkSpec] = None,
                 workspace: Optional[str] = None,
                 use_checkpoint: str = "latest",
                 eval_interval: int = 50,
                 max_keep_ckpt: int = 2,
                 seed: Optional[int] = None):
        self.name = name
        self.cfg = cfg
        self.workspace = workspace or cfg.workspace
        self.eval_interval = eval_interval
        self.max_keep_ckpt = max_keep_ckpt
        self.epoch = 0
        self.global_step = 0
        self.stats: Dict[str, Any] = {"results": [], "checkpoints": []}
        self.error_map = None  # [B, 128*128] when cfg.error_map

        self.spec = spec or network.make_spec(
            bound=cfg.bound, bg_radius=cfg.bg_radius,
            compute_dtype=cfg.compute_dtype, backbone=cfg.backbone,
        )
        self.settings = renderer.RenderSettings(
            bound=cfg.bound, cascade=cfg.cascade, min_near=cfg.min_near,
            dt_gamma=cfg.dt_gamma, max_steps=cfg.max_steps,
            T_thresh=cfg.T_thresh, max_samples=cfg.train_max_samples,
            bg_radius=cfg.bg_radius,
        )
        self.rng = jax.random.PRNGKey(seed if seed is not None else cfg.seed)
        self.rng, k = jax.random.split(self.rng)
        params = network.init_params(k, self.spec)
        # The reference applies EMA(0.95) once per EPOCH (nerf/
        # trainer.py:512-513), and an epoch is one pass over the train
        # loader = one step per image (provider.py:325-332) — so its
        # effective PER-STEP decay is 0.95^(1/n_images), a window of
        # hundreds-to-thousands of steps. Round 3 applied 0.95 per STEP
        # (a ~20-step window), which let held-out evals ride the raw Adam
        # post-convergence wander: the 800x800 curve peaked at 48.6 dB at
        # step 6k and DECLINED to 45.5 by 30k (PERF.md). The per-step
        # decay is derived from the dataset length when training starts
        # (_ensure_ema_decay); until then the per-step base applies.
        self._ema_base = 0.95
        self._ema_step_decay = self._ema_base
        self.optimizer = make_optimizer(
            cfg.lr, cfg.iters, getattr(cfg, "lr_decay_rate", 0.1))
        self.state = TrainState(
            params=params,
            opt_state=self.optimizer.init(params),
            ema_params=params,
            step=jnp.zeros((), jnp.int32),
        )
        self.grid = gridlib.init(cfg.cascade)
        # mlp backbone: train gather-free (see make_train_step)
        self._use_fast_train = self.spec.backbone == "mlp"
        lpips_w = None
        if cfg.patch_size > 1:
            from pienerf_tpu.train import lpips as lp
            if lp.available():
                lpips_w = lp.load_weights()
            else:
                print("[trainer] patch mode without LPIPS weights: "
                      "MSE-only patch loss (see train/lpips.py to enable)")
        self._lpips_weights = lpips_w
        self._train_step = make_train_step(
            self.spec, self.settings, self.optimizer,
            ema_decay=self._ema_step_decay,
            use_fast_path=self._use_fast_train,
            patch_size=cfg.patch_size, lpips_weights=lpips_w)
        self._density_fn = self._make_density_fn()

        os.makedirs(os.path.join(self.workspace, "checkpoints"), exist_ok=True)
        self.log_path = os.path.join(self.workspace, "log_ngp.txt")
        # tensorboard scalars (reference nerf/trainer.py:655-657)
        self.writer = None
        try:
            from tensorboardX import SummaryWriter

            self.writer = SummaryWriter(os.path.join(self.workspace, "run"))
        except ImportError:
            pass

        if use_checkpoint == "latest":
            self.load_checkpoint(None)
        elif use_checkpoint not in ("scratch", None) or cfg.ckpt_path:
            self.load_checkpoint(cfg.ckpt_path or use_checkpoint)

    # -- internals ---------------------------------------------------------

    def _make_density_fn(self):
        spec = self.spec

        def density_fn(x, params):
            sigma, _ = network.density(params, spec, x)
            return sigma * self.settings.density_scale

        jitted = jax.jit(density_fn)
        return jitted

    def log(self, msg: str) -> None:
        print(msg)
        with open(self.log_path, "a") as f:
            f.write(msg + "\n")

    # -- training ----------------------------------------------------------

    def update_extra_state(self) -> None:
        params = self.state.params
        fn = functools.partial(self._density_fn, params=params)
        self.rng, k = jax.random.split(self.rng)
        self.grid = gridlib.update(
            self.grid, fn, self.cfg.bound, self.cfg.density_thresh, k
        )

    def mark_untrained_grid(self, poses, intrinsics) -> None:
        self.grid = gridlib.mark_untrained(self.grid, poses, intrinsics,
                                           self.cfg.bound)

    def _ensure_ema_decay(self, n_views: int) -> None:
        """Set the per-step EMA decay to match the reference's per-EPOCH
        EMA(0.95) (nerf/trainer.py:512-513; one step per image per epoch,
        provider.py:325-332): decay_step = 0.95 ** (1 / n_views). Rebuilds
        the train step (and invalidates the scanned chunk) when it
        changes — normally once, at the first train_iterations call."""
        eff = float(self._ema_base ** (1.0 / max(int(n_views), 1)))
        if abs(eff - self._ema_step_decay) < 1e-12:
            return
        self._ema_step_decay = eff
        self._rebuild_train_step()

    def _rebuild_train_step(self) -> None:
        self._train_step = make_train_step(
            self.spec, self.settings, self.optimizer,
            ema_decay=self._ema_step_decay,
            use_fast_path=self._use_fast_train,
            patch_size=self.cfg.patch_size,
            lpips_weights=self._lpips_weights)
        self._chunk_key = None

    def set_compute_dtype(self, dtype: str) -> None:
        """Switch the compute dtype mid-run (params/EMA/opt state are f32
        master copies, so this only changes the traced forward). Used by
        the precision-tail schedule below."""
        if self.spec.compute_dtype == dtype:
            return
        self.spec = self.spec._replace(compute_dtype=dtype)
        self._density_fn = self._make_density_fn()
        self._rebuild_train_step()
        self.log(f"[trainer] compute dtype -> {dtype} "
                 f"at step {self.global_step}")

    def _maybe_precision_tail(self) -> None:
        """TPU extra (off by default): from cfg.precision_tail_start on,
        train in float32. Measured motivation (PERF.md "bf16 output-
        quantization floor"): once train loss reaches the bf16 rounding
        floor (~2e-6 MSE on the sphere fixture), gradients are dominated
        by autocorrelated quantization noise and Adam drifts COHERENTLY —
        train loss rises and held-out PSNR declines several dB. Switching
        the tail of the run to f32 drops the floor by ~100x for a 2-3x
        per-step cost paid only on the tail fraction."""
        ts = getattr(self.cfg, "precision_tail_start", None)
        if (ts is not None and ts >= 0 and self.global_step >= ts
                and self.spec.compute_dtype != "float32"):
            self.set_compute_dtype("float32")

    def _get_train_chunk(self, H: int, W: int, intrinsics) -> Callable:
        key = (H, W, tuple(float(v) for v in intrinsics),
               bool(self.cfg.error_map))
        if getattr(self, "_chunk_key", None) != key:
            self._chunk_fn = make_train_chunk(
                self._train_step, H, W, intrinsics, self.cfg.num_rays,
                patch_size=self.cfg.patch_size,
                use_error_map=bool(self.cfg.error_map))
            self._chunk_key = key
        return self._chunk_fn

    def train_iterations(self, dataset, n_iters: int) -> float:
        """Run n_iters steps sampling random views from `dataset`.

        dataset: object with poses [B,4,4] np, images [B,H,W,C] np,
        intrinsics (fx,fy,cx,cy), H, W.

        Two execution strategies:
        - scanned (default everywhere): the whole iteration (view choice,
          sampling, ray gen, pixel gather, optimizer step, error-map EMA)
          runs device-side via make_train_chunk; the host syncs once per
          sub-chunk. Round-2 history: the then-hosted `axon` TPU worker
          crashed ("kernel fault") EXECUTING this program at any scan
          length, so round 2 shipped an eager fallback keyed on the
          backend name. The round-3 runtime executes the scan correctly
          (validated: 128 scanned iters, ~5 ms/step at 1024x48 vs ~65 ms
          eager through the tunnel — PERF.md "Scanned training loop"), so
          the scan is now the default on every backend.
        - eager: one jitted step per iteration with eager sampling ops
          around it; kept for large host-resident datasets and as the
          PIENERF_TRAIN_SCAN=0 escape hatch.

        Tripwire: the legacy `axon`-named hosted worker executes the
        scanned program INCORRECTLY at scale (round 2: crash; round 3:
        silently non-finite losses at 800x800/4096 rays while the same
        program is finite on CPU and the current TPU runtime). The first
        scanned chunk is therefore checked: if its losses are non-finite
        while the state was finite going in, the chunk is rolled back and
        training continues on the eager path for this Trainer.
        """
        self._ensure_ema_decay(len(dataset.poses))
        use_scan = os.environ.get("PIENERF_TRAIN_SCAN", "1") != "0"
        if getattr(self, "_scan_disabled", False):
            use_scan = False
        # large real datasets (e.g. 100 x 800^2 rgba) should not be
        # force-resident in HBM; keep them on host and gather the sampled
        # pixels per step instead (round-1 weakness #7 footgun)
        max_dev = float(os.environ.get("PIENERF_MAX_DEVICE_DATASET", 2e9))
        # size from metadata only: np.asarray here would materialize a full
        # host copy of a device-resident/list-backed image set every call
        imgs = dataset.images
        if hasattr(imgs, "nbytes"):
            img_bytes = int(imgs.nbytes)
        else:
            a0 = np.asarray(imgs[0])
            img_bytes = len(imgs) * a0.nbytes
        host_images = img_bytes > max_dev
        if not use_scan or host_images:
            return self._train_iterations_eager(dataset, n_iters,
                                                host_images=host_images)
        losses = []
        poses = jnp.asarray(dataset.poses, jnp.float32)
        images = jnp.asarray(dataset.images, jnp.float32)
        H, W = dataset.H, dataset.W
        B = poses.shape[0]

        if self.cfg.error_map and self.error_map is None:
            self.error_map = jnp.ones((B, 128 * 128), jnp.float32)
        chunk_fn = self._get_train_chunk(H, W, dataset.intrinsics)
        # 8-step scan for the fast path: the hosted TPU backend's compile
        # latency grows sharply with this program's scan length (the
        # remote-compile service crashed outright at 100 steps and
        # thrashed at 25 — tools/micro_train2.py); at ~40 ms/step even 8
        # amortizes the ~4 ms dispatch to sub-ms noise
        sub = (self.cfg.update_extra_interval if not self._use_fast_train
               else 8)

        done = 0
        first_chunk = not getattr(self, "_scan_validated", False)
        snapshot = (jax.tree_util.tree_map(np.asarray, self.state)
                    if first_chunk else None)
        while done < n_iters:
            self._maybe_precision_tail()
            chunk_fn = self._get_train_chunk(H, W, dataset.intrinsics)
            if (not self._use_fast_train
                    and self.global_step % self.cfg.update_extra_interval == 0):
                self.update_extra_state()
            n = min(sub, n_iters - done)
            ts = getattr(self.cfg, "precision_tail_start", None)
            if ts is not None and ts >= 0 and self.global_step < ts:
                n = min(n, ts - self.global_step)
            if not self._use_fast_train:
                n = min(n, self.cfg.update_extra_interval
                        - self.global_step % self.cfg.update_extra_interval)
            self.rng, k = jax.random.split(self.rng)
            self.state, self.error_map, loss_arr = chunk_fn(
                self.state, self.grid.bitfield, poses, images,
                self.error_map, k, n_steps=int(n))
            self.global_step += int(n)
            done += int(n)
            loss_np = np.asarray(loss_arr)       # ONE sync per sub-chunk
            if first_chunk:
                if not np.isfinite(loss_np).all():
                    if not _params_finite(snapshot.params):
                        # not the runtime's fault: the state was poisoned
                        # before the chunk ran (load_checkpoint now refuses
                        # such states, so this is a belt-and-braces guard)
                        raise RuntimeError(
                            "training state is non-finite BEFORE the first "
                            "scanned chunk — corrupt checkpoint or init; "
                            "refusing to train from garbage")
                    # the runtime mis-executed the scan (see docstring):
                    # roll back and continue eager
                    self.log("[trainer] scanned chunk produced non-finite "
                             "losses on a fresh state; rolling back and "
                             "falling back to the eager loop "
                             "(runtime scan-execution bug, see PERF.md)")
                    self._scan_disabled = True
                    self.state = jax.tree_util.tree_map(jnp.asarray,
                                                        snapshot)
                    self.global_step -= int(n)
                    done -= int(n)
                    return self._train_iterations_eager(
                        dataset, n_iters - done, host_images=False)
                self._scan_validated = True
                first_chunk = False
            losses.append(float(loss_np.mean()))
            if self.writer is not None:
                self.writer.add_scalar("train/loss", losses[-1],
                                       self.global_step)
        return float(np.mean(losses))

    def _train_iterations_eager(self, dataset, n_iters: int,
                                host_images: bool = False) -> float:
        """Per-step loop (see train_iterations: hosted-tunnel fallback and
        large-dataset mode — with host_images the full image set stays in
        host RAM and only each step's sampled pixels transfer)."""
        self._ensure_ema_decay(len(dataset.poses))
        losses = []
        poses = jnp.asarray(dataset.poses, jnp.float32)
        if host_images:
            images_np = np.asarray(dataset.images, np.float32)
            images = None
        else:
            images = jnp.asarray(dataset.images, jnp.float32)
        intr = dataset.intrinsics
        H, W = dataset.H, dataset.W
        B = poses.shape[0]

        if self.cfg.error_map and self.error_map is None:
            self.error_map = jnp.ones((B, 128 * 128), jnp.float32)

        for _ in range(n_iters):
            self._maybe_precision_tail()
            if (not self._use_fast_train
                    and self.global_step % self.cfg.update_extra_interval == 0):
                self.update_extra_state()
            self.rng, k1, k2, k3 = jax.random.split(self.rng, 4)
            vi = int(jax.random.randint(k1, (), 0, B))
            if self.cfg.patch_size > 1:
                inds = sample_patch_indices(k2, H, W, self.cfg.num_rays,
                                            self.cfg.patch_size)
                inds_coarse = None
            else:
                emap = (self.error_map[vi]
                        if self.error_map is not None else None)
                inds, inds_coarse = sample_pixel_indices(
                    k2, H, W, self.cfg.num_rays, emap)
            rays_o, rays_d = get_rays_sampled(poses[vi], intr, H, W, inds)
            if host_images:
                pix = jnp.asarray(
                    images_np[vi].reshape(H * W, -1)[np.asarray(inds)])
            else:
                pix = images[vi].reshape(H * W, -1)[inds]
            batch = {"rays_o": rays_o, "rays_d": rays_d, "pixels": pix}
            self.state, m = self._train_step(self.state, self.grid.bitfield,
                                             batch, k3)
            if inds_coarse is not None:
                err = 0.9 * self.error_map[vi][inds_coarse] \
                    + 0.1 * m["per_ray_loss"]
                self.error_map = self.error_map.at[vi, inds_coarse].set(err)
            self.global_step += 1
            losses.append(float(m["loss"]))
            if self.writer is not None and self.global_step % 50 == 0:
                self.writer.add_scalar("train/loss", losses[-1],
                                       self.global_step)
        return float(np.mean(losses))

    # -- CLIP guidance (reference rand_pose mode, trainer.py:138-141) ------

    def _clip_guidance(self):
        """Lazy CLIPGuidance with prepared text, or None with a logged
        reason (weights/tokenizer are gated under zero egress —
        train/clip_guidance.py docstring has the export recipes)."""
        if hasattr(self, "_clip_guide"):
            return self._clip_guide
        from pienerf_tpu.train import clip_guidance as cg

        self._clip_guide = None
        if not cg.available():
            self.log("[trainer] rand_pose mode without CLIP weights: "
                     "skipping CLIP guidance (see train/clip_guidance.py)")
            return None
        tok_dir = os.environ.get("PIENERF_CLIP_TOKENIZER")
        if not tok_dir:
            self.log("[trainer] CLIP weights present but no tokenizer "
                     "(set PIENERF_CLIP_TOKENIZER to a local "
                     "CLIPTokenizer dir); skipping CLIP guidance")
            return None
        guide = cg.CLIPGuidance()
        guide.prepare_text([self.cfg.clip_text], tokenizer_dir=tok_dir)
        self._clip_guide = guide
        return guide

    def train_clip_iterations(self, H: int, W: int, intrinsics,
                              n_iters: int, clip_size: int = 224) -> float:
        """n_iters CLIP-guided steps at the reference's low-res full-frame
        economy (provider.py:287-289: rH = H / sqrt(H*W/num_rays))."""
        guide = self._clip_guidance()
        if guide is None:
            return float("nan")
        s = float(np.sqrt(H * W / self.cfg.num_rays))
        rH, rW = max(int(H / s), 8), max(int(W / s), 8)
        intr = tuple(float(v) / s for v in intrinsics)
        key = (rH, rW, intr, clip_size)
        if getattr(self, "_clip_step_key", None) != key:
            self._clip_step_fn = make_clip_step(
                self.spec, self.optimizer, guide.params, guide.text_z,
                rH, rW, intr, radius=self.cfg.radius, bound=self.cfg.bound,
                num_samples=self.cfg.train_max_samples, clip_size=clip_size)
            self._clip_step_key = key
        losses = []
        for _ in range(n_iters):
            self.rng, k = jax.random.split(self.rng)
            self.state, loss = self._clip_step_fn(self.state, k)
            self.global_step += 1
            losses.append(float(loss))
        return float(np.mean(losses))

    def train(self, train_dataset, valid_dataset=None,
              max_iters: Optional[int] = None) -> None:
        total = max_iters or self.cfg.iters
        t0 = time.time()
        chunk = 500
        done = 0
        while done < total:
            n = min(chunk, total - done)
            if self.cfg.rand_pose == 0:
                # CLIP-only training (reference: rand_pose=0 means every
                # batch is a random pose scored by CLIP)
                loss = self.train_clip_iterations(
                    train_dataset.H, train_dataset.W,
                    train_dataset.intrinsics, n)
            else:
                loss = self.train_iterations(train_dataset, n)
                if self.cfg.rand_pose > 0:
                    # hybrid: one rand-pose CLIP batch per rand_pose known
                    # batches (reference provider.py:327-328)
                    self.train_clip_iterations(
                        train_dataset.H, train_dataset.W,
                        train_dataset.intrinsics,
                        max(n // self.cfg.rand_pose, 1))
            done += n
            self.log(
                f"[train] iter {self.global_step}/{total} loss={loss:.6f} "
                f"({(time.time() - t0):.1f}s)"
            )
            if valid_dataset is not None and done % (chunk * 4) == 0:
                p = self.evaluate(valid_dataset)
                self.log(f"[eval] PSNR={p:.3f}")
            self.save_checkpoint()

    # -- evaluation / inference --------------------------------------------

    def infer_settings(self, max_samples: int = 256) -> renderer.RenderSettings:
        return self.settings._replace(max_samples=max_samples)

    def render_pose(self, pose, intrinsics, H, W, bg_color=1.0,
                    use_ema: bool = True, max_samples: int = 256):
        params = self.state.ema_params if use_ema else self.state.params
        if self._use_fast_train:
            from pienerf_tpu.render import fast as fastlib

            st = fastlib.FastSettings(
                bound=self.cfg.bound, min_near=self.cfg.min_near,
                T_thresh=self.cfg.T_thresh,
                num_coarse=max_samples // 2,
                num_fine=max_samples - max_samples // 2,
                bg_radius=self.cfg.bg_radius,
            )
            return fastlib.render_image_fast(
                params, self.spec, st, pose, intrinsics, H, W, bg_color,
                chunk=self.cfg.render_ray_chunk)
        return renderer.render_image(
            params, self.spec, self.infer_settings(max_samples), self.grid,
            pose, intrinsics, H, W, bg_color,
            chunk=self.cfg.render_ray_chunk,
        )

    def test_gui(self, pose, intrinsics, W: int, H: int, bg_color=1.0,
                 downscale: float = 1.0, use_ema: bool = True,
                 max_samples: int = 128):
        """GUI render bridge (reference nerf/trainer.py:531-602): render at
        a downscaled resolution and return full-size-keyed results."""
        rH, rW = int(H * downscale), int(W * downscale)
        intr = tuple(v * downscale for v in intrinsics[:2]) + (
            intrinsics[2] * downscale, intrinsics[3] * downscale)
        out = self.render_pose(pose, intr, rH, rW, bg_color, use_ema,
                               max_samples)
        return {"image": out["image"], "depth": out["depth"]}

    def evaluate(self, dataset, n_views: Optional[int] = None,
                 save_images: bool = True) -> float:
        """Validation pass: PSNR + SSIM (+ LPIPS when weights present) and
        per-view PNG dumps under <workspace>/validation (reference
        nerf/trainer.py:748-787)."""
        from pienerf_tpu.train.metrics import LPIPSMeter, SSIMMeter

        meter = PSNRMeter()
        ssim_m = SSIMMeter()
        lpips_m = LPIPSMeter() if LPIPSMeter.available() else None
        out_dir = os.path.join(self.workspace, "validation")
        if save_images:
            os.makedirs(out_dir, exist_ok=True)
        B = len(dataset.poses)
        views = range(min(n_views or B, B))
        for vi in views:
            out = self.render_pose(dataset.poses[vi], dataset.intrinsics,
                                   dataset.H, dataset.W)
            gt = np.asarray(dataset.images[vi], np.float32)
            if gt.shape[-1] == 4:
                gt = gt[..., :3] * gt[..., 3:] + 1.0 * (1 - gt[..., 3:])
            pred = np.asarray(out["image"])
            meter.update(pred, gt)
            ssim_m.update(pred, gt)
            if lpips_m is not None:
                lpips_m.update(pred, gt)
            if save_images:
                from PIL import Image
                rgb = np.clip(pred * 255, 0, 255).astype(np.uint8)
                Image.fromarray(rgb).save(os.path.join(
                    out_dir, f"ngp_ep{self.global_step:06d}_{vi:04d}.png"))
                d = np.asarray(out["depth"])
                dn = np.clip(d / max(float(d.max()), 1e-6) * 255, 0,
                             255).astype(np.uint8)
                Image.fromarray(dn).save(os.path.join(
                    out_dir,
                    f"ngp_ep{self.global_step:06d}_{vi:04d}_depth.png"))
        msg = f"[eval] {meter.report()} | {ssim_m.report()}"
        if lpips_m is not None:
            msg += f" | {lpips_m.report()}"
        self.log(msg)
        if self.writer is not None:
            self.writer.add_scalar("eval/psnr", meter.measure(),
                                   self.global_step)
            self.writer.add_scalar("eval/ssim", ssim_m.measure(),
                                   self.global_step)
        return meter.measure()

    # -- geometry export -----------------------------------------------------

    def _density_np(self, x):
        import jax.numpy as _jnp
        return np.asarray(self._density_fn(_jnp.asarray(x, _jnp.float32),
                                           params=self.state.ema_params))

    def save_point_cloud(self, path: str, resolution: int = 256,
                         threshold: Optional[float] = None) -> str:
        """Density-thresholded grid point cloud (reference trainer.py:354)."""
        from pienerf_tpu.io.ply import write_ply
        from pienerf_tpu.utils import mesh as meshlib

        thr = threshold if threshold is not None else min(
            float(self.grid.mean_density) or self.cfg.density_thresh,
            self.cfg.density_thresh)
        pts = meshlib.extract_point_cloud(self._density_np, resolution,
                                          self.cfg.bound, thr)
        write_ply(path, pts.astype(np.float64))
        self.log(f"[point cloud] {len(pts)} pts -> {path}")
        return path

    def save_mesh(self, path: str, resolution: int = 256,
                  threshold: Optional[float] = None) -> str:
        """Isosurface mesh via marching tetrahedra (reference trainer.py:331)."""
        from pienerf_tpu.utils import mesh as meshlib

        thr = threshold if threshold is not None else min(
            float(self.grid.mean_density) or self.cfg.density_thresh,
            self.cfg.density_thresh)
        field = meshlib.extract_fields(self._density_np, resolution,
                                       self.cfg.bound)
        verts, tris = meshlib.marching_tetrahedra(field, thr, self.cfg.bound)
        meshlib.save_mesh_obj(path, verts, tris)
        self.log(f"[mesh] {len(verts)} verts -> {path}")
        return path

    # -- checkpointing -------------------------------------------------------

    def _ckpt_file(self, epoch: int) -> str:
        return os.path.join(self.workspace, "checkpoints",
                            f"{self.name}_ep{epoch:04d}.npz")

    def save_checkpoint(self, full: bool = True) -> str:
        # Never persist a poisoned state: a NaN checkpoint silently ruins
        # every later resume (observed round 3: a 48-dB run NaN'd mid-
        # flight pre-apply_if_finite, the rotation kept only NaN ckpts,
        # and the relaunch resumed from garbage).
        if not _params_finite(self.state.params):
            self.log("[ckpt] refusing to save: params are non-finite "
                     "(training diverged; fix the run, don't persist it)")
            return ""
        self.epoch += 1
        path = self._ckpt_file(self.epoch)
        extra = {
            "density_grid": np.asarray(self.grid.density),
            "mean_density": float(self.grid.mean_density),
            "iter_density": int(self.grid.iter_density),
            "epoch": self.epoch,
            "global_step": self.global_step,
        }
        ckpt_io.save_native(path, {
            "params": self.state.params,
            "ema_params": self.state.ema_params,
        }, extra)
        self.stats["checkpoints"].append(path)
        while len(self.stats["checkpoints"]) > self.max_keep_ckpt:
            old = self.stats["checkpoints"].pop(0)
            for f in (old, old + ".json"):
                if os.path.exists(f):
                    os.remove(f)
        return path

    def _adopt_mlp_arch(self, params) -> None:
        """Rebuild the spec from loaded mlp param shapes when they disagree
        with the configured architecture (e.g. a 128-wide distilled student
        loaded by a default-width Trainer). The architecture is fully
        recoverable from the weights: sigma_net[0] is [3*(1+2*n_freqs),
        hidden_dim]; color_net[0] is [31, hidden_dim_color]."""
        if self.spec.backbone != "mlp" or "sigma_net" not in params:
            return
        sn, cn = params["sigma_net"], params["color_net"]
        in_dim, hidden = sn[0].shape
        n_freqs = (in_dim // 3 - 1) // 2
        hidden_color = (cn[0].shape[1] if len(cn) > 1
                        else self.spec.hidden_dim_color)
        if (hidden == self.spec.hidden_dim
                and hidden_color == self.spec.hidden_dim_color
                and n_freqs == self.spec.n_freqs
                and len(sn) == self.spec.num_layers):
            return
        self.spec = self.spec._replace(
            n_freqs=n_freqs, hidden_dim=hidden,
            hidden_dim_color=hidden_color, num_layers=len(sn),
            num_layers_color=len(cn))
        self._train_step = make_train_step(
            self.spec, self.settings, self.optimizer,
            ema_decay=self._ema_step_decay,
            use_fast_path=self._use_fast_train,
            patch_size=self.cfg.patch_size,
            lpips_weights=self._lpips_weights)
        self._chunk_key = None
        self._density_fn = self._make_density_fn()
        self.log(f"[ckpt] adopted mlp arch from checkpoint: "
                 f"hidden={hidden}/{hidden_color}, n_freqs={n_freqs}, "
                 f"layers={len(sn)}+{len(cn)}")

    def load_checkpoint(self, path: Optional[str] = None) -> bool:
        if path is None:
            cands = sorted(glob.glob(
                os.path.join(self.workspace, "checkpoints", f"{self.name}_ep*.npz")
            ))
            pths = sorted(glob.glob(
                os.path.join(self.workspace, "checkpoints", "ngp_ep*.pth")
            ))
            path = cands[-1] if cands else (pths[-1] if pths else None)
        if path is None or not os.path.exists(path):
            return False

        if path.endswith(".pth"):
            params, extra = ckpt_io.load_torch_ngp(path)
            if not _params_finite(params):
                self.log(f"[ckpt] REFUSING to load {path}: params contain "
                         "non-finite values (corrupt checkpoint)")
                return False
            self.state = self.state._replace(params=params, ema_params=params,
                                             opt_state=self.optimizer.init(params))
        else:
            tree, extra = ckpt_io.load_native(path)
            params = tree.get("params", tree)
            ema = tree.get("ema_params", params)
            if not _params_finite(params):
                self.log(f"[ckpt] REFUSING to load {path}: params contain "
                         "non-finite values (corrupt checkpoint)")
                return False
            self._adopt_mlp_arch(params)
            self.state = self.state._replace(params=params, ema_params=ema,
                                             opt_state=self.optimizer.init(params))
        dg = extra.get("density_grid")
        if dg is not None:
            dg = jnp.asarray(dg, jnp.float32)
            md = jnp.asarray(float(extra.get("mean_density", 0.0)), jnp.float32)
            thresh = jnp.minimum(md, self.cfg.density_thresh)
            self.grid = gridlib.OccupancyGrid(
                density=dg,
                bitfield=gridlib.packbits(dg, thresh),
                mean_density=md,
                iter_density=jnp.asarray(int(extra.get("iter_density", 16)),
                                         jnp.int32),
            )
        self.epoch = int(extra.get("epoch", 0))
        self.global_step = int(extra.get("global_step", 0))
        self.log(f"[ckpt] loaded {path} (epoch {self.epoch}, "
                 f"step {self.global_step})")
        return True
