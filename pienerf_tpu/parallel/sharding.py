"""Multi-chip scaling via jax.sharding.

The reference carries dead DDP scaffolding (reference: nerf/trainer.py:55-57,
719-737 — never activated by any entry point). Here multi-chip is a
first-class, tested path:

- data parallelism: rays/pixels sharded over the mesh 'data' axis, params
  replicated; XLA inserts the gradient psum over ICI automatically.
- rendering parallelism: full frames shard by rays (embarrassingly
  parallel), sim state replicated.

Helpers return sharded arrays + a jitted step; works identically on a real
multi-chip mesh or on virtual CPU devices (tests use 8)."""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def shard_batch(mesh: Mesh, batch: Dict[str, jax.Array],
                axis: str = "data") -> Dict[str, jax.Array]:
    """Put each batch array on the mesh, sharded along its leading dim."""
    sh = NamedSharding(mesh, P(axis))
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def replicate(mesh: Mesh, tree: Any) -> Any:
    sh = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def render_frame_sharded(
    mesh: Mesh,
    settings,
    packed_w: jax.Array,
    ip_pack: jax.Array,
    p_def: jax.Array,
    pose: jax.Array,
    intrinsics,
    H: int,
    W: int,
    bg_color,
    cut_bounds=None,
    axis: str = "data",
):
    """Multi-chip interactive frame: the image splits into horizontal bands,
    one per device; scene state (IP pack, weights) is replicated, so the
    only cross-chip traffic is the final band gather over ICI.

    Returns the assembled [H, W, 3] image (numpy).
    """
    import numpy as np

    from pienerf_tpu.render import interactive

    n_dev = mesh.devices.size
    assert H % (n_dev * settings.tile) == 0, (
        f"H={H} must split into {n_dev} tile-aligned bands")
    band_h = H // n_dev
    fx, fy, cx, cy = intrinsics

    # active_frac is a whole-frame budget; a band that crosses the object
    # concentrates hit tiles far above frame-average density, and a
    # per-band cap of active_frac * band_tiles silently drops tiles
    # (caught by the production-shape dryrun: 0.35 max err at 896x800 vs
    # the single-device frame). Bands therefore run uncapped — a band has
    # n_tiles/n_dev tiles, so the per-device prep cost stays bounded.
    settings = settings._replace(active_frac=1.0)

    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = P()

    # fast-pack rows + single-step Newton -> the fused Pallas tile kernel
    # runs inside shard_map too (no cross-device comm inside the kernel)
    fused = (ip_pack.shape[1] == 16 and settings.tile == 16
             and settings.bend.max_iter_num == 1)
    render = (interactive.render_frame_fused if fused
              else interactive.render_frame)

    def band_render(band_idx):
        # band b covers image rows [b*band_h, (b+1)*band_h): shift cy
        b = band_idx[0]
        intr_band = (fx, fy, cx, cy - b.astype(jnp.float32) * band_h)
        out = render(
            settings, packed_w, ip_pack, p_def, pose, intr_band,
            band_h, W, bg_color, cut_bounds)
        img = out["tiles_image"].reshape(
            band_h // settings.tile, W // settings.tile,
            settings.tile, settings.tile, 3)
        img = jnp.transpose(img, (0, 2, 1, 3, 4)).reshape(band_h, W, 3)
        drops = jnp.stack([
            jnp.asarray(out["n_tile_overflow"], jnp.int32),
            jnp.asarray(out["dropped_beam"], jnp.int32),
            jnp.asarray(out["dropped_window"], jnp.int32)])
        return img[None], drops[None]                        # [1, bh, W, 3]

    band_ids = jax.device_put(
        jnp.arange(n_dev, dtype=jnp.int32),
        NamedSharding(mesh, P(axis)))

    fn = jax.shard_map(
        band_render, mesh=mesh,
        in_specs=(P(axis),),
        out_specs=P(axis),
        check_vma=False,
    )
    bands, drops = fn(band_ids)                              # [n_dev, bh, W, 3]
    img = np.asarray(bands).reshape(H, W, 3)
    d = np.asarray(drops).sum(0)
    counters = {"n_tile_overflow": int(d[0]), "dropped_beam": int(d[1]),
                "dropped_window": int(d[2])}
    return img, counters


def make_sharded_sim_step(mesh: Mesh, consts, axis: str = "data"):
    """Shard the simulator across the mesh by integration points.

    The per-step cost is the chunked F-assembly operator ``Dc`` [C, S, 3,
    80] (see SimConstants.Dc) — per-IP blocks batched over chunks.
    Sharding the chunk axis over the mesh splits that work n_devices-ways:
    the forward block matmul is chunk-local, and the transpose
    contraction's node segment-sum reduces over the sharded chunks — GSPMD
    inserts ONE psum of the small [10K, 3] result over ICI. The
    kernel-node arrays (dof state, global inverse) are small and
    replicate.

    Returns (consts_sharded, step) where step(consts_sharded, state) is the
    jitted sharded sim_step; state stays replicated so the renderer and
    force application are unchanged. consts_sharded pads the chunk axis of
    the step's operands to the mesh size — use it ONLY with `step`; keep
    the original consts for get_ip_info / update_force / rendering.
    """
    from pienerf_tpu.sim import solver as sim

    repl = NamedSharding(mesh, P())
    rows = NamedSharding(mesh, P(axis))
    n_dev = mesh.devices.size

    # the sharded step always takes the chunked path (that is what shards);
    # drop the small-scene dense operator if sim_init built one
    if consts.B is not None:
        consts = consts._replace(B=None)

    # pad the chunk dimension to a multiple of the mesh so it splits
    # evenly. Padded chunks have Dc = 0 and mu = lam = 0, so their
    # contribution is exactly zero in both directions (they scatter zeros
    # into node 0); the only deviation from the single-device trajectory
    # is f32 reduction order across the psum (~1e-5 relative per step).
    C = consts.Dc.shape[0]
    C_pad = -(-C // n_dev) * n_dev
    if C_pad != C:
        pad = C_pad - C
        consts = consts._replace(
            Dc=jnp.pad(consts.Dc, ((0, pad), (0, 0), (0, 0), (0, 0))),
            chunk_nodes=jnp.pad(consts.chunk_nodes, ((0, pad), (0, 0))),
            chunk_mu=jnp.pad(consts.chunk_mu, ((0, pad), (0, 0))),
            chunk_lam=jnp.pad(consts.chunk_lam, ((0, pad), (0, 0))),
        )

    _chunked = {"Dc", "chunk_nodes", "chunk_mu", "chunk_lam"}

    def spec_for(name):
        return rows if name in _chunked else repl

    consts_shardings = type(consts)(
        **{f: (None if getattr(consts, f) is None else spec_for(f))
           for f in consts._fields})
    consts_sh = jax.tree_util.tree_map(
        lambda leaf, sh: jax.device_put(leaf, sh)
        if hasattr(leaf, "shape") else leaf,
        consts, consts_shardings)

    state_repl = sim.SimState(ddof=repl, dof_vel=repl, dof_f=repl)

    step = jax.jit(
        sim.sim_step,
        in_shardings=(jax.tree_util.tree_map(
            lambda leaf, sh: sh if hasattr(leaf, "shape") else None,
            consts, consts_shardings), state_repl),
        out_shardings=state_repl,
    )
    return consts_sh, step


def make_sharded_train_step(train_step, mesh: Mesh, axis: str = "data"):
    """Wrap a (state, bitfield, batch, rng) train step with explicit
    shardings: batch sharded on `axis`, everything else replicated.

    The per-ray loss reduction inside the step becomes a cross-device psum
    inserted by XLA (riding ICI on real hardware)."""
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(axis))

    def sharded_step(state, bitfield, batch, rng):
        batch = {k: jax.lax.with_sharding_constraint(v, data)
                 for k, v in batch.items()}
        return train_step(state, bitfield, batch, rng)

    return jax.jit(sharded_step,
                   in_shardings=(repl, repl, data, repl),
                   out_shardings=(repl, repl))
