"""Coupled sim + deformed-render frame pipeline — the interactive loop.

The reference's per-frame path (reference: nerf/gui.py:556-645 ->
nerf/trainer.py:284-329 -> solver.stepforward + renderer.rund_cuda) crosses
torch <-> Warp <-> CUDA-extension boundaries several times per frame. Here
the whole frame is ONE jitted function over device-resident state:

    frame_step(sim_consts, sim_state, params, bitfield, rays, force)
        -> (sim_state', image, depth)

which the driver/GUI calls once per frame; sim state, IP data, the spatial
hash, and the radiance field never leave HBM.
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


from pienerf_tpu.models import network
from pienerf_tpu.render import deformed
from pienerf_tpu.sim import solver as sim


class FrameSettings(NamedTuple):
    spec: network.NetworkSpec
    deformed: deformed.DeformedSettings


@functools.partial(jax.jit, static_argnames=("settings", "substeps"))
def frame_step(
    settings: FrameSettings,
    consts: sim.SimConstants,
    state: sim.SimState,
    params,
    bitfield: jax.Array,
    rays_o: jax.Array,            # [N, 3]
    rays_d: jax.Array,            # [N, 3]
    bg_color: jax.Array,
    force_vid: jax.Array,         # [] int32; < 0 disables the force
    force: jax.Array,             # [3]
    cut_bounds: Optional[jax.Array] = None,
    substeps: int = 1,
) -> Tuple[sim.SimState, Dict[str, jax.Array]]:
    """Advance the simulation one step and render the deformed field.

    ``substeps``: see interactive_frame_step — requires consts built at
    dt = frame_dt / substeps."""
    # force application (reference solver.update_force / clear_force)
    state_f = sim.update_force(consts, state, jnp.maximum(force_vid, 0), force)
    dof_f = jnp.where(force_vid >= 0, state_f.dof_f,
                      jnp.zeros_like(state.dof_f))
    state = state._replace(dof_f=dof_f)

    for _ in range(substeps):
        state = sim.sim_step(consts, state)
    p_def, F, dF = sim.get_ip_info(consts, state)

    out = deformed.render_rays_deformed(
        params, settings.spec, settings.deformed, bitfield,
        p_def, consts.ip_pos, F, dF,
        rays_o, rays_d, bg_color, cut_bounds,
    )
    return state, out


@functools.partial(jax.jit,
                   static_argnames=("settings", "H", "W", "substeps"))
def interactive_frame_step(
    settings,                     # interactive.InteractiveSettings
    consts: sim.SimConstants,
    state: sim.SimState,
    packed_w: jax.Array,          # field_kernel.pack_weights output
    pose: jax.Array,              # [4, 4]
    intrinsics: Tuple[float, float, float, float],
    H: int,
    W: int,
    bg_color: jax.Array,
    force_vid: jax.Array,         # [] int32; < 0 disables the force
    force: jax.Array,             # [3]
    cut_bounds: Optional[jax.Array] = None,
    substeps: int = 1,
    static_cache: Optional[Dict[str, jax.Array]] = None,
) -> Tuple[sim.SimState, Dict[str, jax.Array]]:
    """One coupled interactive frame through the fused tile kernel — force
    application, sim step, IP pack, bend+field+composite — as a SINGLE jit
    (per-call dispatch through the hosted TPU tunnel costs ~4 ms; round-1's
    four dispatches per frame were ~16 ms of pure overhead).

    Requires settings.bend.max_iter_num == 1 (fast Newton pack); callers
    with deeper Newton use frame_step/render_frame instead.

    ``substeps``: advance the sim ``substeps`` times per rendered frame,
    with consts built at ``dt = frame_dt / substeps`` (config
    `--sim_substeps` does both). Finer time resolution for fast dynamics
    at unchanged frame rate semantics. Measured envelope
    (tools/diverge_probe.py): it does not destabilize stable configs;
    forcing extreme enough to drag the equilibrium far outside the domain
    still overflows f32 regardless of substepping (run those in f64 via
    sim_init(dtype=...) or clamp forces).
    """
    from pienerf_tpu.ops import beam_bend
    from pienerf_tpu.render import interactive

    state_f = sim.update_force(consts, state, jnp.maximum(force_vid, 0), force)
    dof_f = jnp.where(force_vid >= 0, state_f.dof_f,
                      jnp.zeros_like(state.dof_f))
    state = state._replace(dof_f=dof_f)

    for _ in range(substeps):
        state = sim.sim_step(consts, state)
    p_def, F, dF = sim.get_ip_info(consts, state)
    pack = beam_bend.pack_ip_data_fast(
        p_def, consts.ip_pos.astype(jnp.float32), F, dF)
    out = interactive.render_frame_fused(
        settings, packed_w, pack, p_def, pose, intrinsics, H, W,
        bg_color, cut_bounds, static_cache=static_cache)
    return state, out


def make_frame_settings(spec, cfg, sim_dx: float) -> FrameSettings:
    """Assemble static frame settings from the shared config."""
    from pienerf_tpu.ops import bending as bend_ops
    from pienerf_tpu.ops import spatial_hash as sh
    from pienerf_tpu.render.renderer import RenderSettings

    base = RenderSettings(
        bound=cfg.bound, cascade=cfg.cascade, min_near=cfg.min_near,
        dt_gamma=cfg.dt_gamma, max_steps=cfg.max_steps,
        T_thresh=cfg.T_thresh, max_samples=cfg.train_max_samples * 2,
        bg_radius=cfg.bg_radius,
    )
    layout = sh.make_layout(bound=cfg.bound, hgs=cfg.hash_grid_size,
                            max_per_cell=cfg.bend_max_per_cell)
    bend = bend_ops.BendSettings(
        num_seek_ip=cfg.num_seek_IP, max_iter_num=cfg.max_iter_num,
        ip_dx=1.05 * sim_dx, cut=cfg.cut,
    )
    dst = deformed.DeformedSettings(base=base, bend=bend, layout=layout,
                                    max_bend_samples=4 * base.max_samples)
    return FrameSettings(spec=spec, deformed=dst)
