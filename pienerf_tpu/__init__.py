"""pienerf_tpu — a TPU-native rebuild of PIE-NeRF (CVPR 2024).

Physics-based Interactive Elastodynamics with NeRF, re-designed from scratch
for TPU hardware on JAX/XLA/Pallas:

- Instant-NGP-style radiance field (multiresolution hash grid + spherical
  harmonics + small MLPs + occupancy-bitfield ray marching) — implemented
  with static shapes, masked/compacted marching and MXU-friendly batched
  MLP evaluation instead of CUDA atomics and alive-ray compaction.
- Q-GMLS meshless hyperelasticity simulator (quadratic generalized moving
  least squares) — implemented as pure jitted functions over pytree state
  with segment-sum assembly instead of atomic scatter.
- Quadratic ray bending — deformed-space rendering that maps each sample
  back to rest space by Newton-inverting a per-integration-point quadratic
  Taylor expansion of the deformation map, fully vectorized.

Reference capability map: FYTalon/pienerf (see SURVEY.md at repo root).
"""

__version__ = "0.1.0"

from pienerf_tpu.config import PieNeRFConfig  # noqa: F401
