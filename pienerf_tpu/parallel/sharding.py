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
