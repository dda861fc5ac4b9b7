"""Device mesh and sharding helpers for data-parallel SRM training.

The reference is single-device (hard-coded ``tf.device('/GPU:0')``,
SURVEY §2.4); this module is the new first-class TPU capability: a 1-D
``jax.sharding.Mesh`` over the 'data' axis, NamedShardings that shard the
collapsed (realization x time) batch axis across ICI, and replication specs
for parameters. Under ``jit`` the gradient sums become XLA all-reduces over
the mesh — no hand-written collectives needed for pure data parallelism.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.array(devices[:n]), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis; everything else replicated."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(x, mesh: Mesh, axis_name: str = "data"):
    """Device-put a pytree of host arrays with the batch axis sharded."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), x)


def replicate(tree, mesh: Mesh):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), tree)


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
