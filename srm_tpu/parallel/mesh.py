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
    """Device-put a pytree of host arrays with the batch axis sharded.

    Arrays whose leading dimension is not divisible by the mesh size are
    replicated instead (correct but redundant compute) — sharding them would
    be a hard error in ``device_put``. Keep batch sizes a multiple of the
    device count for full data-parallel efficiency.
    """
    n = int(np.prod(mesh.devices.shape))
    sh = batch_sharding(mesh, axis_name)
    rep = replicated(mesh)

    def put(a):
        divisible = getattr(a, "ndim", 0) > 0 and a.shape[0] % n == 0
        return jax.device_put(a, sh if divisible else rep)

    return jax.tree_util.tree_map(put, x)


def replicate(tree, mesh: Mesh):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), tree)


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
