"""Device mesh and sharding helpers for data- and spatial-parallel training.

The reference is single-device (hard-coded ``tf.device('/GPU:0')``,
SURVEY §2.4); this module is the new first-class TPU capability:

* a 1-D ``Mesh(('data',))`` shards the collapsed (realization × time) batch
  axis across ICI — pure data parallelism, gradient sums become XLA
  all-reduces;
* a 2-D ``Mesh(('data', 'space'))`` additionally shards the H spatial axis
  (axis 2 of the ``(B, D, H, W[, C])`` layout). The stencil's shifted reads
  become XLA SPMD halo exchanges (collective-permutes over ICI) — no
  hand-written collectives; use it when one chip's HBM cannot hold the
  activations of a single sample (very large grids).

All helpers derive their PartitionSpecs from ``mesh.axis_names``, so a
trainer written against them runs unchanged on either mesh shape.
"""

from __future__ import annotations

import logging
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SPATIAL_AXIS = 2   # H in the (B, D, H, W[, C]) sample layout

log = logging.getLogger(__name__)


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data",
              spatial: int = 1) -> Mesh:
    """1-D data mesh, or (n/spatial, spatial) ('data','space') when spatial>1."""
    devices = jax.devices()
    n = n_devices or len(devices)
    if spatial > 1:
        if n % spatial != 0:
            raise ValueError(f"{n} devices not divisible by spatial={spatial}")
        arr = np.array(devices[:n]).reshape(n // spatial, spatial)
        return Mesh(arr, (axis_name, "space"))
    return Mesh(np.array(devices[:n]), (axis_name,))


def _spec_for_rank(mesh: Mesh, rank: int, axis_name: str = "data",
                   batch_axis: int = 0) -> P:
    """Batch axis on 'data'; H (SPATIAL_AXIS after the batch axis offset) on
    'space' when the mesh has one and the array is spatial (rank ≥ 4)."""
    parts: list = [None] * rank
    parts[batch_axis] = axis_name
    spatial_axis = batch_axis + SPATIAL_AXIS
    if "space" in mesh.axis_names and rank - batch_axis >= 4 and spatial_axis < rank:
        parts[spatial_axis] = "space"
    return P(*parts)


def batch_sharding(mesh: Mesh, axis_name: str = "data",
                   rank: Optional[int] = None,
                   batch_axis: int = 0) -> NamedSharding:
    """Shard the batch axis (and H over 'space' on a 2-D mesh)."""
    if rank is None:
        return NamedSharding(mesh, P(*([None] * batch_axis + [axis_name])))
    return NamedSharding(mesh, _spec_for_rank(mesh, rank, axis_name, batch_axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(x, mesh: Mesh, axis_name: str = "data", batch_axis: int = 0):
    """Device-put a pytree of host arrays with the batch axis sharded
    ('data') and, on a 2-D mesh, the H axis sharded ('space').

    Arrays whose sharded dimensions are not divisible by the corresponding
    mesh axis are replicated instead (correct but redundant compute) —
    sharding them would be a hard error in ``device_put``. Keep batch sizes
    a multiple of the data-axis size for full efficiency.
    """
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    rep = replicated(mesh)

    def put(a):
        rank = getattr(a, "ndim", 0)
        if rank <= batch_axis:
            return jax.device_put(a, rep)
        spec = _spec_for_rank(mesh, rank, axis_name, batch_axis)
        ok = all(p is None or a.shape[i] % sizes[p] == 0
                 for i, p in enumerate(spec))
        if not ok:
            log.warning(
                "shard_batch: array shape %s not divisible by mesh axes %s — "
                "REPLICATING (each of the %d devices computes the full batch; "
                "make the batch a multiple of the data-axis size)",
                tuple(a.shape), sizes, mesh.size)
        return jax.device_put(a, NamedSharding(mesh, spec) if ok else rep)

    return jax.tree_util.tree_map(put, x)


def replicate(tree, mesh: Mesh):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), tree)


# --------------------------------------------------------------------------
# Activation sharding constraints (VERDICT r4 item 3)
#
# On a 2-D (data × space) mesh, XLA's automatic sharding propagation through
# the encoder–decoder *backward* pass picks inconsistent layouts for the
# low-resolution interior activations and falls back to "Involuntary full
# rematerialization" (replicate-then-reshard) — correct but wasteful on real
# ICI. Pinning every conv-level activation with with_sharding_constraint
# gives the partitioner one consistent plan: batch on 'data' everywhere, H on
# 'space' only while the shard is at least one pixel per device (halo
# exchanges at full resolution, batch-sharded interior). The constraint is
# its own transpose, so the backward pass is anchored identically.
# --------------------------------------------------------------------------
import contextlib
import contextvars

_ACTIVATION_MESH: contextvars.ContextVar = contextvars.ContextVar(
    "srm_tpu_activation_mesh", default=None)


@contextlib.contextmanager
def activation_mesh_scope(mesh: Optional[Mesh]):
    """Install ``mesh`` for :func:`constrain_spatial` within the scope.

    The trainer wraps its step/epoch implementations (which execute at trace
    time) in this scope; model code built outside a trainer sees ``None``
    and constraints are a no-op. Only meshes with a 'space' axis activate —
    pure data-parallel propagation needs no help.
    """
    token = _ACTIVATION_MESH.set(
        mesh if mesh is not None and "space" in mesh.axis_names else None)
    try:
        yield
    finally:
        _ACTIVATION_MESH.reset(token)


def constrain_spatial(x, h_axis: int):
    """Pin one activation's sharding: batch (axis 0) on 'data', H (``h_axis``)
    on 'space' while the dimension divides the mesh axis. Once H shrinks
    below the 'space' axis (the encoder bottleneck) the spatial dims are left
    UNCONSTRAINED — forcing replication there makes the conv input-gradient
    partitioner (which prefers a padded spatial sharding for its halo
    exchanges) emit involuntary-full-rematerialization reshards on every
    bottleneck cotangent. No-op outside :func:`activation_mesh_scope`."""
    mesh = _ACTIVATION_MESH.get()
    if mesh is None:
        return x
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    parts: list = [None] * x.ndim
    if x.shape[0] % sizes["data"] == 0:
        parts[0] = "data"
    if h_axis < x.ndim and x.shape[h_axis] % sizes["space"] == 0:
        parts[h_axis] = "space"
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*parts)))


def constrain_replicated(tree):
    """Pin a pytree (the model params inside the step/epoch program) to fully
    replicated. Without this, shardy propagates 'space' onto carried conv
    WEIGHTS (kernel-H sharded, transposed device order) from their use next
    to space-sharded activations, and every backward layout derived from them
    needs involuntary-full-remat reshards. No-op outside
    :func:`activation_mesh_scope`."""
    mesh = _ACTIVATION_MESH.get()
    if mesh is None:
        return tree
    sh = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda a: jax.lax.with_sharding_constraint(a, sh), tree)


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
