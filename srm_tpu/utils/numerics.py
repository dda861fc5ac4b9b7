"""Small numeric helpers carried over from the reference's utility surface.

* :func:`finite_difference_derivative` — FD derivative of an arbitrary
  callable with NaN/Inf scrubbing (ref ``auxiliary_functions.py:80-109``).
  The rebuild's PVT layer differentiates analytically (Horner derivative /
  one ``jax.jvp``), so nothing in the hot path needs this — it exists for
  API parity and for validating analytic derivatives in tests.
* :func:`l1_normalize_excluding_index` — L1-normalize along one axis while
  holding one index fixed (ref
  ``data_processing/data_processing_utils.py:1209-1241``).
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

Array = jnp.ndarray


def finite_difference_derivative(x: Array, func: Callable[[Array], Array],
                                 diff_type: str = "central_difference",
                                 grid_spacing: float = 0.01) -> Array:
    """Finite-difference derivative of ``func`` at ``x``.

    ``func`` may return a single array or a sequence of arrays (the
    reference stacks multi-output PVT property tuples on a new leading
    axis); non-finite entries are replaced with zeros, matching the
    reference's scrubbing (ref auxiliary_functions.py:103-108).
    """
    def _stack(out):
        if isinstance(out, (tuple, list)):
            return jnp.stack([jnp.asarray(o) for o in out], axis=0)
        return jnp.asarray(out)

    if diff_type == "central_difference":
        d = (_stack(func(x + grid_spacing)) - _stack(func(x - grid_spacing))) \
            / (2.0 * grid_spacing)
    else:  # forward difference
        d = (_stack(func(x + grid_spacing)) - _stack(func(x))) / grid_spacing
    return jnp.where(jnp.isfinite(d), d, jnp.zeros_like(d))


def l1_normalize_excluding_index(tensor: Array, axis: int,
                                 exclude_index: int) -> Array:
    """L1-normalize ``tensor`` along ``axis``, excluding one index.

    The slice at ``exclude_index`` keeps its original values and does not
    contribute to the L1 norm; every other slice is divided by the L1 norm
    of the non-excluded values (zero norm → zeros, the reference's
    ``divide_no_nan``). Ref data_processing_utils.py:1209-1241.
    """
    tensor = jnp.asarray(tensor)
    axis = axis % tensor.ndim
    n = tensor.shape[axis]
    shape = [1] * tensor.ndim
    shape[axis] = n
    mask = (jnp.arange(n) != exclude_index).reshape(shape)
    masked = jnp.where(mask, tensor, 0.0)
    norms = jnp.sum(jnp.abs(masked), axis=axis, keepdims=True)
    normalized = jnp.where(norms > 0, masked / jnp.where(norms > 0, norms, 1.0), 0.0)
    return jnp.where(mask, normalized, tensor)
