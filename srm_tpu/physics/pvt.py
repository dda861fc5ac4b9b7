"""PVT fluid-property evaluation (values + pressure derivatives).

TPU-native redesign of the reference ``PVTLayer``
(``/root/reference/PVT_Layer_Subclassed.py:23-286``) and the polyharmonic
spline interpolant (``/root/reference/polyhm_splines.py:8-196``):

* **Polynomial backend** — trainable coefficients per property, Horner
  evaluation with the analytic derivative (ref PVT_Layer_Subclassed.py
  :218-266).
* **Polyharmonic-spline backend** — 1D RBF interpolant
  ``f(x) = Σ w_i φ(|x-c_i|²) + v1·x + v0``. The reference re-solves the
  (n+d+1) linear system **inside every call** (polyhm_splines.py:179-186);
  here the system is solved **once at construction** in float64 on the host
  — identical math, and the per-call cost collapses to one dense
  ``(m, n)`` matmul that XLA maps onto the MXU. Derivatives come from
  ``jax.jvp`` through the evaluation (the reference uses a nested
  GradientTape per property; one jvp gives all properties' derivatives in a
  single pass).

Note the reference's φ takes the **squared** distance (its
``_cross_squared_distance_matrix`` output feeds ``_phi`` directly), so for
order 2, φ(s)=0.5·s·log(s) with s=d² — reproduced here exactly.

Output contract matches the reference: ``[2, n_props, *p.shape]`` with axis
0 = (value, d/dP).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray

EPSILON = 1e-10

DG_PROPERTIES: Tuple[str, ...] = ("invBg", "invug")
GC_PROPERTIES: Tuple[str, ...] = ("invBg", "invBo", "invug", "invuo", "Rs", "Rv", "Vro")


def properties_for(fluid_type: str) -> Tuple[str, ...]:
    ft = fluid_type.upper()
    if ft == "DG":
        return DG_PROPERTIES
    if ft == "GC":
        return GC_PROPERTIES
    raise ValueError(f"Unknown fluid type: {fluid_type}. Use 'DG' or 'GC'.")


# --------------------------------------------------------------------------
# Polyharmonic spline: solve once, evaluate as a matmul
# --------------------------------------------------------------------------
def _phi_np(s: np.ndarray, order: int) -> np.ndarray:
    s = np.maximum(s, EPSILON)
    if order == 1:
        return np.sqrt(s)
    if order == 2:
        return 0.5 * s * np.log(s)
    if order == 4:
        return 0.5 * np.square(s) * np.log(s)
    if order % 2 == 0:
        return 0.5 * np.power(s, 0.5 * order) * np.log(s)
    return np.power(s, 0.5 * order)


def _phi_jnp(s: Array, order: int) -> Array:
    s = jnp.maximum(s, EPSILON)
    if order == 1:
        return jnp.sqrt(s)
    if order == 2:
        return 0.5 * s * jnp.log(s)
    if order == 4:
        return 0.5 * jnp.square(s) * jnp.log(s)
    if order % 2 == 0:
        return 0.5 * jnp.power(s, 0.5 * order) * jnp.log(s)
    return jnp.power(s, 0.5 * order)


def solve_spline_weights(train_points: np.ndarray, train_values: np.ndarray,
                         order: int = 2, regularization_weight: float = 0.0):
    """Solve the polyharmonic interpolation system once (float64 host solve).

    Same linear system as polyhm_splines.py:103-135:
        [A + λI   B] [w]   [f]
        [B^T      0] [v] = [0],  B = [c, 1]
    Returns (w [n], v [2]) as float32.
    """
    c = np.asarray(train_points, np.float64).reshape(-1, 1)   # [n,1]
    f = np.asarray(train_values, np.float64).reshape(-1, 1)   # [n,1]
    n = c.shape[0]
    s = (c - c.T) ** 2
    A = _phi_np(s, order)
    if regularization_weight > 0:
        A = A + regularization_weight * np.eye(n)
    B = np.concatenate([c, np.ones((n, 1))], axis=1)          # [n,2]
    lhs = np.block([[A, B], [B.T, np.zeros((2, 2))]])
    rhs = np.concatenate([f, np.zeros((2, 1))], axis=0)
    sol = np.linalg.solve(lhs, rhs)
    w = sol[:n, 0].astype(np.float32)
    v = sol[n:, 0].astype(np.float32)
    return w, v


def spline_eval(x: Array, knots: Array, w: Array, v: Array, order: int) -> Array:
    """Evaluate the interpolant at arbitrary-shape query ``x``.

    Flattens to [m] points, one (m, n) φ-matrix matmul against w, plus the
    affine term — a single MXU-friendly contraction.
    """
    shape = x.shape
    q = x.reshape(-1)                               # [m]
    s = (q[:, None] - knots[None, :]) ** 2          # [m, n]
    # precision='highest': the RBF sum is a large-magnitude cancellation over
    # pressure-scale φ values; bf16 MXU passes lose ~5% here while the full-
    # f32 pass is exact to ~1e-6 (n is tiny, so the cost is negligible).
    rbf = jnp.matmul(_phi_jnp(s, order)[None], w[:, None],
                     precision="highest")[0, :, 0]  # [m]
    out = rbf + v[0] * q + v[1]
    return out.reshape(shape)


# --------------------------------------------------------------------------
# PVT layer
# --------------------------------------------------------------------------
class PVTLayer(nn.Module):
    """Fluid properties and d/dP derivatives from a pressure field.

    Attributes mirror the reference ctor (PVT_Layer_Subclassed.py:31-99).
    ``spline_knots``/``spline_values`` are static numpy arrays captured at
    construction (use :func:`make_pvt_layer` to build from configs).
    """

    fluid_type: str = "DG"
    fitting_method: str = "polynomial"                      # 'polynomial' | 'spline'
    polynomial_config: Optional[dict] = None
    spline_order: int = 2
    regularization_weight: float = 0.0
    min_input_threshold: float = 14.7
    max_input_threshold: float = 10000.0
    spline_knots: Optional[tuple] = None                    # tuple for hashability
    spline_values: Optional[tuple] = None                   # tuple of per-prop tuples

    @property
    def properties(self) -> Tuple[str, ...]:
        return properties_for(self.fluid_type)

    def setup(self):
        if self.fitting_method == "polynomial":
            if self.polynomial_config is None:
                raise ValueError("polynomial_config required for polynomial fitting")
            coeffs = {}
            for prop in self.properties:
                if prop not in self.polynomial_config:
                    raise ValueError(f"Polynomial coefficients missing for property: {prop}")
                init = np.asarray(self.polynomial_config[prop], np.float32)
                coeffs[prop] = self.param(f"{prop}_coefficients",
                                          lambda rng, v=init: jnp.asarray(v))
            self._coeffs = coeffs
        elif self.fitting_method == "spline":
            if self.spline_knots is None or self.spline_values is None:
                raise ValueError("spline knots/values required for spline fitting")
            knots = np.asarray(self.spline_knots, np.float32)
            ws, vs = [], []
            for prop, vals in zip(self.properties, self.spline_values):
                w, v = solve_spline_weights(knots, np.asarray(vals, np.float32),
                                            self.spline_order, self.regularization_weight)
                ws.append(w)
                vs.append(v)
            self._knots = jnp.asarray(knots)
            self._w = jnp.asarray(np.stack(ws))   # [P, n]
            self._v = jnp.asarray(np.stack(vs))   # [P, 2]
        else:
            raise ValueError(f"Unknown fitting method: {self.fitting_method}")

    def _eval_values(self, p: Array) -> Array:
        """[P, *p.shape] property values at clamped pressure."""
        if self.fitting_method == "polynomial":
            vals = []
            for prop in self.properties:
                c = self._coeffs[prop]
                acc = jnp.zeros_like(p)
                for i in range(c.shape[0] - 1, -1, -1):  # Horner
                    acc = acc * p + c[i]
                vals.append(acc)
            return jnp.stack(vals, axis=0)
        # spline: evaluate all properties with one φ-matrix
        shape = p.shape
        q = p.reshape(-1)
        s = (q[:, None] - self._knots[None, :]) ** 2
        phi = _phi_jnp(s, self.spline_order)              # [m, n]
        # full-precision contraction: see spline_eval for why bf16 is not
        # acceptable on this badly-scaled RBF system
        rbf = jnp.matmul(phi, self._w.T, precision="highest")  # [m, P]
        out = rbf + q[:, None] * self._v[:, 0][None, :] + self._v[:, 1][None, :]
        return jnp.moveaxis(out.reshape(shape + (len(self.properties),)), -1, 0)

    def __call__(self, p: Array) -> Array:
        """→ [2, P, *p.shape]: values and d/dP via one jvp through the clamp
        (derivative is zero outside the clamp band, matching AD through
        tf.maximum/minimum in the reference)."""
        def f(x):
            xs = jnp.clip(x, self.min_input_threshold, self.max_input_threshold)
            return self._eval_values(xs)

        values, derivs = jax.jvp(f, (p,), (jnp.ones_like(p),))
        return jnp.stack([values, derivs], axis=0)


def make_pvt_layer(config: dict) -> PVTLayer:
    """Build a PVTLayer from a PVT config dict (DEFAULT_PVT_DG/GC_CONFIG,
    possibly with fitting_method='spline' and a spline_config DataSummary)."""
    fluid_type = config.get("fluid_type", "DG")
    fitting = config.get("fitting_method", "polynomial").lower()
    props = properties_for(fluid_type)
    spline_knots = spline_values = None
    if fitting == "spline":
        src = config.get("spline_config")
        if src is None:
            from srm_tpu.data.pvt_table import load_pvt_table_summary
            src = load_pvt_table_summary()
        knots = np.asarray(src.lookup("pre"), np.float32)
        spline_knots = tuple(float(v) for v in knots)
        spline_values = tuple(tuple(float(v) for v in np.asarray(src.lookup(prop), np.float32))
                              for prop in props)
    return PVTLayer(
        fluid_type=fluid_type,
        fitting_method=fitting,
        polynomial_config=config.get("polynomial_config"),
        spline_order=config.get("spline_order", 2),
        regularization_weight=config.get("regularization_weight", 0.0),
        min_input_threshold=config.get("min_input_threshold", 14.7),
        max_input_threshold=config.get("max_input_threshold", 10000.0),
        spline_knots=spline_knots,
        spline_values=spline_values,
    )
