"""HardLayer: exact initial-condition enforcement.

TPU-native redesign of the reference ``HardLayer``
(``/root/reference/Hard_Layer_Subclassed.py:22-266``):

    alpha_t = (t_norm - a) / (b - a)          # normalized-time ramp in [0,1]
    alpha   = alpha_p * alpha_t ** clip(kernel_exponent, min, max)
    output  = init_value - alpha * act(p_net)    (ref :216-243; the
              (1-alpha)*Pi variant at :241 is commented out upstream)

so p(t=t0) == Pi exactly (alpha_t == 0 at the normalized start time).

``kernel_exponent`` is a trainable **per-pixel** field of shape
``(*input_spatial, 1)`` (ref :135-146). The reference constrains it with
Keras MinMaxNorm applied post-update; here the constraint is enforced in the
forward pass via clip (projection under jit), which keeps the train step a
single pure function.

The optional rectifier path for gas condensate above dew point
(ref :222-225) and the RBF property modulation (UnitNorm Dense, :231-235)
are both supported.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from srm_tpu.nn.common import get_activation, get_initializer, safe_pow

Array = jnp.ndarray


class HardLayer(nn.Module):
    norm_limits: Tuple[float, float] = (-1.0, 1.0)
    init_value: float = 1.0
    exponent_init: float = 0.5
    exponent_min: float = 0.1
    exponent_max: float = 0.99
    exponent_trainable: bool = True
    use_rbf: bool = False
    rbf_activation: Any = "sigmoid"
    kernel_activation: Any = None
    input_activation: Any = None
    rectifier: Optional[Callable[[Array], Array]] = None
    pdew: Optional[float] = None
    pmin: Optional[float] = None
    regularization: float = 0.0

    @classmethod
    def from_config(cls, config: Dict[str, Any], fluid_type: str = "DG",
                    pdew: Optional[float] = None, pmin: Optional[float] = None) -> "HardLayer":
        ke = config.get("kernel_exponent_config", {}) or {}
        init_v = ke.get("initial_value", 0.5)
        if isinstance(init_v, (tuple, list)):  # the reference example has a
            init_v = init_v[0]                 # trailing-comma tuple here
        return cls(
            norm_limits=tuple(config.get("norm_limits", (-1.0, 1.0))),
            init_value=config.get("init_value", 1.0),
            exponent_init=float(init_v),
            exponent_min=ke.get("min_value", 0.01),
            exponent_max=ke.get("max_value", 0.99),
            exponent_trainable=ke.get("trainable", True),
            use_rbf=config.get("use_rbf", False),
            kernel_activation=config.get("kernel_activation"),
            input_activation=config.get("input_activation"),
            rectifier=config.get("rectifier"),
            pdew=pdew, pmin=pmin,
            regularization=config.get("regularization", 0.0),
        )

    @nn.compact
    def __call__(self, time: Array, prop: Array, p_net: Array,
                 rect_input: Optional[Array] = None) -> Array:
        a, b = self.norm_limits
        # per-pixel trainable exponent over the non-batch, non-channel dims
        exp_shape = tuple(p_net.shape[1:-1]) + (1,)
        kexp = self.param("kernel_exponent",
                          lambda rng: jnp.full(exp_shape, self.exponent_init, jnp.float32))
        if not self.exponent_trainable:
            kexp = jnp.asarray(kexp)  # still a param; grads are zeroed by the optimizer map
        kexp = jnp.clip(kexp, self.exponent_min, self.exponent_max)
        kexp = get_activation(self.kernel_activation)(kexp)

        alpha_t = (time - a) / (b - a)

        if self.rectifier is not None and rect_input is not None:
            alpha_p = self.rectifier((rect_input - self.pdew) / (self.pmin - self.pdew))
        else:
            alpha_p = 1.0

        alpha = alpha_p * safe_pow(alpha_t, kexp)

        if self.use_rbf:
            # UnitNorm-constrained Dense on the property channel (ref :170-176)
            w = self.param("rbf_kernel",
                           get_initializer("glorot_normal"), (prop.shape[-1], 1))
            w = w / (jnp.linalg.norm(w, axis=0, keepdims=True) + 1e-12)
            factor = get_activation(self.rbf_activation)(prop @ w)
            alpha = alpha * factor

        p_act = get_activation(self.input_activation)(p_net)
        return self.init_value - alpha * p_act
