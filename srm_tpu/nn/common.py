"""Shared NN utilities: activations, initializers, temporal folding."""

from __future__ import annotations

from typing import Callable, Optional, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def get_activation(act: Union[None, str, Callable]) -> Callable[[Array], Array]:
    if act is None or act == "":
        return lambda x: x
    if callable(act):
        return act
    name = act.lower()
    table = {
        "swish": nn.swish, "silu": nn.swish, "relu": nn.relu, "gelu": nn.gelu,
        "tanh": jnp.tanh, "sigmoid": nn.sigmoid, "linear": (lambda x: x),
        "softplus": nn.softplus, "elu": nn.elu, "leaky_relu": nn.leaky_relu,
        # non-saturating rectifier for HardLayer departure heads: the
        # zero-departure attractor sits at x=0 where |grad|=1, unlike
        # softplus whose attractor is x→-inf where the gradient vanishes
        # and the head dies permanently (measured: tools/sg_head_probe.py)
        "abs": jnp.abs,
    }
    if name not in table:
        raise ValueError(f"Unknown activation: {act}")
    return table[name]


def get_initializer(name: Union[None, str, Callable]):
    if callable(name):
        return name
    table = {
        "glorot_normal": nn.initializers.glorot_normal(),
        "glorot_uniform": nn.initializers.glorot_uniform(),
        "he_normal": nn.initializers.he_normal(),
        "he_uniform": nn.initializers.he_uniform(),
        None: nn.initializers.glorot_uniform(),
    }
    return table.get(name, nn.initializers.glorot_normal())


def scaled_tanh_lisht(x: Array, min_val: float = 0.1, max_val: float = 10.0,
                      steepness: float = 1.0) -> Array:
    """x·tanh(x) ("lisht") squashed into (min_val, max_val] — the reference's
    adaptive-time-step output activation
    (training_case_dry_gas_i.py:159-165)."""
    lisht = x * jnp.tanh(x)
    return (max_val - min_val) * jnp.tanh(steepness * lisht) + min_val


def fold_time(x: Array, temporal: bool):
    """Fold a leading temporal axis into batch: (B, T, *S, C) → (B*T, *S, C).

    TimeDistributed weight sharing in the reference
    (EncoderDecoderSubclassed.py:114-117) is just batch folding under XLA —
    the convolution weights are shared across T by construction.
    Returns (folded, unfold) where unfold restores the time axis.
    """
    if not temporal:
        return x, (lambda y: y)
    B, T = x.shape[0], x.shape[1]
    folded = x.reshape((B * T,) + x.shape[2:])

    def unfold(y: Array) -> Array:
        return y.reshape((B, T) + y.shape[1:])

    return folded, unfold


def network_width_list(depth: int, width: int, ngens: int, growth_rate: float = 0.5,
                       network_type: str = "plain") -> list[int]:
    """Per-layer filter counts (ref EncoderDecoderSubclassed.py:38-71):
    geometric growth, rounded up to even."""
    def create_even(num):
        return int(np.ceil(num / 2.0) * 2)

    if ngens == 0:
        ngens = 1
    per_gen = depth // ngens
    rem = depth % ngens
    out: list[float] = []
    for i in range(ngens):
        if network_type == "plain":
            gen = [growth_rate**i] * (per_gen + (rem if i == ngens - 1 else 0))
        else:
            gen = [growth_rate**i] + [0] * (per_gen - 1 + (rem if i == ngens - 1 else 0))
        out += gen
    return [create_even(width * x) for x in out]


def safe_pow(x: Array, e: Array) -> Array:
    """x**e with zero (not NaN) gradient w.r.t. ``e`` where x <= 0.

    Matches TF's guarded pow gradient (the reference relies on it for the
    HardLayer's alpha_t**kernel_exponent at t = t0 where alpha_t == 0)."""
    log_x = jnp.where(x > 0, jnp.log(jnp.maximum(x, 1e-30)), 0.0)
    return jnp.where(x > 0, jnp.exp(e * log_x), jnp.zeros_like(x * e))
