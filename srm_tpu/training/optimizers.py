"""Per-role optax optimizers matching the reference's Keras optimizers.

Re-implements ``build_optimizer_from_config``
(``/root/reference/training.py:282-364``): adam / adamw (and adabelief via
optax) with exponential decay schedules on the learning rate and — for
AdamW — on the weight-decay coefficient. The decayed weight decay is
expressed with ``optax.add_decayed_weights`` driven by a schedule-scaled
mask-free transform, matching Keras AdamW semantics (decoupled decay applied
with the learning rate).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import optax


def _exp_schedule(initial: float, decay_steps: int, decay_rate: float,
                  staircase: bool) -> optax.Schedule:
    return optax.exponential_decay(init_value=initial, transition_steps=decay_steps,
                                   decay_rate=decay_rate, staircase=staircase)


def build_optimizer_from_config(config: Dict[str, Any]) -> optax.GradientTransformation:
    opt_type = config["type"].lower()
    lr = config.get("learning_rate", 1e-3)
    wd = config.get("weight_decay", 0.0)
    b1 = config.get("beta_1", 0.9)
    b2 = config.get("beta_2", 0.999)
    eps = config.get("epsilon", 1e-7)   # Keras default epsilon

    decay = config.get("exponential_decay", {}) or {}
    enabled = decay.get("enabled", False)
    staircase = decay.get("staircase", False)
    lr_cfg = decay.get("learning_rate", {}) or {}
    wd_cfg = decay.get("weight_decay", {}) or {}
    steps = lr_cfg.get("decay_steps", 100)

    lr_sched: Any = lr
    if enabled and lr_cfg.get("enabled", False):
        lr_sched = _exp_schedule(lr, steps, lr_cfg.get("decay_rate", 0.96), staircase)

    if opt_type == "adam":
        return optax.adam(learning_rate=lr_sched, b1=b1, b2=b2, eps=eps)

    if opt_type in ("adamw", "adabelief"):
        wd_sched = wd
        if opt_type == "adamw" and enabled and wd_cfg.get("enabled", False):
            # decayed weight-decay coefficient (Keras AdamW semantics: the
            # decoupled decay term itself decays exponentially over steps)
            ratio = _exp_schedule(1.0, steps, wd_cfg.get("decay_rate", 0.98), staircase)
            return optax.chain(
                optax.scale_by_adam(b1=b1, b2=b2, eps=eps),
                _scaled_decayed_weights(wd, ratio),
                optax.scale_by_learning_rate(lr_sched),
            )
        if opt_type == "adabelief":
            return optax.chain(optax.scale_by_belief(b1=b1, b2=b2, eps=eps),
                               optax.add_decayed_weights(wd_sched),
                               optax.scale_by_learning_rate(lr_sched))
        return optax.adamw(learning_rate=lr_sched, b1=b1, b2=b2, eps=eps,
                           weight_decay=wd_sched)

    raise ValueError(f"Unsupported optimizer type: {config['type']}")


def _scaled_decayed_weights(wd: float, ratio_schedule) -> optax.GradientTransformation:
    """add_decayed_weights with a schedule-scaled coefficient."""
    import jax
    import jax.numpy as jnp

    def init_fn(params):
        del params
        return optax.ScaleByScheduleState(count=jnp.zeros([], jnp.int32))

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("params required for decayed weights")
        coeff = wd * ratio_schedule(state.count)
        updates = jax.tree_util.tree_map(lambda u, p: u + coeff * p, updates, params)
        return updates, optax.ScaleByScheduleState(count=state.count + 1)

    return optax.GradientTransformation(init_fn, update_fn)
