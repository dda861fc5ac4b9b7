"""Unified multi-model training loop.

TPU-native redesign of ``train_combined_models_unified``
(``/root/reference/training.py:459-886``): per-model optax optimizers driven
by the PhysicsLoss gradients, epoch-averaged per-key loss logging, a
validation loop, watched-epoch parameter snapshots over the last
``log_epoch_percentage`` of epochs, and best-epoch selection by
min–max-normalized summed loss (ref :833-866).

The structural difference from the reference is that **one jitted function
performs the entire training step** — residual evaluation, gradients, and
all optimizer updates — and it is data-parallel over a ``jax.sharding.Mesh``
(batch axis sharded across devices; XLA inserts the gradient all-reduces).
The reference re-enters Python per step and applies Keras optimizers
eagerly.
"""

from __future__ import annotations

import logging
import time
from functools import partial
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from srm_tpu.config import DEFAULT_GENERAL_CONFIG, get_optimizer_config
from srm_tpu.data.batching import BatchGenerator
from srm_tpu.parallel.mesh import batch_sharding, make_mesh, replicate, shard_batch
from srm_tpu.training.optimizers import build_optimizer_from_config

log = logging.getLogger(__name__)


class Trainer:
    """Owns the jitted train/eval steps for a PhysicsLoss + model map."""

    def __init__(self, loss_fn, params: Dict[str, Any],
                 optimizer_configs: Optional[Dict[str, Dict]] = None,
                 mesh=None, donate_params: bool = True):
        self.loss_fn = loss_fn
        self.mesh = mesh if mesh is not None else make_mesh()
        self.params = replicate(params, self.mesh)

        # per-optimizer-key optax transforms over the matching model params
        self.optimizer_keys = list(loss_fn.trainable_models_keys)
        self.optimizers: Dict[str, optax.GradientTransformation] = {}
        self.opt_state: Dict[str, Any] = {}
        for key in self.optimizer_keys:
            cfg = (optimizer_configs or {}).get(key) or get_optimizer_config(key)
            self.optimizers[key] = build_optimizer_from_config(cfg)
            logical = loss_fn.logical_name(key)
            self.opt_state[key] = self.optimizers[key].init(self.params[logical])
        self.opt_state = replicate(self.opt_state, self.mesh)

        self._train_step = jax.jit(self._train_step_impl,
                                   donate_argnums=(0, 1) if donate_params else ())
        self._eval_step = jax.jit(self._eval_step_impl)

    # ------------------------------------------------------------------
    def _train_step_impl(self, params, opt_state, x, y):
        aux, grads, total = self.loss_fn.pinn_batch_sse_grad(params, x, y)
        new_params = dict(params)
        new_opt_state = dict(opt_state)
        for key in self.optimizer_keys:
            logical = self.loss_fn.logical_name(key)
            updates, new_opt_state[key] = self.optimizers[key].update(
                grads[key], opt_state[key], params[logical])
            new_params[logical] = optax.apply_updates(params[logical], updates)
        metrics = {ph: {t: aux[ph][t] for t in aux[ph]}
                   for ph in self.loss_fn.loss_keys}
        metrics["total"] = total
        return new_params, new_opt_state, metrics

    def _eval_step_impl(self, params, x, y):
        total, aux = self.loss_fn.loss_and_metrics(params, x, y)
        metrics = {ph: {t: aux[ph][t] for t in aux[ph]}
                   for ph in self.loss_fn.loss_keys}
        metrics["total"] = total
        return metrics

    # ------------------------------------------------------------------
    def train_step(self, x, y):
        x = shard_batch(jnp.asarray(x), self.mesh)
        y = jax.tree_util.tree_map(lambda a: shard_batch(jnp.asarray(a), self.mesh), y)
        self.params, self.opt_state, metrics = self._train_step(
            self.params, self.opt_state, x, y)
        return metrics

    def eval_step(self, x, y):
        x = shard_batch(jnp.asarray(x), self.mesh)
        y = jax.tree_util.tree_map(lambda a: shard_batch(jnp.asarray(a), self.mesh), y)
        return self._eval_step(self.params, x, y)


def train_combined_models_unified(
    train_groups, val_groups, test_groups=None, models=None, params=None,
    loss_fn=None, optimizer_model_names_map=None, training_batch_size=None,
    testing_batch_size=None, epochs: int = 5, callbacks=None,
    verbose: int = 1, general_config=None,
    log_variables_callback: Optional[Callable] = None,
    log_epoch_percentage: float = 0.2, mesh=None, seed: int = 0,
):
    """Full training driver; returns (params, history, best_model_variables).

    History layout matches the reference (ref training.py:567-573):
    per-phase per-key train/val series, epoch_times (ms), total losses.
    """
    g = general_config or DEFAULT_GENERAL_CONFIG
    training_batch_size = training_batch_size or g["training_batch_size"]
    testing_batch_size = testing_batch_size or g["testing_batch_size"]

    train_ds = BatchGenerator(train_groups, batch_size=training_batch_size, seed=seed)
    val_ds = BatchGenerator(val_groups, batch_size=testing_batch_size, seed=seed)

    trainer = Trainer(loss_fn, params, mesh=mesh)
    loss_keys = loss_fn.loss_keys
    term_names = {ph: [k.rsplit("_", 1)[0] for k in keys] for ph, keys in loss_keys.items()}

    history = {
        "train": {ph: {key: [] for key in keys} for ph, keys in loss_keys.items()},
        "val": {ph: {key: [] for key in keys} for ph, keys in loss_keys.items()},
        "epoch_times": [], "total_train_loss": [], "total_val_loss": [],
    }
    model_variables_history: List[Dict] = []
    loss_min_max = {ph: {key: {"min": float("inf"), "max": float("-inf")}
                         for key in keys} for ph, keys in loss_keys.items()}
    log_start_epoch = max(0, int(epochs * (1.0 - log_epoch_percentage)))
    physics = loss_fn.physics_mode_fraction >= 1.0
    t_total = time.time()

    for epoch in range(epochs):
        t0 = time.time()
        sums = {ph: {key: 0.0 for key in loss_keys[ph]} for ph in loss_keys}
        nsteps = len(train_ds)
        for step in range(nsteps):
            x, y = train_ds[step]
            metrics = trainer.train_step(x, y)
            for ph in loss_keys:
                for key, term in zip(loss_keys[ph], term_names[ph]):
                    sums[ph][key] += float(metrics[ph][term])
        train_ds.on_epoch_end()
        if nsteps == 0:
            continue
        avg_train = {ph: {k: v / nsteps for k, v in sums[ph].items()} for ph in sums}
        epoch_ms = (time.time() - t0) * 1000.0
        history["epoch_times"].append(epoch_ms)
        for ph in loss_keys:
            for key in loss_keys[ph]:
                history["train"][ph][key].append(avg_train[ph][key])
        total_train = sum(sum(avg_train[ph].values()) for ph in avg_train)
        history["total_train_loss"].append(total_train)
        if verbose:
            print(f"Epoch {epoch+1}/{epochs} - loss {total_train:.4f} - {epoch_ms:.0f} ms "
                  f"({nsteps / max(epoch_ms / 1000.0, 1e-9):.2f} steps/s)")

        # watched-epoch snapshots (ref :708-718)
        if epoch >= log_start_epoch:
            snap = {key: jax.device_get(trainer.params[loss_fn.logical_name(key)])
                    for key in trainer.optimizer_keys}
            if log_variables_callback is not None:
                log_variables_callback(epoch, snap, total_train)
            for ph in loss_keys:
                for key in loss_keys[ph]:
                    v = avg_train[ph][key]
                    mm = loss_min_max[ph][key]
                    mm["min"] = min(mm["min"], v)
                    mm["max"] = max(mm["max"], v)
            model_variables_history.append(
                {"epoch": epoch + 1, "variables": snap,
                 "losses": {ph: dict(avg_train[ph]) for ph in loss_keys}})

        # validation (loss only; ref :720-804)
        if len(val_ds) > 0:
            vsums = {ph: {key: 0.0 for key in loss_keys[ph]} for ph in loss_keys}
            for step in range(len(val_ds)):
                x, y = val_ds[step]
                metrics = trainer.eval_step(x, y)
                for ph in loss_keys:
                    for key, term in zip(loss_keys[ph], term_names[ph]):
                        vsums[ph][key] += float(metrics[ph][term])
            avg_val = {ph: {k: v / len(val_ds) for k, v in vsums[ph].items()}
                       for ph in vsums}
            for ph in loss_keys:
                for key in loss_keys[ph]:
                    history["val"][ph][key].append(avg_val[ph][key])
            history["total_val_loss"].append(
                0.0 if physics else sum(sum(avg_val[ph].values()) for ph in avg_val))
        for cbk in callbacks or []:
            cbk(epoch)

    # best-epoch selection by min–max-normalized summed losses (ref :833-866)
    best_model_variables = None
    if model_variables_history:
        normalized = []
        for record in model_variables_history:
            tot = 0.0
            for ph in loss_keys:
                for key in loss_keys[ph]:
                    v = record["losses"][ph][key]
                    mm = loss_min_max[ph][key]
                    if mm["max"] > mm["min"]:
                        tot += (v - mm["min"]) / (mm["max"] - mm["min"])
                    else:
                        tot += 0.0 if v == mm["min"] else 1.0
            normalized.append(tot)
        best = int(np.argmin(normalized))
        best_model_variables = model_variables_history[best]["variables"]
        for key, vars_ in best_model_variables.items():
            trainer.params[loss_fn.logical_name(key)] = jax.device_put(vars_)
        log.info("Restored variables from epoch %d (normalized loss %.4f)",
                 model_variables_history[best]["epoch"], normalized[best])

    if verbose:
        print(f"Total training time: {time.time() - t_total:.2f}s")
    return trainer.params, history, best_model_variables
