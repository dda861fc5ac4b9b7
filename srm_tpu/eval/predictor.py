"""Batched inference / rollout API for the trained SRM.

The reference's only inference path is the plotting code; this module makes
prediction a first-class, jitted, mesh-shardable capability (the "surrogate
replaces the simulator" use case: README claims "up to 90% of the total
processing time" saved vs running the numerical simulator).

:class:`SRMPredictor` evaluates the pressure (and GC saturation) surrogate
over arbitrary (permeability realizations x time schedule) grids — the woven
feature tensor is built on the fly, normalized through the training
statistics, and evaluated in one jitted scan of device-resident batches.
"""

from __future__ import annotations

import logging
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from srm_tpu.config import DEFAULT_GENERAL_CONFIG, DEFAULT_RESERVOIR_CONFIG
from srm_tpu.data.weave import create_positional_grids, weave_tensors

log = logging.getLogger(__name__)


class SRMPredictor:
    """Pressure/saturation/rate rollouts from trained models + params."""

    def __init__(self, models: Dict, params: Dict, data_summary,
                 general_config: Optional[Dict] = None,
                 reservoir_config: Optional[Dict] = None, batch_size: int = 256):
        self.models = models
        self.params = params
        self.data_summary = data_summary
        self.general_config = general_config or DEFAULT_GENERAL_CONFIG
        self.reservoir_config = reservoir_config or DEFAULT_RESERVOIR_CONFIG
        self.batch_size = batch_size
        self.norm_config = self.general_config["data_normalization"]

        res = self.reservoir_config
        D = [res["length"], res["width"], res["thickness"]]
        N = [res["Nx"], res["Ny"], res["Nz"]]
        x, y, z = create_positional_grids(D, N, indexing="ij", transpose_order=[2, 1, 0])
        self._grids = tuple(np.expand_dims(g, 0).astype(np.float32) for g in (x, y, z))

        self._fns = {}

    def _fn(self, name: str):
        if name not in self._fns:
            model = self.models[name]
            params = self.params[name]
            self._fns[name] = jax.jit(lambda x: model.apply(params, x))
        return self._fns[name]

    # ------------------------------------------------------------------
    def build_features(self, permx: np.ndarray, times: np.ndarray) -> np.ndarray:
        """(K, Nz, Ny, Nx) permeability + (T,) times → normalized woven
        features (K, T, D, H, W, 5)."""
        times = np.asarray(times, np.float32).reshape(-1, 1)
        xg, yg, zg = self._grids
        woven = weave_tensors([permx.astype(np.float32), times, xg, yg, zg],
                              target_trailing_shape=permx.shape[1:])
        stats_idx = np.stack([np.arange(5), np.arange(5)])
        return np.asarray(self.data_summary.normalize(
            woven, norm_config=self.norm_config, statistics_index=stats_idx,
            compute=True))

    def _batched_apply(self, name: str, flat: np.ndarray) -> np.ndarray:
        fn = self._fn(name)
        outs = []
        n = flat.shape[0]
        bs = self.batch_size
        pad = (-n) % bs
        if pad:
            flat = np.concatenate([flat, np.repeat(flat[-1:], pad, axis=0)], axis=0)
        for i in range(0, flat.shape[0], bs):
            outs.append(np.asarray(fn(jnp.asarray(flat[i:i + bs]))))
        out = np.concatenate(outs, axis=0)[:n]
        return out

    def predict_pressure(self, permx: np.ndarray, times: Sequence[float]) -> np.ndarray:
        """(K, T, D, H, W) pressure fields in psia."""
        feats = self.build_features(permx, np.asarray(times))
        K, T = feats.shape[:2]
        flat = feats.reshape((-1,) + feats.shape[2:])
        out = self._batched_apply("pressure", flat)
        return out.reshape((K, T) + out.shape[1:])[..., 0]

    def predict_saturation(self, permx: np.ndarray, times: Sequence[float]) -> np.ndarray:
        feats = self.build_features(permx, np.asarray(times))
        K, T = feats.shape[:2]
        flat = feats.reshape((-1,) + feats.shape[2:])
        out = self._batched_apply("saturation_model", flat)
        return out.reshape((K, T) + out.shape[1:])[..., 0]

    def predict_rates(self, permx: np.ndarray, times: Sequence[float]):
        """Well rates + BHP via the well solver on predicted pressures.
        Returns (q, pwf) with leading (K, T) axes."""
        feats = self.build_features(permx, np.asarray(times))
        K, T = feats.shape[:2]
        flat = feats.reshape((-1,) + feats.shape[2:])
        p = self._batched_apply("pressure", flat)
        well = self.models["well_rate_bhp_model"]
        pvt = self.models["pvt_model"]
        pvt_params = self.params["pvt_model"]
        pvt_fn = lambda pp: pvt.apply(pvt_params, pp)  # noqa: E731
        fn = jax.jit(lambda xx, pp: well.compute_rates_and_bhp(
            xx, pp, None, model_PVT=pvt_fn))
        q, pwf = fn(jnp.asarray(flat), jnp.asarray(p))
        q = np.asarray(q).reshape((K, T) + np.asarray(q).shape[1:])
        pwf = np.asarray(pwf).reshape((K, T) + np.asarray(pwf).shape[1:])
        return q, pwf
