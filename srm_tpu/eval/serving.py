"""Ahead-of-time surrogate export for production serving (``jax.export``).

The reference has no deployment story: running a trained surrogate requires
its full Python training stack (Keras model classes + config modules +
normalization code; ref ``srm_training_examples/training_case_dry_gas_i.py``
rebuilds everything just to predict). Here the trained field surrogate is
lowered to a **serialized StableHLO artifact** that any process can load and
execute with nothing but ``jax`` installed — no Flax model classes, no
config dicts, no stats tables:

* the whole serving pipeline is baked into one traced function:
  raw inputs ``(permx [b, ...grid], time_days [b])`` → positional-grid
  weave → channelwise normalization (stats rows embedded as constants) →
  network forward → **denormalized physical field** (psia / saturation);
* the batch dimension is exported *symbolically* (``jax.export``
  shape polymorphism), so one artifact serves any batch size;
* artifacts are lowered for both CPU and TPU by default
  (``platforms=("cpu", "tpu")``) — the same file serves on either.

Round-trip is covered by ``tests/test_serving.py``: export → deserialize →
bit-compare against :class:`srm_tpu.eval.predictor.SRMPredictor` on the live
models.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from srm_tpu.utils import stats as stats_mod

_MANIFEST = "manifest.json"

# predictor feature channel order (weave flip): [z, y, x, time, permx];
# DataSummary rows 0..4 hold the matching stats (see SRMPredictor.build_features)
_CHANNELS = ("z", "y", "x", "time", "permx")


def _field_model_name(field: str) -> str:
    return {"pressure": "pressure", "saturation": "saturation_model"}[field]


def _make_serving_fn(predictor, field: str):
    """Close over grids + stats + params: (permx_raw, t_days) → physical field.

    ``permx_raw`` is ``(b, *grid)`` in mD (same trailing shape the predictor's
    ``build_features`` consumes), ``t_days`` is ``(b,)``.
    """
    summary = predictor.data_summary
    norm_config = predictor.norm_config
    method = stats_mod._method(norm_config)
    limits = stats_mod._norm_limits(norm_config)
    rows = [np.asarray(summary.table_np[i], np.float32) for i in range(5)]
    is_log = [bool(summary.is_log_np[i]) for i in range(5)]

    # positional grids, squeezed of the predictor's leading broadcast axis
    xg, yg, zg = (np.squeeze(g, axis=0).astype(np.float32)
                  for g in predictor._grids)

    model = predictor.models[_field_model_name(field)]
    params = predictor.params[_field_model_name(field)]

    def fn(permx: jax.Array, t_days: jax.Array) -> jax.Array:
        vol = permx.shape[1:]
        b = permx.shape[0]
        tcol = t_days.reshape((b,) + (1,) * len(vol))
        chans = [
            jnp.broadcast_to(jnp.asarray(zg).reshape((1,) + vol), (b,) + vol),
            jnp.broadcast_to(jnp.asarray(yg).reshape((1,) + vol), (b,) + vol),
            jnp.broadcast_to(jnp.asarray(xg).reshape((1,) + vol), (b,) + vol),
            jnp.broadcast_to(tcol, (b,) + vol),
            permx,
        ]
        normed = [
            stats_mod.normalize(c, jnp.asarray(r), method=method,
                                limits=limits, is_log=il)
            for c, r, il in zip(chans, rows, is_log)
        ]
        feats = jnp.stack(normed, axis=-1)
        out = model.apply(params, feats)
        return out[..., 0]

    return fn


def export_surrogate(predictor, out_dir: str,
                     fields: Sequence[str] = ("pressure",),
                     platforms: Tuple[str, ...] = ("cpu", "tpu")) -> Dict[str, str]:
    """Serialize serving artifacts for ``fields`` into ``out_dir``.

    Returns ``{field: artifact_path}``. The batch dimension is symbolic; the
    grid shape is fixed to the training reservoir. A ``manifest.json``
    records shapes/dtypes and the physical meaning of each artifact.
    """
    os.makedirs(out_dir, exist_ok=True)
    res = predictor.reservoir_config
    nz, ny, nx = int(res["Nz"]), int(res["Ny"]), int(res["Nx"])
    # the networks keep the depth axis even when Nz == 1 (input (b, D, H, W, C))
    vol = (nz, ny, nx)

    paths: Dict[str, str] = {}
    manifest = {
        "grid": list(vol),
        "channels": list(_CHANNELS),
        "platforms": list(platforms),
        "inputs": {"permx": ["b", *vol], "time_days": ["b"]},
        "fields": {},
    }
    for field in fields:
        fn = _make_serving_fn(predictor, field)
        b = jax.export.symbolic_shape("b")[0]
        specs = (
            jax.ShapeDtypeStruct((b,) + vol, jnp.float32),
            jax.ShapeDtypeStruct((b,), jnp.float32),
        )
        exp = jax.export.export(jax.jit(fn), platforms=list(platforms))(*specs)
        path = os.path.join(out_dir, f"{field}.stablehlo")
        with open(path, "wb") as f:
            f.write(exp.serialize())
        paths[field] = path
        manifest["fields"][field] = {
            "artifact": os.path.basename(path),
            "unit": "psia" if field == "pressure" else "fraction",
            "output": ["b", *vol],
        }
    with open(os.path.join(out_dir, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=2)
    return paths


class ServingSurrogate:
    """A loaded serving bundle: callables with no model/config dependencies."""

    def __init__(self, out_dir: str):
        with open(os.path.join(out_dir, _MANIFEST)) as f:
            self.manifest = json.load(f)
        self._fns = {}
        for field, info in self.manifest["fields"].items():
            with open(os.path.join(out_dir, info["artifact"]), "rb") as f:
                self._fns[field] = jax.export.deserialize(f.read())

    @property
    def fields(self):
        return sorted(self._fns)

    def __call__(self, field: str, permx: np.ndarray,
                 time_days: np.ndarray) -> np.ndarray:
        """Evaluate ``field`` on raw ``(b, *grid)`` permeability (mD) at
        per-sample times (days); returns the physical field ``(b, *grid)``."""
        permx = jnp.asarray(permx, jnp.float32)
        time_days = jnp.asarray(time_days, jnp.float32)
        return np.asarray(self._fns[field].call(permx, time_days))


def load_surrogate(out_dir: str) -> ServingSurrogate:
    return ServingSurrogate(out_dir)
