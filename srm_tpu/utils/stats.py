"""Training-statistics table and normalization transforms.

TPU-native redesign of the reference's ``DataSummary``
(``/root/reference/data_processing/data_processing_utils.py:804-1207``) and
the functional normalize/nonormalize/normalize_diff helpers
(``/root/reference/auxiliary_functions.py:116-284``).

The statistics table is a dense ``[R, 5]`` array with columns
``[min, max, mean, std, count]`` and named rows (e.g. for the woven feature
tensor the rows are ``z, y, x, time, permx``). Three normalization schemes
are supported:

* ``linear-scaling``      — min/max scaling into ``[a, b]``
* ``lnk-linear-scaling``  — like linear-scaling but rows flagged as
  *log rows* (permeability) are scaled in log space
  (ref data_processing_utils.py:1045-1051 where rows 4/5 get the log branch;
  here log rows are derived from row *names* containing ``perm`` so the
  behavior is layout-independent)
* ``z-score``             — ``(x - mean) / std``

All transforms are pure jittable functions of ``(x, table_row, is_log)`` so
they can live inside the fully-compiled physics loss; NaN/Inf scrubbing
matches the reference (replaced with zeros).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Mapping, Optional, Sequence, Union

import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray

#: column indices into a statistics row
MIN, MAX, MEAN, STD, COUNT = 0, 1, 2, 3, 4


def _norm_limits(norm_config: Optional[Mapping[str, Any]]) -> tuple[float, float]:
    if norm_config is None:
        return (-1.0, 1.0)
    lim = norm_config.get("normalization_limits") or norm_config.get("Norm_Limits") or (-1.0, 1.0)
    return float(lim[0]), float(lim[1])


def _method(norm_config: Optional[Mapping[str, Any]]) -> str:
    if norm_config is None:
        return "lnk-linear-scaling"
    return (norm_config.get("feature_normalization_method")
            or norm_config.get("Input_Normalization")
            or "lnk-linear-scaling")


def _scrub(x: Array) -> Array:
    return jnp.where(jnp.isfinite(x), x, jnp.zeros_like(x))


def normalize(x: Array, row: Array, *, method: str = "lnk-linear-scaling",
              limits: tuple[float, float] = (-1.0, 1.0), is_log: Array | bool = False) -> Array:
    """Normalize ``x`` with a single stats row ``[min,max,mean,std,count]``.

    ``is_log`` selects the log branch under lnk-linear-scaling
    (ref auxiliary_functions.py:139-146 / data_processing_utils.py:1040-1051).
    """
    a, b = limits
    lo, hi, mu, sd = row[MIN], row[MAX], row[MEAN], row[STD]
    if method == "z-score":
        out = (x - mu) / sd
    elif method == "lnk-linear-scaling":
        lin = ((x - lo) / (hi - lo)) * (b - a) + a
        log = (jnp.log(x / lo) / jnp.log(hi / lo)) * (b - a) + a
        out = jnp.where(jnp.asarray(is_log), log, lin)
    else:  # linear-scaling
        out = ((x - lo) / (hi - lo)) * (b - a) + a
    return _scrub(out)


def denormalize(x: Array, row: Array, *, method: str = "lnk-linear-scaling",
                limits: tuple[float, float] = (-1.0, 1.0), is_log: Array | bool = False) -> Array:
    """Inverse of :func:`normalize` (ref auxiliary_functions.py:175-225)."""
    a, b = limits
    lo, hi, mu, sd = row[MIN], row[MAX], row[MEAN], row[STD]
    if method == "z-score":
        out = x * sd + mu
    elif method == "lnk-linear-scaling":
        lin = (hi - lo) * ((x - a) / (b - a)) + lo
        log = jnp.exp(jnp.log(hi / lo) * ((x - a) / (b - a)) + jnp.log(lo))
        out = jnp.where(jnp.asarray(is_log), log, lin)
    else:
        out = (hi - lo) * ((x - a) / (b - a)) + lo
    return _scrub(out)


def normalize_diff(d: Array, row: Array, *, method: str = "lnk-linear-scaling",
                   limits: tuple[float, float] = (-1.0, 1.0), is_log: Array | bool = False,
                   x0: float = 3.0) -> Array:
    """Normalize a *difference* (used for the predicted PDE time step that is
    added to the normalized time channel; ref auxiliary_functions.py:232-284,
    used at physics_loss.py:105)."""
    a, b = limits
    lo, hi, mu, sd = row[MIN], row[MAX], row[MEAN], row[STD]
    if method == "z-score":
        out = d / sd
    elif method == "lnk-linear-scaling":
        lin = (b - a) / (hi - lo) * d
        log = (b - a) / jnp.log(hi / lo) * jnp.log((x0 + d) / x0)
        out = jnp.where(jnp.asarray(is_log), log, lin)
    else:
        out = (b - a) / (hi - lo) * d
    return _scrub(out)


def normalize_derivative(row: Array, *, method: str = "lnk-linear-scaling",
                         limits: tuple[float, float] = (-1.0, 1.0),
                         is_log: Array | bool = False) -> Array:
    """Analytic d(x_norm)/dx of the normalization map
    (ref auxiliary_functions.py:16-73)."""
    a, b = limits
    lo, hi, sd = row[MIN], row[MAX], row[STD]
    if method == "z-score":
        out = 1.0 / sd
    elif method == "lnk-linear-scaling":
        lin = (b - a) / (hi - lo)
        log = (b - a) / jnp.log(hi / lo)
        out = jnp.where(jnp.asarray(is_log), log, lin)
    else:
        out = (b - a) / (hi - lo)
    return _scrub(jnp.asarray(out))


class DataSummary:
    """Named statistics table with channelwise (de)normalization.

    Construction mirrors the reference DataSummary: accepts dict-of-dicts
    (row name → {min,max,mean,std[,shape]}), a pandas DataFrame, or a JSON
    file path. Rows whose names contain ``perm`` are flagged as log rows for
    the ``lnk-linear-scaling`` scheme.

    The table is stored both as numpy (host bookkeeping) and exposed as a
    jnp array for use inside jitted functions. ``normalize``/``denormalize``
    with a 2xK ``statistics_index`` map reproduce the reference's channel→row
    mapping semantics (data_processing_utils.py:919-1062).
    """

    COLS = ("min", "max", "mean", "std", "count")

    def __init__(self, data_list: Sequence[Any], dtype=np.float32):
        rows: List[np.ndarray] = []
        names: List[str] = []
        shapes: Dict[str, List[int]] = {}
        for item in data_list:
            for name, stats in self._iter_items(item):
                lname = str(name).lower()
                shape = None
                if isinstance(stats, Mapping):
                    shape = stats.get("shape")
                    count = stats.get("count", float(np.prod(shape)) if shape else 0.0)
                    row = [stats.get("min", 0.0), stats.get("max", 0.0),
                           stats.get("mean", 0.0), stats.get("std", 0.0), count]
                else:  # column vector of raw values (PVT table column)
                    vals = np.asarray(stats, dtype=np.float64)
                    row = [vals.min(), vals.max(), vals.mean(), vals.std(), float(vals.size)]
                names.append(lname)
                if shape is not None:
                    shapes[lname] = list(shape)
                rows.append(np.asarray(row, dtype=dtype))
        self.names = names
        self.shapes = shapes
        self.table_np = np.stack(rows, axis=0).astype(dtype) if rows else np.zeros((0, 5), dtype)
        self._index = {n: i for i, n in enumerate(names)}
        self.is_log_np = np.array(["perm" in n for n in names], dtype=bool)
        # Raw per-row value vectors, kept when constructed from a dataframe
        # (needed by the spline PVT layer to fetch knot vectors).
        self._columns: Dict[str, np.ndarray] = {}
        for item in data_list:
            cols = self._raw_columns(item)
            if cols:
                self._columns.update(cols)

    # -- construction helpers -------------------------------------------------
    @staticmethod
    def _iter_items(item):
        try:
            import pandas as pd
        except Exception:  # pragma: no cover
            pd = None
        if pd is not None and isinstance(item, pd.DataFrame):
            # DataFrame of raw samples: one stats row per column
            for col in item.columns:
                yield col, item[col].to_numpy()
            return
        if isinstance(item, str) and os.path.isfile(item) and item.lower().endswith(".json"):
            with open(item) as f:
                item = json.load(f)
        if isinstance(item, Mapping):
            for k, v in item.items():
                yield k, v
            return
        raise TypeError(f"Unsupported DataSummary input: {type(item)}")

    @staticmethod
    def _raw_columns(item) -> Dict[str, np.ndarray]:
        try:
            import pandas as pd
        except Exception:  # pragma: no cover
            return {}
        if isinstance(item, pd.DataFrame):
            return {str(c).lower(): item[c].to_numpy(np.float32) for c in item.columns}
        return {}

    # -- lookups --------------------------------------------------------------
    @property
    def table(self) -> Array:
        return jnp.asarray(self.table_np)

    @property
    def is_log(self) -> Array:
        return jnp.asarray(self.is_log_np)

    def get_key_index(self, key: str) -> int:
        return self._index[key.lower()]

    def row(self, key: str) -> np.ndarray:
        return self.table_np[self.get_key_index(key)]

    def lookup(self, key: str) -> np.ndarray:
        """Raw value vector for ``key`` when built from a dataframe (PVT knots),
        else the stats row (ref data_processing_utils.py:873-881)."""
        lk = key.lower()
        if lk in self._columns:
            return self._columns[lk]
        return self.row(key)

    def keys(self) -> List[str]:
        return list(self.names)

    # -- channelwise transforms ----------------------------------------------
    def channel_rows(self, statistics_index) -> tuple[np.ndarray, np.ndarray]:
        """Resolve a 2xK [channel-positions; stats-rows] map (or scalar / list
        of rows) into (positions, rows) numpy vectors."""
        idx = np.asarray(statistics_index)
        if idx.ndim == 0:
            return np.array([0]), idx.reshape(1)
        if idx.ndim == 1:
            return np.arange(idx.size), idx
        return idx[0], idx[1]

    def normalize(self, x: Array, norm_config: Optional[Mapping[str, Any]] = None,
                  statistics_index=None, compute: bool = True,
                  normalization_dimension: int = -1, dtype=None, direction: str = "fwd",
                  x0: float = 3.0) -> Array:
        """Channelwise normalization along ``normalization_dimension``.

        ``statistics_index`` follows the reference convention: a 2xK map of
        [channel position; stats row]. Channels not listed pass through.
        """
        if not compute:
            return x
        x = jnp.asarray(x, dtype=dtype or x.dtype)
        method = _method(norm_config)
        limits = _norm_limits(norm_config)
        if statistics_index is None:
            statistics_index = np.stack([np.arange(len(self.names)), np.arange(len(self.names))])
        pos, rows = self.channel_rows(statistics_index)
        axis = normalization_dimension % x.ndim
        chans = [x[(slice(None),) * axis + (i,)] for i in range(x.shape[axis])]
        pos2row = {int(p): int(r) for p, r in zip(pos, rows)}
        out = []
        for i, c in enumerate(chans):
            if i in pos2row:
                r = pos2row[i]
                row = self.table[r]
                il = bool(self.is_log_np[r])
                if direction == "fwd":
                    c = normalize(c, row, method=method, limits=limits, is_log=il)
                elif direction == "inv":
                    c = denormalize(c, row, method=method, limits=limits, is_log=il)
                else:
                    c = normalize_diff(c, row, method=method, limits=limits, is_log=il, x0=x0)
            out.append(c)
        return jnp.stack(out, axis=axis)

    def nonormalize(self, x, norm_config=None, statistics_index=None, compute=True,
                    nonormalization_dimension: int = -1, dtype=None) -> Array:
        return self.normalize(x, norm_config, statistics_index, compute,
                              nonormalization_dimension, dtype, direction="inv")

    def normalize_diff(self, d, norm_config=None, statistics_index=None, compute=True,
                       x0: float = 3.0, nonormalization_dimension: int = -1, dtype=None) -> Array:
        return self.normalize(d, norm_config, statistics_index, compute,
                              nonormalization_dimension, dtype, direction="diff", x0=x0)


def compute_statistics(features: np.ndarray, keys: Sequence[str]) -> Dict[str, Dict[str, Any]]:
    """Per-channel [min,max,mean,std,shape] statistics of a woven feature
    tensor ``[..., C]`` (ref srm_data_processing.py:738-875)."""
    stats: Dict[str, Dict[str, Any]] = {}
    f = np.asarray(features)
    for i, key in enumerate(keys):
        ch = f[..., i]
        stats[key] = {
            "min": float(ch.min()), "max": float(ch.max()),
            "mean": float(ch.mean()), "std": float(ch.std()),
            "shape": list(ch.shape),
        }
    return stats
