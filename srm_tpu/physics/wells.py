"""Well data processing: grid scatter and shut-in masks.

TPU-native redesign of the reference ``WellDataProcessor``
(``/root/reference/welldata_processor.py:18-389``; the ``StaticMode``
variant :391-1098 existed only to make TF-graph-mode mutation possible — in
JAX, rebuilding the small constant tensors and re-tracing is free, so one
class covers both).

Well lists become dense per-well arrays; scattering onto the grid uses
``jnp.zeros().at[idx].set`` (the reference's graph-mode ``scatter_y``,
:170-224), and the connection shut-in mask is fully vectorized over
(wells x windows) instead of the reference's index-arithmetic scatter
(:228-389).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray

CONTROL_MODES = ("ORAT", "GRAT", "WRAT", "BHP", "LRAT")


class WellDataProcessor:
    """Well list → dense tensors, with a mutation API that rebuilds them."""

    def __init__(self, well_list: List[Dict[str, Any]], mode_order=("k", "j", "i"),
                 control_modes: Sequence[str] = CONTROL_MODES, dtype=np.float32):
        self.mode_keys = [m.upper() for m in control_modes]
        self.bhp_idx = self.mode_keys.index("BHP") if "BHP" in self.mode_keys else None
        self.perm = [{"i": 0, "j": 1, "k": 2}[d] for d in mode_order]
        self.dtype = dtype
        self.well_list = [dict(w) for w in well_list]
        self._rebuild()

    def _rebuild(self):
        coords = np.array([[w["i"], w["j"], w["k"]] for w in self.well_list], np.int32)
        self.connection_indices = coords[:, self.perm]  # (N,3) in (k,j,i) order
        ctrl, signs, names, rw, cr, bhp, shut = [], [], [], [], [], [], []
        max_windows = max(len(w.get("shutin_days") or [[0.0, 0.0]]) for w in self.well_list)
        for w in self.well_list:
            mode = str(w.get("control", "")).upper()
            val = float(w.get("value", 0.0))
            ctrl.append([val if m == mode else 0.0 for m in self.mode_keys])
            signs.append(1.0 if str(w.get("type", "")).lower() == "producer" else -1.0)
            names.append(w.get("name", ""))
            rw.append(float(w.get("wellbore_radius", 0.0)))
            cr.append(float(w.get("completion_ratio", 0.0)))
            bhp.append(float(w.get("minimum_bhp", 0.0)))
            wins = [[float(a), float(b)] for a, b in (w.get("shutin_days") or [[0.0, 0.0]])]
            # pad with never-true windows (start > end)
            wins += [[1.0, 0.0]] * (max_windows - len(wins))
            shut.append(wins)
        self.control_matrix = np.asarray(ctrl, self.dtype)
        self.type_sign = np.asarray(signs, self.dtype)
        self.names = names
        self.wellbore_radius = np.asarray(rw, self.dtype)
        self.completion_ratio = np.asarray(cr, self.dtype)
        self.minimum_bhp = np.asarray(bhp, self.dtype)
        self.shutin_days = np.asarray(shut, self.dtype)  # (N, S, 2)

    def get_well_data(self) -> Dict[str, Any]:
        """Signed control values (producers +, injectors −, BHP always
        positive; ref welldata_processor.py:73-107)."""
        self._rebuild()
        signed = self.control_matrix * self.type_sign[:, None]
        if self.bhp_idx is not None:
            signed[:, self.bhp_idx] = np.abs(self.control_matrix[:, self.bhp_idx])
        return {
            "connection_index": self.connection_indices,
            "control_mode_value": signed.sum(axis=1).astype(self.dtype),
            "names": self.names,
            "wellbore_radius": self.wellbore_radius,
            "completion_ratio": self.completion_ratio,
            "minimum_bhp": self.minimum_bhp,
            "shutin_days": self.shutin_days,
        }

    # -- mutation API (ref :109-167) ------------------------------------------
    def update_control(self, well_idx: int, mode_key: str, new_value: float):
        self.well_list[well_idx]["control"] = mode_key
        self.well_list[well_idx]["value"] = float(new_value)

    def update_type(self, well_idx: int, new_type: str):
        self.well_list[well_idx]["type"] = new_type

    def update_shutin_days(self, well_idx: int, new_shutin_days):
        self.well_list[well_idx]["shutin_days"] = [
            [float(a), float(b)] for a, b in new_shutin_days]

    def update_well_list(self, new_wells: List[Dict[str, Any]]):
        coord_to_idx = {(w["i"], w["j"], w["k"]): n for n, w in enumerate(self.well_list)}
        for w in new_wells:
            key = (w["i"], w["j"], w["k"])
            if key in coord_to_idx:
                self.well_list[coord_to_idx[key]].update(w)
            else:
                self.well_list.append(dict(w))

    # -- grid ops ---------------------------------------------------------------
    def scatter_y(self, target_shape: Sequence[int], index_list: np.ndarray,
                  y, start_dim: int = 1) -> Array:
        """Scatter per-well values into a zeros grid; indices address dims
        [start_dim, start_dim+3) of ``target_shape`` (ref :170-224)."""
        return scatter_to_grid(target_shape, index_list, y, start_dim=start_dim,
                               dtype=self.dtype)

    def conn_shutins_idx(self, time_tensor: Array, index_list: np.ndarray,
                         range_conditions, time_axis: int = 0) -> Array:
        return conn_shutins_mask(time_tensor, index_list, range_conditions,
                                 time_axis=time_axis)


def scatter_to_grid(target_shape: Sequence[int], index_list, y, start_dim: int = 1,
                    dtype=jnp.float32) -> Array:
    """zeros(target_shape).at[:, k, j, i, :].set(y) for each well."""
    idx = np.asarray(index_list, np.int64)
    yv = np.asarray(y, np.float32).reshape(-1)
    if yv.size == 1:
        yv = np.full((idx.shape[0],), yv[0], np.float32)
    grid = np.zeros(tuple(int(s) for s in target_shape), np.float32)
    for n in range(idx.shape[0]):
        sl = ((slice(None),) * start_dim + tuple(int(i) for i in idx[n])
              + (slice(None),) * (grid.ndim - start_dim - idx.shape[1]))
        grid[sl] = yv[n]
    return jnp.asarray(grid, dtype)


def conn_shutins_mask(time_tensor: Array, index_list, range_conditions,
                      time_axis: int = 0) -> Array:
    """Binary open/shut mask over the grid for every sample.

    Semantics match the reference (welldata_processor.py:228-389): the output
    has the time tensor's shape; non-well cells are 0; a well cell is 1 when
    its representative time does NOT fall in any of its [start, stop] shut-in
    windows (windows with start > stop never fire).

    Vectorized: one gather of per-well times, one (wells x windows)
    comparison, one scatter — no loops, no reshape gymnastics.
    """
    t = jnp.asarray(time_tensor)
    idx = np.asarray(index_list, np.int64)                  # (N, 3) in (k, j, i)
    windows = jnp.asarray(np.asarray(range_conditions, np.float32))  # (N, S, 2)
    nd = t.ndim
    # spatial dims addressed by the index triplets start right after time_axis
    s0 = time_axis + 1
    # representative per-well time: gather at the well cell (remaining inner
    # dims take their first element)
    gather_slices = []
    for n in range(idx.shape[0]):
        sl = [slice(None)] * nd
        for d in range(3):
            if s0 + d < nd:
                sl[s0 + d] = int(idx[n, d])
        for d in range(s0 + 3, nd):
            sl[d] = 0
        gather_slices.append(t[tuple(sl)])
    tw = jnp.stack(gather_slices, axis=-1)                  # (*outer, N)

    inside = (tw[..., None] >= windows[:, :, 0]) & (tw[..., None] <= windows[:, :, 1])
    open_flag = jnp.logical_not(jnp.any(inside, axis=-1)).astype(t.dtype)  # (*outer, N)

    out = jnp.zeros_like(t)
    for n in range(idx.shape[0]):
        sl = [slice(None)] * nd
        for d in range(3):
            if s0 + d < nd:
                sl[s0 + d] = int(idx[n, d])
        val = open_flag[..., n]
        # broadcast over any remaining inner dims
        extra = nd - (s0 + 3) if nd > s0 + 3 else 0
        val = val.reshape(val.shape + (1,) * extra) * jnp.ones_like(out[tuple(sl)])
        out = out.at[tuple(sl)].set(val)
    return out
