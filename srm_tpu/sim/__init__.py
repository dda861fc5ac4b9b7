"""On-device reference simulation (label generation without an external
simulator binary).

``simulate_labels(processor, split)`` plugs into
``SRMDataProcessor.simulation_labels`` when
``general_config['label_source'] == 'simulator'``.
"""

from __future__ import annotations

import logging
import os
from typing import Dict, Optional

import numpy as np

from srm_tpu.sim.fv_simulator import (
    FVProblem, build_problem, simulate_dry_gas, simulate_gas_condensate,
    simulate_realizations, simulate_realizations_gc,
)

log = logging.getLogger(__name__)

__all__ = ["FVProblem", "build_problem", "simulate_dry_gas",
           "simulate_gas_condensate", "simulate_realizations",
           "simulate_realizations_gc", "simulate_labels"]


def simulate_labels(processor, split: str, permx: Optional[np.ndarray] = None,
                    times: Optional[np.ndarray] = None
                    ) -> Optional[Dict[str, np.ndarray]]:
    """Simulator labels (K, T, Nz, Ny, Nx per key) for one split.

    DG → {PRESSURE}; GC → {PRESSURE, SGAS} via the two-phase implicit FV
    solver (:func:`simulate_gas_condensate`) — NEW capability, the reference
    requires an external compositional simulator for GC labels
    (ref srm_data_processing.py:454-514).
    """
    from srm_tpu.config import DEFAULT_SCAL_CONFIG, get_configuration
    from srm_tpu.physics.pvt import make_pvt_layer
    import jax

    fluid = processor.general_config["fluid_type"].upper()
    if permx is None:
        permx = processor.generate_kle_splits()[split]
    if times is None:
        times = processor.generate_time_tensor()[split]
    times = np.asarray(times).reshape(-1)
    if permx.shape[0] == 0 or times.size < 2:
        return None   # empty split: caller falls back to zero labels

    pvt_cfg = get_configuration("pvt_layer", fluid_type=fluid, fitting_method="spline")
    pvt_cfg["spline_order"] = 1
    layer = make_pvt_layer(pvt_cfg)
    params = layer.init(jax.random.PRNGKey(0), np.zeros((4,), np.float32))
    pvt_fn = lambda p: layer.apply(params, p)  # noqa: E731

    prob, kscale = build_problem(processor.reservoir_config, processor.wells_config,
                                 DEFAULT_SCAL_CONFIG, processor.general_config)
    log.info("FV simulator (%s): %d realizations × %d times on grid %s",
             fluid, permx.shape[0], times.size, prob.shape)
    # per-dispatch tuning for large grids (each chunk is one device program;
    # smaller chunks bound its runtime/footprint on fault-prone links)
    kwargs: Dict = {"solver": os.environ.get("SRM_TPU_SIM_SOLVER", "auto")}
    if os.environ.get("SRM_TPU_SIM_CHUNK"):
        kwargs["chunk"] = int(os.environ["SRM_TPU_SIM_CHUNK"])
    if os.environ.get("SRM_TPU_SIM_TOL"):
        kwargs["cg_tol"] = float(os.environ["SRM_TPU_SIM_TOL"])
    if os.environ.get("SRM_TPU_SIM_MAXITER"):
        kwargs["cg_maxiter"] = int(os.environ["SRM_TPU_SIM_MAXITER"])
    if fluid == "DG":
        p = simulate_realizations(prob, kscale, np.asarray(permx, np.float32),
                                  np.asarray(times, np.float32), pvt_fn,
                                  **kwargs)
        return {"PRESSURE": np.asarray(p)}
    from srm_tpu.physics.relperm import RelativePermeability
    scal = DEFAULT_SCAL_CONFIG
    relperm = RelativePermeability.from_config(scal["end_points"],
                                               scal["corey_exponents"])
    p, sg = simulate_realizations_gc(
        prob, kscale, np.asarray(permx, np.float32),
        np.asarray(times, np.float32), pvt_fn, relperm,
        Swmin=scal["end_points"]["Swmin"], **kwargs)
    return {"PRESSURE": np.asarray(p), "SGAS": np.asarray(sg)}
