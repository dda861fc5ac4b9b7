"""Cross-validation of the two independent well models — VERDICT r2 item 7.

The FV reference simulator (srm_tpu/sim/fv_simulator.py) and the training-path
``WellRatesPressure`` solver (srm_tpu/physics/well_solver.py) both implement
Peaceman inflow with a min-BHP drawdown clip
(ref well_rate_bhp_Subclassed.py:613-724). They are written independently
(flat-index numpy geometry vs scattered-grid tensors), so agreement here
pins the Ck geometry, the phase mobilities and the clip logic against each
other. The state is driven into the BHP-limited regime (p just above
min_bhp) so the comparison exercises the Peaceman product, not the trivial
target-rate pass-through.
"""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srm_tpu.config import (
    DEFAULT_GENERAL_CONFIG, DEFAULT_RESERVOIR_CONFIG, DEFAULT_SCAL_CONFIG,
    DEFAULT_WELLS_CONFIG, get_configuration,
)
from srm_tpu.physics.pvt import make_pvt_layer
from srm_tpu.physics.relperm import RelativePermeability
from srm_tpu.physics.well_solver import WellRatesPressure
from srm_tpu.sim.fv_simulator import build_problem
from srm_tpu.utils.stats import DataSummary, normalize

STATS = {
    "z": {"min": 40.0, "max": 40.0, "mean": 40.0, "std": 1.0},
    "y": {"min": 37.0, "max": 2863.0, "mean": 1450.0, "std": 830.0},
    "x": {"min": 37.0, "max": 2863.0, "mean": 1450.0, "std": 830.0},
    "time": {"min": 0.0, "max": 255.0, "mean": 127.5, "std": 75.0},
    "permx": {"min": 0.26, "max": 240.0, "mean": 29.6, "std": 14.3},
}


def _case(fluid):
    ds = DataSummary([STATS])
    cfg = get_configuration("pvt_layer", fluid_type=fluid, fitting_method="spline")
    cfg["spline_order"] = 1
    layer = make_pvt_layer(cfg)
    params = layer.init(jax.random.PRNGKey(0), jnp.zeros((4,)))
    pvt_fn = lambda p: layer.apply(params, p)  # noqa: E731
    scal = DEFAULT_SCAL_CONFIG
    relperm = RelativePermeability.from_config(scal["end_points"],
                                               scal["corey_exponents"])
    g = copy.deepcopy(DEFAULT_GENERAL_CONFIG)
    g["fluid_type"] = fluid
    ws = WellRatesPressure(fluid_type=fluid, data_summary=ds, pvt_fn=pvt_fn,
                           relperm=relperm, general_config=g,
                           use_non_iterative=True)
    prob, kscale = build_problem(DEFAULT_RESERVOIR_CONFIG, DEFAULT_WELLS_CONFIG,
                                 scal, g)
    return ds, pvt_fn, relperm, ws, prob


def _features(ds, kx_value, shape=(1, 1, 39, 39, 5)):
    """Feature tensor whose permx channel denormalizes back to kx_value and
    whose time channel is mid-horizon (no shut-in windows active)."""
    x = np.zeros(shape, np.float32)
    method = DEFAULT_GENERAL_CONFIG["data_normalization"]["feature_normalization_method"]
    limits = tuple(DEFAULT_GENERAL_CONFIG["data_normalization"]["normalization_limits"])
    k_row = ds.table[ds.get_key_index("permx")]
    k_norm = float(normalize(jnp.asarray(kx_value), k_row, method=method,
                             limits=limits, is_log=True))
    x[..., 4] = k_norm
    x[..., 3] = 0.0
    return jnp.asarray(x)


@pytest.mark.parametrize("fluid", ["DG", "GC"])
def test_fv_wells_match_well_solver(fluid):
    ds, pvt_fn, relperm, ws, prob = _case(fluid)
    kx_value = 5.0
    N = int(np.prod(prob.shape))
    kx = np.full(N, kx_value, np.float32)

    # BHP-limited state: uniform p barely above min BHP (4100 psia default)
    p_val = 4110.0
    p_flat = np.full(N, p_val, np.float32)

    # --- simulator-side rates (the formula simulate_* applies, ref
    # fv_simulator.py well block) -----------------------------------------
    vals = np.asarray(pvt_fn(jnp.asarray(p_flat))[0])
    if fluid == "DG":
        invBg, invug = vals[0], vals[1]
        mg_cell = prob.krgo * invBg * invug
        mo_cell = np.zeros_like(mg_cell)
    else:
        invBg, invBo, invug, invuo, Rs, Rv = (vals[i] for i in range(6))
        sgi = np.full(N, prob.Sgi, np.float32)
        krog, krgo = (np.asarray(a) for a in relperm(jnp.asarray(sgi)))
        mg_cell = krgo * invBg * invug + krog * Rs * invBo * invuo
        mo_cell = krog * invBo * invuo + krgo * Rv * invBg * invug
    wc = prob.well_cells
    ck = prob.well_ck_geom * kx[wc]
    qg_max = ck * mg_cell[wc] * np.maximum(p_flat[wc] - prob.pwf_min, 0.0)
    qg_sim = np.where(prob.q_target >= 0, np.minimum(prob.q_target, qg_max),
                      prob.q_target)
    qo_sim = qg_sim * mo_cell[wc] / (mg_cell[wc] + 1e-30)
    # the clip must actually bind somewhere, else the test is vacuous
    assert (qg_sim[prob.q_target > 0] < prob.q_target[prob.q_target > 0] - 1e-3).all(), \
        "BHP clip did not bind; lower p_val/kx"

    # --- training-path solver on the same state --------------------------
    x = _features(ds, kx_value)
    p_grid = jnp.full((1, 1, 39, 39, 1), p_val, jnp.float32)
    Sg = None if fluid == "DG" else jnp.full_like(p_grid, prob.Sgi)
    out, pwf = ws.compute_rates_and_bhp(x, p_grid, Sg)
    conn = np.asarray(ws.well_data["connection_index"])  # (W, 3) (k, j, i)
    if fluid == "DG":
        q_ws = np.asarray(out)[0, conn[:, 0], conn[:, 1], conn[:, 2], 0]
        np.testing.assert_allclose(q_ws, qg_sim, rtol=2e-3)
    else:
        qgg, qgo, qoo, qog = (np.asarray(a)[0, conn[:, 0], conn[:, 1],
                                            conn[:, 2], 0] for a in out)
        np.testing.assert_allclose(qgg + qgo, qg_sim, rtol=2e-3)
        # in the BHP-limited regime the solver's Rv-capped oil rate equals
        # the drawdown-consistent mobility split the simulator uses
        np.testing.assert_allclose(qoo + qog, qo_sim, rtol=2e-3)
