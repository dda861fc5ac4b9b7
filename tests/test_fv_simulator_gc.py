"""Two-phase (gas-condensate) FV reference simulator + GC simulator-label
training — VERDICT r2 item 2: a GC label source with external-free mass
conservation checks, and data-mode GC training on non-zero PRESSURE+SGAS
labels.
"""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def gc_proc(tmp_path_factory):
    from srm_tpu.config import DEFAULT_GENERAL_CONFIG
    from srm_tpu.data.dataset import SRMDataProcessor

    g = copy.deepcopy(DEFAULT_GENERAL_CONFIG)
    g["fluid_type"] = "GC"
    g["label_source"] = "simulator"
    g["unit_target_shape"] = (1, 1, 13, 13, 1)
    proc = SRMDataProcessor(base_dir=str(tmp_path_factory.mktemp("fvsim_gc")),
                            general_config=g)
    proc.reservoir_config["Nx"] = proc.reservoir_config["Ny"] = 13
    proc.reservoir_config["realizations"]["permx"]["number"] = 6
    proc.reservoir_config["realizations"]["permx"]["conditional_values"] = {(5, 5, 0): 2.0}
    for conn in proc.wells_config["connections"]:
        conn["i"] = min(conn["i"] // 3, 12)
        conn["j"] = min(conn["j"] // 3, 12)
        conn["minimum_bhp"] = 1500.0        # deep drawdown crosses the dew point
        conn["value"] *= 4.0                # deplete past the dew point within
    return proc                             # the default 365-day horizon


@pytest.fixture(scope="module")
def gc_sim_bits(gc_proc):
    from srm_tpu.config import DEFAULT_SCAL_CONFIG, get_configuration
    from srm_tpu.physics.pvt import make_pvt_layer
    from srm_tpu.physics.relperm import RelativePermeability
    from srm_tpu.sim import build_problem

    pvt_cfg = get_configuration("pvt_layer", fluid_type="GC", fitting_method="spline")
    pvt_cfg["spline_order"] = 1
    layer = make_pvt_layer(pvt_cfg)
    params = layer.init(jax.random.PRNGKey(0), np.zeros((4,), np.float32))
    pvt_fn = lambda p: layer.apply(params, p)  # noqa: E731
    scal = DEFAULT_SCAL_CONFIG
    relperm = RelativePermeability.from_config(scal["end_points"],
                                               scal["corey_exponents"])
    prob, kscale = build_problem(gc_proc.reservoir_config, gc_proc.wells_config,
                                 scal, gc_proc.general_config)
    return prob, kscale, pvt_fn, relperm, scal["end_points"]["Swmin"]


def test_gc_simulator_depletes_and_condenses(gc_sim_bits):
    """Above the dew point Sg stays at Sgi; once drawdown crosses it,
    condensate drops out (Sg declines) while pressure keeps falling."""
    from srm_tpu.sim import simulate_gas_condensate

    prob, kscale, pvt_fn, relperm, Swmin = gc_sim_bits
    kx = np.full(int(np.prod(prob.shape)), 30.0, np.float32)
    times = jnp.asarray(np.linspace(0.0, 1500.0, 31), jnp.float32)
    out = np.asarray(simulate_gas_condensate(prob, kscale, jnp.asarray(kx),
                                             times, pvt_fn, relperm, Swmin))
    p, sg = out[..., 0], out[..., 1]
    assert np.isfinite(out).all()
    np.testing.assert_allclose(p[0], prob.Pi)
    np.testing.assert_allclose(sg[0], prob.Sgi, atol=1e-5)
    means = p.mean(axis=1)
    assert (np.diff(means) < 0).all()               # monotone depletion
    # while everywhere above dew point (~4048 psia): Sg pinned at Sgi
    above = p.min(axis=1) > 4100.0
    assert above[:3].all()
    np.testing.assert_allclose(sg[above], prob.Sgi, atol=2e-3)
    # after crossing: substantial condensate drop-out
    assert p.min() < 3700.0
    assert sg[-1].mean() < prob.Sgi - 0.05
    assert sg.min() >= 0.0 and sg.max() <= prob.Sgi + 1e-5


def test_gc_simulator_mass_balance(gc_sim_bits):
    """Σ_cells Δ(surface mass) ≈ −Σ_wells q·Δt per step and per COMPONENT
    (gas and oil) — the scheme's conservation statement, mirroring the GC
    loss's per-phase tank MBC (ref physics_loss.py:655-665)."""
    from srm_tpu.sim import simulate_gas_condensate

    prob, kscale, pvt_fn, relperm, Swmin = gc_sim_bits
    N = int(np.prod(prob.shape))
    rng = np.random.RandomState(3)
    kx = np.exp(rng.uniform(2.5, 4.0, N)).astype(np.float32)
    times = jnp.asarray([0.0, 200.0, 400.0, 600.0, 800.0], jnp.float32)
    out = np.asarray(simulate_gas_condensate(prob, kscale, jnp.asarray(kx),
                                             times, pvt_fn, relperm, Swmin,
                                             n_newton=12))
    p, sg = out[..., 0], out[..., 1]
    cf = 97.32e-6 / (1.0 + 55.8721 * prob.phi**1.428586)

    def unit_masses(pv, s):
        vals = np.asarray(pvt_fn(jnp.asarray(pv))[0])
        invBg, invBo, Rs, Rv = vals[0], vals[1], vals[4], vals[5]
        so = 1.0 - Swmin - s
        return invBg * s + Rs * invBo * so, invBo * so + Rv * invBg * s

    for n in range(len(times) - 1):
        p0, s0 = p[n], sg[n]
        p1, s1 = p[n + 1], sg[n + 1]
        dt = float(times[n + 1] - times[n])
        ug0, uo0 = unit_masses(p0, s0)
        ug1, uo1 = unit_masses(p1, s1)
        phi_p = prob.phi * (1.0 + cf * (p1 - p0))
        dm_g = (prob.dv / prob.D) * (phi_p * ug1 - prob.phi * ug0)
        dm_o = (prob.dv / prob.D) * (phi_p * uo1 - prob.phi * uo0)

        # reconstruct the applied well rates at the converged state
        vals1 = np.asarray(pvt_fn(jnp.asarray(p1))[0])
        invBg, invBo, invug, invuo, Rs, Rv = (vals1[i] for i in range(6))
        krog, krgo = (np.asarray(a) for a in relperm(jnp.asarray(s1)))
        bgug, bouo = invBg * invug, invBo * invuo
        mg_cell = krgo * bgug + krog * Rs * bouo
        mo_cell = krog * bouo + krgo * Rv * bgug
        wc = prob.well_cells
        ck = prob.well_ck_geom * kx[wc]
        qg_max = ck * mg_cell[wc] * np.maximum(p1[wc] - prob.pwf_min, 0.0)
        qg = np.where(prob.q_target >= 0, np.minimum(prob.q_target, qg_max),
                      prob.q_target)
        qo = qg * mo_cell[wc] / (mg_cell[wc] + 1e-30)

        total_qg, total_qo = float(qg.sum()) * dt, float(qo.sum()) * dt
        assert total_qg > 0 and total_qo > 0
        assert abs(float(dm_g.sum()) + total_qg) < 0.02 * total_qg
        assert abs(float(dm_o.sum()) + total_qo) < 0.02 * total_qo


@pytest.mark.slow
def test_gc_label_training_and_rmse(gc_proc):
    """Data-mode GC training on the two-phase simulator's non-zero
    PRESSURE+SGAS labels: loss decreases, and both pressure and saturation
    RMSEs are computable and sane."""
    from srm_tpu.losses.physics_loss import PhysicsLoss
    from srm_tpu.nn.modules import build_model_map
    from srm_tpu.training.trainer import Trainer
    from srm_tpu.utils.stats import DataSummary
    from srm_tpu.eval.plotting import pressure_rmse, saturation_rmse

    proc = gc_proc
    g = copy.deepcopy(proc.general_config)
    g["physics_mode_fraction"] = 0.0          # supervised on simulator labels
    proc.general_config = g
    _, tr, va, te, pr = proc.get_or_generate_training_data()

    x, y = tr[0]
    assert abs(np.asarray(y["PRESSURE"])).max() > 0, "labels must be non-zero"
    assert abs(np.asarray(y["SGAS"])).max() > 0
    # the simulator produced genuine two-phase behavior somewhere in train
    assert np.asarray(y["SGAS"]).min() < 0.775

    ds = DataSummary([proc.load_training_statistics()])
    models, params = build_model_map(x.shape, fluid_type="GC", general_config=g,
                                     reservoir_config=proc.reservoir_config,
                                     wells_config=proc.wells_config, data_summary=ds)
    loss_fn = PhysicsLoss(models, ds, general_config=g,
                          reservoir_config=proc.reservoir_config,
                          wells_config=proc.wells_config, fluid_type="GC")
    tr_obj = Trainer(loss_fn, params, donate_params=False)
    xb = np.reshape(x, (-1,) + x.shape[2:])[:16]
    yb = {k: np.reshape(v, (-1,) + v.shape[2:])[:16] for k, v in y.items()}
    losses = [float(tr_obj.train_step(xb, yb)["total"]) for _ in range(15)]
    assert losses[-1] < losses[0]

    p_rmse = pressure_rmse(models, tr_obj.params, te)
    s_rmse = saturation_rmse(models, tr_obj.params, te)
    assert np.isfinite(p_rmse) and p_rmse > 0
    assert np.isfinite(s_rmse) and 0 < s_rmse < 1.0
    assert p_rmse < 3500.0


def test_setup_case_drawdown_overrides(tmp_path):
    """The ``pi``/``min_bhp`` overrides in ``setup_case`` build a genuine
    below-dew-point GC case: the shipped config (Pi=5000, minimum_bhp=4100)
    never crosses the 4048.4-psia dew point, so these knobs are what makes
    condensate dropout reachable from the experiment CLI
    (``tools/rmse_experiment.py --pi --min-bhp``)."""
    from srm_tpu.config import DEFAULT_GENERAL_CONFIG
    from srm_tpu.examples.common import setup_case

    g = copy.deepcopy(DEFAULT_GENERAL_CONFIG)
    g["label_source"] = "simulator"
    case = setup_case("GC", base_dir=str(tmp_path), nx=9, n_realizations=4,
                      general_config=g, pi=4300.0, min_bhp=2000.0)
    assert float(case["loss_fn"].Pi) == 4300.0
    _, yte = case["test_groups"][0]
    p = np.asarray(yte["PRESSURE"])
    sg = np.asarray(yte["SGAS"])
    assert 0.0 < p.min() < 4048.4 < p.max() <= 4300.0
    # condensate drops out where the pressure crossed the dew point
    assert sg.min() < sg.max() - 0.02
    np.testing.assert_allclose(sg.max(), 0.78, atol=1e-3)
