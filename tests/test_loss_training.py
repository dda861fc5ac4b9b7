"""PhysicsLoss + training-loop tests.

Includes the stencil verification the reference never had (SURVEY §4
recommends a manufactured-solution check) and multi-device data-parallel
equivalence on the virtual CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srm_tpu.ops.stencil import (
    pad_symmetric, neighbors, harmonic_faces, average_faces, five_point_divergence,
)


# --------------------------------------------------------------------------
# stencil unit checks
# --------------------------------------------------------------------------
def test_pad_symmetric():
    f = jnp.arange(9.0).reshape(1, 3, 3)
    fp = pad_symmetric(f)
    assert fp.shape == (1, 5, 5)
    assert fp[0, 0, 0] == f[0, 0, 0]
    assert fp[0, -1, -1] == f[0, -1, -1]


def test_harmonic_faces_constant_field():
    k = neighbors(pad_symmetric(jnp.full((1, 5, 5), 3.0)))
    for f in harmonic_faces(k):
        np.testing.assert_allclose(np.asarray(f), 3.0, rtol=1e-6)


def test_five_point_divergence_uniform_pressure():
    """With spatially-uniform pressure all flux terms cancel: the residual
    reduces to the source term q."""
    p = neighbors(pad_symmetric(jnp.full((1, 4, 4), 5000.0)))
    a = jnp.full((1, 4, 4), 0.37)
    q = jnp.zeros((1, 4, 4)).at[0, 2, 2].set(123.0)
    dv = 7.0
    out = five_point_divergence(a, a, a, a, p, q / dv, dv)
    np.testing.assert_allclose(np.asarray(out), np.asarray(q), rtol=1e-4, atol=1e-2)


def test_five_point_divergence_linear_pressure_interior():
    """A linear pressure field with constant transmissibility has zero
    divergence in the interior (fluxes in = fluxes out)."""
    H = W = 6
    px = jnp.broadcast_to(jnp.arange(W, dtype=jnp.float32), (1, H, W)) * 10.0
    p = neighbors(pad_symmetric(px))
    a = jnp.ones((1, H, W))
    out = np.asarray(five_point_divergence(a, a, a, a, p, jnp.zeros((1, H, W)), 1.0))
    np.testing.assert_allclose(out[0, 1:-1, 1:-1], 0.0, atol=1e-3)


# --------------------------------------------------------------------------
# PhysicsLoss end-to-end (small dry-gas case; session-scoped for speed)
# --------------------------------------------------------------------------
@pytest.fixture(scope="module")
def dg_case(dg13_case):
    return dg13_case


@pytest.fixture(scope="module")
def dg_eval(dg_case):
    """ONE loss+grad evaluation shared by the structural assertions below —
    the 4-model loss graph is expensive to evaluate eagerly on CPU."""
    loss_fn = dg_case["loss_fn"]
    x, y = dg_case["train_groups"][0]
    xb = jnp.asarray(x[:2, 0])        # (B, D, H, W, 5)
    yb = {k: jnp.asarray(v[:2, 0]) for k, v in y.items()}
    aux, grads, total = loss_fn.pinn_batch_sse_grad(dg_case["params"], xb, yb)
    return aux, grads, total


def test_loss_finite_and_structured(dg_eval):
    aux, _, total = dg_eval
    assert np.isfinite(float(total))
    assert set(aux["gas"]) == {"dom", "dbc", "nbc", "ibc", "ic", "mbc", "cmbc", "tde", "td"}
    for t, v in aux["gas"].items():
        assert np.isfinite(float(v)), t
    # zeroed terms stay zero in physics mode
    assert float(aux["gas"]["dbc"]) == 0.0
    assert float(aux["gas"]["ic"]) == 0.0


def test_loss_gradients_flow_to_all_models(dg_eval):
    aux, grads, total = dg_eval
    assert set(grads) == {"pressure", "time_step"}
    for key, g in grads.items():
        leaves = jax.tree_util.tree_leaves(g)
        assert leaves, key
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves), key
        total_norm = sum(float(jnp.sum(jnp.abs(l))) for l in leaves)
        assert total_norm > 0.0, f"no gradient signal for {key}"


def test_hard_ic_consistency(dg_case):
    """At the earliest training time the pressure model output is Pi, so the
    data residual against a Pi label is ~0 — the hard layer carries through
    the full composed loss path."""
    models, params = dg_case["models"], dg_case["params"]
    x, _ = dg_case["train_groups"][0]
    xb = jnp.asarray(x[:1, 0:1])  # first realization, first time (t0)
    xb = xb.reshape((1,) + xb.shape[2:])
    p = models["pressure"].apply(params["pressure"], xb)
    np.testing.assert_allclose(np.asarray(p), 5000.0, rtol=1e-5)


def test_training_decreases_loss_fixed_batch(dg_case):
    from srm_tpu.training.trainer import Trainer
    loss_fn = dg_case["loss_fn"]
    trainer = Trainer(loss_fn, dg_case["params"])
    x, y = dg_case["train_groups"][0]
    # collapse (K, T) to get a batch divisible by the 8-device mesh
    xb = x[:2, :4].reshape((-1,) + x.shape[2:])
    yb = {k: v[:2, :4].reshape((-1,) + v.shape[2:]) for k, v in y.items()}
    first = None
    last = None
    for i in range(12):
        m = trainer.train_step(xb, yb)
        v = float(m["total"])
        first = v if first is None else first
        last = v
    assert np.isfinite(last)
    assert last < first, (first, last)


@pytest.mark.slow
def test_multi_device_matches_single_device(dg_case):
    """Data-parallel over the 8-device CPU mesh computes the same loss as an
    unsharded evaluation (gradient/metric all-reduce correctness), and a full
    sharded train step runs."""
    from srm_tpu.training.trainer import Trainer
    from srm_tpu.parallel.mesh import make_mesh
    loss_fn = dg_case["loss_fn"]
    x, y = dg_case["train_groups"][0]
    # collapse (K, T) to get a batch divisible by the 8-device mesh
    xb = x[:2, :4].reshape((-1,) + x.shape[2:])
    yb = {k: v[:2, :4].reshape((-1,) + v.shape[2:]) for k, v in y.items()}

    # unsharded reference loss
    total_ref, _ = loss_fn.loss_and_metrics(dg_case["params"], jnp.asarray(xb),
                                            {k: jnp.asarray(v) for k, v in yb.items()})

    t8 = Trainer(loss_fn, dg_case["params"], mesh=make_mesh(8), donate_params=False)
    m8 = t8.eval_step(xb, yb)
    assert float(m8["total"]) == pytest.approx(float(total_ref), rel=1e-4)
    m_train = t8.train_step(xb, yb)
    assert np.isfinite(float(m_train["total"]))


def test_predictor_rollout(dg_case):
    """SRMPredictor: pressure + rate rollouts over an arbitrary ensemble/time
    schedule, hard IC preserved at t0."""
    from srm_tpu.eval.predictor import SRMPredictor
    proc = dg_case["processor"]
    pred = SRMPredictor(dg_case["models"], dg_case["params"], dg_case["data_summary"],
                        general_config=dg_case["general_config"],
                        reservoir_config=proc.reservoir_config, batch_size=16)
    permx = proc.generate_kle_splits()["test"][:2]
    p = pred.predict_pressure(permx, [0.0, 10.0, 50.0])
    assert p.shape == (2, 3, 1, 13, 13)
    assert np.isfinite(p).all()
    # hard initial condition at t=0
    np.testing.assert_allclose(p[:, 0], 5000.0, rtol=1e-5)
    q, pwf = pred.predict_rates(permx, [10.0, 50.0])
    assert q.shape[:2] == (2, 2)
    assert np.isfinite(np.asarray(q)).all()


@pytest.mark.slow
def test_gc_loss_builds_and_runs(gc13_case):
    """Gas-condensate path: saturation model + two-phase residuals."""
    from srm_tpu.losses.physics_loss import PhysicsLoss

    g, proc, ds = gc13_case["g"], gc13_case["proc"], gc13_case["ds"]
    models, params = gc13_case["models"], gc13_case["params"]
    assert "saturation_model" in models
    loss_fn = PhysicsLoss(models, ds, general_config=g,
                          reservoir_config=proc.reservoir_config,
                          wells_config=proc.wells_config, fluid_type="GC")
    x, y = gc13_case["train_groups"][0]
    xb = jnp.asarray(x[:2, 0])
    yb = {k: jnp.asarray(v[:2, 0]) for k, v in y.items()}
    aux, grads, total = loss_fn.pinn_batch_sse_grad(params, xb, yb)
    assert np.isfinite(float(total))
    assert set(aux) >= {"gas", "oil"}
    assert set(grads) == {"pressure", "time_step", "saturation"}
    for key, g_ in grads.items():
        leaves = jax.tree_util.tree_leaves(g_)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves), key
        # every trainable model must receive a LIVE gradient (round-1's
        # saturation model was silently dead: hard-pinned at Pi then clamped)
        assert sum(float(jnp.sum(jnp.abs(l))) for l in leaves) > 0, key


@pytest.mark.slow
def test_loss_heterogeneous_porosity(dg13_case):
    """Per-cell porosity in the loss (VERDICT r3 item 4; ref
    physics_loss.py:21-27 phi_0_ij): a constant phi-field reproduces the
    scalar-phi loss exactly, and a two-zone field changes the phi-
    proportional truncation-error (tde) term.  (The dom accumulation term is
    phi*(p1-p0)/dt, which is ~0 at init because the hard layer pins p to Pi
    — tde = (dv/D)*cp1*(2eps/t1 + ...) carries phi unconditionally.)"""
    import copy

    from srm_tpu.config import get_optimizer_model_mapping
    from srm_tpu.losses.physics_loss import PhysicsLoss

    case = dg13_case
    proc = case["processor"]
    res = proc.reservoir_config
    Nx, Ny, Nz = res["Nx"], res["Ny"], res["Nz"]
    x, y = case["train_groups"][0]
    xb = jnp.asarray(x[:2, 0])
    yb = {k: jnp.asarray(v[:2, 0]) for k, v in y.items()}

    def run(porosity):
        r = copy.deepcopy(res)
        r["porosity"] = porosity
        loss = PhysicsLoss(case["models"], case["data_summary"],
                           optimizer_model_names_map=get_optimizer_model_mapping("DG"),
                           general_config=case["general_config"],
                           reservoir_config=r, wells_config=proc.wells_config,
                           fluid_type="DG")
        aux, _, total = loss.pinn_batch_sse_grad(case["params"], xb, yb)
        return float(total), float(aux["gas"]["tde"])

    phi0 = float(res["porosity"])
    t_scalar, tde_scalar = run(phi0)
    t_const, tde_const = run(np.full((Nz, Ny, Nx), phi0, np.float32))
    np.testing.assert_allclose(t_const, t_scalar, rtol=1e-5)
    np.testing.assert_allclose(tde_const, tde_scalar, rtol=1e-5)

    phi = np.full((Nz, Ny, Nx), phi0, np.float32)
    phi[:, :, : Nx // 2] *= 0.25              # low-storage western half
    t_het, tde_het = run(phi)
    assert np.isfinite(t_het)
    assert not np.isclose(tde_het, tde_scalar, rtol=1e-2), (tde_het, tde_scalar)


@pytest.mark.slow
def test_per_term_grad_norms(dg13_case):
    """Per-loss-term gradient-norm diagnostics (VERDICT r3 item 8; reference
    returns 8 per-term gradients, ref physics_loss.py:849-859): active
    physics terms have non-zero norms, zeroed terms (dbc/ic in physics mode)
    have exactly zero."""
    case = dg13_case
    x, y = case["train_groups"][0]
    xb = jnp.asarray(x[:2, 0])
    yb = {k: jnp.asarray(v[:2, 0]) for k, v in y.items()}
    norms = case["loss_fn"].per_term_grad_norms(case["params"], xb, yb)
    assert set(norms) == {f"gas/{t}" for t in
                          ("dom", "dbc", "nbc", "ibc", "ic", "mbc", "cmbc",
                           "tde", "td")}
    assert all(np.isfinite(v) for row in norms.values() for v in row.values())
    assert norms["gas/dom"]["pressure"] > 0.0
    assert norms["gas/tde"]["time_step"] > 0.0
    assert norms["gas/dbc"]["pressure"] == 0.0
    assert norms["gas/ic"]["pressure"] == 0.0
