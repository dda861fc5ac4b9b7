"""Mode coverage: Pallas-fused loss vs jnp loss, supervised (data) mode,
and loss-key validation."""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def small_case(dg13_case):
    return dg13_case


@pytest.mark.slow
def test_pallas_loss_matches_jnp_loss(small_case):
    """PhysicsLoss with use_pallas_stencil=True reproduces the jnp residual
    losses (interpret mode on CPU; compiled Mosaic on TPU)."""
    from srm_tpu.losses.physics_loss import PhysicsLoss
    base = small_case["loss_fn"]
    pallas_loss = PhysicsLoss(base.models, base.data_summary,
                              general_config=base.general_config,
                              reservoir_config=base.reservoir_config,
                              wells_config=base.wells_config, fluid_type="DG",
                              use_pallas_stencil=True)
    x, y = small_case["train_groups"][0]
    xb = jnp.asarray(x[:2, 0])
    yb = {k: jnp.asarray(v[:2, 0]) for k, v in y.items()}
    t_ref, aux_ref = base.loss_and_metrics(small_case["params"], xb, yb)
    t_pal, aux_pal = pallas_loss.loss_and_metrics(small_case["params"], xb, yb)
    # fused-program vs op-by-op FMA/reassociation bounds the achievable
    # agreement at ~1e-3 relative (backend-dependent); tde is excluded since
    # its Richardson numerator cancels algebraically (pure f32 noise)
    assert float(t_pal) == pytest.approx(float(t_ref), rel=1e-3)
    for term in ("dom", "ibc", "mbc"):
        assert float(aux_pal["gas"][term]) == pytest.approx(
            float(aux_ref["gas"][term]), rel=5e-3), term
    assert np.isfinite(float(aux_pal["gas"]["tde"]))
    # gradients flow through the kernel's custom vjp
    _, grads, _ = pallas_loss.pinn_batch_sse_grad(small_case["params"], xb, yb)
    leaves = jax.tree_util.tree_leaves(grads["pressure"])
    assert sum(float(jnp.sum(jnp.abs(l))) for l in leaves) > 0


@pytest.mark.slow
def test_pallas_gc_loss_matches_jnp_loss(gc13_case):
    """GC PhysicsLoss with use_pallas_stencil=True reproduces the jnp
    two-phase residual losses (interpret mode on CPU; Mosaic on TPU)."""
    from srm_tpu.losses.physics_loss import PhysicsLoss

    g, proc, ds = gc13_case["g"], gc13_case["proc"], gc13_case["ds"]
    models, params = gc13_case["models"], gc13_case["params"]
    mk = lambda pallas: PhysicsLoss(  # noqa: E731
        models, ds, general_config=g, reservoir_config=proc.reservoir_config,
        wells_config=proc.wells_config, fluid_type="GC",
        use_pallas_stencil=pallas)
    base, pal = mk(False), mk(True)
    x, y = gc13_case["train_groups"][0]
    xb = jnp.asarray(x[:2, 0])
    yb = {k: jnp.asarray(v[:2, 0]) for k, v in y.items()}
    t_ref, aux_ref = base.loss_and_metrics(params, xb, yb)
    t_pal, aux_pal = pal.loss_and_metrics(params, xb, yb)
    assert float(t_pal) == pytest.approx(float(t_ref), rel=1e-4)
    for ph in ("gas", "oil"):
        # tde is excluded: its Richardson numerator cancels algebraically
        # (mg2 is extrapolated with the same t2/t1 ratio), so the term is
        # f32 roundoff noise whose value depends on summation order
        for term in ("dom", "ibc", "mbc"):
            assert float(aux_pal[ph][term]) == pytest.approx(
                float(aux_ref[ph][term]), rel=1e-3), (ph, term)
        assert np.isfinite(float(aux_pal[ph]["tde"]))
    _, grads, _ = pal.pinn_batch_sse_grad(params, xb, yb)
    for key in ("pressure", "saturation"):
        leaves = jax.tree_util.tree_leaves(grads[key])
        assert sum(float(jnp.sum(jnp.abs(l))) for l in leaves) > 0, key


def test_data_mode_supervised_training(small_case):
    """physics_mode_fraction = 0: supervised regression on labels only
    (ref zeros_like_pinn_error path, physics_loss.py:716-729)."""
    from srm_tpu.losses.physics_loss import PhysicsLoss
    from srm_tpu.training.trainer import Trainer
    base = small_case["loss_fn"]
    g = copy.deepcopy(base.general_config)
    g["physics_mode_fraction"] = 0.0
    data_loss = PhysicsLoss(base.models, base.data_summary, general_config=g,
                            reservoir_config=base.reservoir_config,
                            wells_config=base.wells_config, fluid_type="DG")
    assert data_loss.physics_mode_fraction == 0.0

    x, _ = small_case["train_groups"][0]
    xb = x[0, :8]   # one realization, 8 distinct times (t0 alone would make
                    # the hard-IC prediction equal the label exactly)
    # synthetic pressure labels: a smooth function of time
    y_lab = {"PRESSURE": 5000.0 - 100.0 * (xb[..., 3] + 1.0)}
    total, aux = data_loss.loss_and_metrics(small_case["params"], jnp.asarray(xb),
                                            {k: jnp.asarray(v) for k, v in y_lab.items()})
    assert np.isfinite(float(total))
    assert float(aux["gas"]["dom"]) == 0.0        # physics terms zeroed
    assert float(aux["gas"]["td"]) > 0.0           # data term live

    tr = Trainer(data_loss, small_case["params"], donate_params=False)
    first = last = None
    for _ in range(10):
        m = tr.train_step(xb, y_lab)
        v = float(m["total"])
        first = v if first is None else first
        last = v
    assert last < first


def test_td_weight_override_rebalances_mixed_mode(small_case):
    """An overridden ``default_weights[ph]['td']`` propagates into PhysicsLoss
    and scales the mixed-mode data term — the ``--sg-td-weight`` lever in
    tools/rmse_experiment.py (equal td weights let the pressure SSE drown the
    GC Sg SSE by ~1e5x, since p errors are O(10 psia) vs Sg's O(0.05))."""
    from srm_tpu.losses.physics_loss import PhysicsLoss
    base = small_case["loss_fn"]

    def mk(td_weight=None):
        g = copy.deepcopy(base.general_config)
        g["physics_mode_fraction"] = 0.5
        if td_weight is not None:
            g["default_weights"]["gas"]["td"] = td_weight
        return PhysicsLoss(base.models, base.data_summary, general_config=g,
                           reservoir_config=base.reservoir_config,
                           wells_config=base.wells_config, fluid_type="DG")

    loss_w, loss_1 = mk(40.0), mk()
    assert loss_w.weights["gas"]["td"] == 40.0
    x, _ = small_case["train_groups"][0]
    xb = jnp.asarray(x[0, :4])
    yb = {"PRESSURE": jnp.zeros(xb.shape[:-1] + (1,))}
    _, aux_w = loss_w.loss_and_metrics(small_case["params"], xb, yb)
    _, aux_1 = loss_1.loss_and_metrics(small_case["params"], xb, yb)
    # default td weight 0 falls back to 1 in non-pure-physics modes, so the
    # override must scale the td term by exactly 40x; physics terms unchanged
    assert float(aux_w["gas"]["td"]) == pytest.approx(
        40.0 * float(aux_1["gas"]["td"]), rel=1e-6)
    assert float(aux_1["gas"]["td"]) > 0.0
    assert float(aux_w["gas"]["dom"]) == pytest.approx(
        float(aux_1["gas"]["dom"]), rel=1e-6)


def test_td_normalization_balance_equalizes_gc_td_scales(gc13_case):
    """``td_loss_normalization``: "balance" leaves the pressure td term
    unchanged and rescales the Sg td error to the pressure label's batch std
    (closing the ~1e7x psia-vs-fraction scale gap that let the pressure
    SSE drown the Sg label gradient); "label_std" makes every td error
    relative. Raw mode is reference parity."""
    from srm_tpu.losses.physics_loss import PhysicsLoss

    g0, proc, ds = gc13_case["g"], gc13_case["proc"], gc13_case["ds"]
    models, params = gc13_case["models"], gc13_case["params"]

    def mk(norm):
        g = copy.deepcopy(g0)
        g["physics_mode_fraction"] = 0.5
        g["td_loss_normalization"] = norm
        return PhysicsLoss(models, ds, general_config=g,
                           reservoir_config=proc.reservoir_config,
                           wells_config=proc.wells_config, fluid_type="GC",
                           use_pallas_stencil=False)

    raw, bal, rel = mk(None), mk("balance"), mk("label_std")
    x, _ = gc13_case["train_groups"][0]
    # mid-trajectory samples: at the very first time index the HardLayer ramp
    # alpha_t is exactly 0, which zeroes every net gradient by construction
    xb = jnp.asarray(x[0, 20:22])
    # synthetic labels with known, very different scales
    rng = np.random.RandomState(1)
    shape = xb.shape[:-1] + (1,)
    p_lab = 4000.0 + 150.0 * rng.randn(*shape)
    s_lab = 0.8 + 0.01 * rng.randn(*shape)
    yb = {"PRESSURE": jnp.asarray(p_lab), "SGAS": jnp.asarray(s_lab)}
    std_p, std_s = float(np.std(p_lab)), float(np.std(s_lab))

    _, aux_raw = raw.loss_and_metrics(params, xb, yb)
    _, aux_bal = bal.loss_and_metrics(params, xb, yb)
    _, aux_rel = rel.loss_and_metrics(params, xb, yb)

    # balance: pressure unchanged, Sg scaled by (std_p / std_s)^2
    assert float(aux_bal["gas"]["td"]) == pytest.approx(
        float(aux_raw["gas"]["td"]), rel=1e-6)
    assert float(aux_bal["oil"]["td"]) == pytest.approx(
        float(aux_raw["oil"]["td"]) * (std_p / std_s) ** 2, rel=1e-4)
    # label_std: each term scaled by its own 1/std^2
    assert float(aux_rel["gas"]["td"]) == pytest.approx(
        float(aux_raw["gas"]["td"]) / std_p ** 2, rel=1e-4)
    assert float(aux_rel["oil"]["td"]) == pytest.approx(
        float(aux_raw["oil"]["td"]) / std_s ** 2, rel=1e-4)
    # physics terms untouched by td scaling
    assert float(aux_bal["oil"]["dom"]) == pytest.approx(
        float(aux_raw["oil"]["dom"]), rel=1e-6)
    # after balancing, the two td terms are within a few orders of magnitude
    # (raw mode: ~7 orders apart)
    r_bal = float(aux_bal["gas"]["td"]) / float(aux_bal["oil"]["td"])
    r_raw = float(aux_raw["gas"]["td"]) / float(aux_raw["oil"]["td"])
    assert r_raw > 1e4 and 1e-4 < r_bal < 1e4

    # in data-only mode (td is the sole term) the saturation net now receives
    # a materially larger label gradient; at f=0.5 the comparison is masked by
    # the physics terms, which dwarf td at an untrained init
    def mk_data(norm_mode):
        g = copy.deepcopy(g0)
        g["physics_mode_fraction"] = 0.0
        g["td_loss_normalization"] = norm_mode
        return PhysicsLoss(models, ds, general_config=g,
                           reservoir_config=proc.reservoir_config,
                           wells_config=proc.wells_config, fluid_type="GC",
                           use_pallas_stencil=False)

    _, grads_raw, _ = mk_data(None).pinn_batch_sse_grad(params, xb, yb)
    _, grads_bal, _ = mk_data("balance").pinn_batch_sse_grad(params, xb, yb)
    norm = lambda g: sum(  # noqa: E731
        float(jnp.sum(jnp.abs(l))) for l in jax.tree_util.tree_leaves(g))
    assert norm(grads_bal["saturation"]) > 100.0 * norm(grads_raw["saturation"])


def test_sg_td_focus_tilts_label_gradient_to_dropout_cells(gc13_case):
    """``sg_td_focus``: per-pixel dropout-focus weighting of the Sg td error.

    Properties pinned: (1) beta composes as a no-op when the label deviation
    |Sg - Sgi| is spatially uniform (mean-1 normalization is exact); (2) for
    localized dropout labels, the weighted Sg SSE strictly exceeds the raw
    one (the untrained net predicts ~Sgi, so errors concentrate exactly where
    the focus weight is largest — positive covariance); (3) the pressure td
    term and every physics term are untouched."""
    from srm_tpu.losses.physics_loss import PhysicsLoss

    g0, proc, ds = gc13_case["g"], gc13_case["proc"], gc13_case["ds"]
    models, params = gc13_case["models"], gc13_case["params"]

    def mk(beta):
        g = copy.deepcopy(g0)
        g["physics_mode_fraction"] = 0.0       # td is the sole loss term
        g["sg_td_focus"] = beta
        return PhysicsLoss(models, ds, general_config=g,
                           reservoir_config=proc.reservoir_config,
                           wells_config=proc.wells_config, fluid_type="GC",
                           use_pallas_stencil=False)

    raw, foc = mk(None), mk(4.0)
    sgi = float(raw.Sgi)
    x, _ = gc13_case["train_groups"][0]
    xb = jnp.asarray(x[0, 20:22])
    shape = xb.shape[:-1] + (1,)
    rng = np.random.RandomState(3)
    p_lab = jnp.asarray(4000.0 + 150.0 * rng.randn(*shape))

    # uniform deviation: every cell at Sgi - 0.03 -> focus must be a no-op
    s_uni = jnp.full(shape, sgi - 0.03)
    _, aux_r = raw.loss_and_metrics(params, xb, {"PRESSURE": p_lab, "SGAS": s_uni})
    _, aux_f = foc.loss_and_metrics(params, xb, {"PRESSURE": p_lab, "SGAS": s_uni})
    assert float(aux_f["oil"]["td"]) == pytest.approx(
        float(aux_r["oil"]["td"]), rel=1e-5)

    # localized dropout: a few cells well below Sgi, the rest at Sgi
    s_loc = np.full(shape, sgi, np.float32)
    s_loc[:, :, 3:5, 3:5, :] = sgi - 0.3
    y_loc = {"PRESSURE": p_lab, "SGAS": jnp.asarray(s_loc)}
    _, aux_r = raw.loss_and_metrics(params, xb, y_loc)
    _, aux_f = foc.loss_and_metrics(params, xb, y_loc)
    # exact decomposition: aux oil td == mean(w_pix * err^2) with
    # w_pix = (1 + beta*dev/mean(dev)) / (1 + beta), dev = |lab - Sgi|,
    # err from the model's own Sg output (identical params in both runs)
    pred = np.asarray(aux_r["outputs"]["Sg_n0"]).reshape(s_loc.shape)
    err2 = (pred - s_loc) ** 2
    dev = np.abs(s_loc - sgi)
    w = (1.0 + 4.0 * dev / dev.mean()) / (1.0 + 4.0)
    assert w.mean() == pytest.approx(1.0, rel=1e-6)
    assert float(aux_f["oil"]["td"]) == pytest.approx(
        float(np.mean(w * err2)), rel=1e-4)
    assert float(aux_r["oil"]["td"]) == pytest.approx(
        float(np.mean(err2)), rel=1e-4)
    # the dropout cells' share of the Sg label SSE rises under focus —
    # the per-pixel gradient tilts onto the cells with real dropout signal
    m = np.zeros_like(w, bool)
    m[:, :, 3:5, 3:5, :] = True
    share_raw = err2[m].sum() / err2.sum()
    share_foc = (w * err2)[m].sum() / (w * err2).sum()
    assert share_foc > share_raw
    # pressure td untouched
    assert float(aux_f["gas"]["td"]) == pytest.approx(
        float(aux_r["gas"]["td"]), rel=1e-6)


def test_validate_loss_keys(small_case):
    from srm_tpu.training.trainer import validate_loss_keys
    loss_fn = small_case["loss_fn"]
    # physics mode: validation is skipped regardless
    validate_loss_keys({"PRESSURE": np.zeros((4, 2))}, loss_fn.loss_keys,
                       {"physics_mode_fraction": 1.0})
    # data mode: label keys must cover the td terms
    with pytest.raises(AssertionError):
        validate_loss_keys({}, loss_fn.loss_keys, {"physics_mode_fraction": 0.0})
    validate_loss_keys({"PRESSURE": np.zeros((4, 2))}, loss_fn.loss_keys,
                       {"physics_mode_fraction": 0.0})


def test_dt_input_stride_loss_and_grads(small_case):
    """dt_input_stride=2 runs the Δt net on a strided grid; the loss stays
    finite, gradients still reach the Δt net, and the Δt bounds hold."""
    from srm_tpu.losses.physics_loss import PhysicsLoss

    base = small_case["loss_fn"]
    g = copy.deepcopy(base.general_config)
    g["dt_input_stride"] = 2
    lf = PhysicsLoss(base.models, base.data_summary, general_config=g,
                     reservoir_config=base.reservoir_config,
                     wells_config=base.wells_config, fluid_type="DG",
                     use_pallas_stencil=False)
    x, y = small_case["train_groups"][0]
    xb = jnp.asarray(x[:2, 0])
    yb = {k: jnp.asarray(v[:2, 0]) for k, v in y.items()}
    aux, grads, total = lf.pinn_batch_sse_grad(small_case["params"], xb, yb)
    assert np.isfinite(float(total))
    leaves = jax.tree_util.tree_leaves(grads["time_step"])
    assert sum(float(jnp.sum(jnp.abs(l))) for l in leaves) > 0
    tstep = float(jnp.mean(aux["outputs"]["tstep"]))
    assert 0.1 <= tstep <= 10.0


def test_polynomial_pvt_is_trainable(small_case):
    """VERDICT r4 item 5: with the polynomial PVT backend, 'fluid_property'
    joins the trainable set (ref default_configurations.py:420-433 maps it to
    pvt_model and training.py:643-652 applies its gradient; the coefficients
    are trainable weights, ref PVT_Layer_Subclassed.py:108-116) and a train
    step moves the coefficients. The spline backend stays frozen."""
    from srm_tpu.losses.physics_loss import PhysicsLoss
    from srm_tpu.nn.modules import build_model_map
    from srm_tpu.training.trainer import Trainer

    # shipped default (spline backend): solved once at init, no flax params,
    # and 'fluid_property' is NOT a trainable key
    base = small_case["loss_fn"]
    assert "fluid_property" not in base.trainable_models_keys
    assert not jax.tree_util.tree_leaves(small_case["params"]["pvt_model"])

    proc = small_case["processor"]
    g = copy.deepcopy(base.general_config)
    g["pvt_fitting_method"] = "polynomial"
    models, params = build_model_map(
        small_case["train_groups"][0][0].shape, fluid_type="DG",
        general_config=g, reservoir_config=proc.reservoir_config,
        wells_config=proc.wells_config, data_summary=base.data_summary)
    loss = PhysicsLoss(models, base.data_summary, general_config=g,
                       reservoir_config=proc.reservoir_config,
                       wells_config=proc.wells_config, fluid_type="DG",
                       use_pallas_stencil=False)
    assert "fluid_property" in loss.trainable_models_keys

    trainer = Trainer(loss, params)
    assert "fluid_property" in trainer.optimizer_keys
    before = jax.device_get(trainer.params["pvt_model"])
    x, y = small_case["train_groups"][0]
    xb = np.asarray(x[:4, 0])
    yb = {k: np.asarray(v[:4, 0]) for k, v in y.items()}
    metrics = trainer.train_step(xb, yb)
    assert np.isfinite(float(metrics["total"]))
    after = jax.device_get(trainer.params["pvt_model"])
    deltas = [float(np.abs(np.asarray(a) - np.asarray(b)).max())
              for a, b in zip(jax.tree_util.tree_leaves(after),
                              jax.tree_util.tree_leaves(before))]
    assert deltas and max(deltas) > 0, "polynomial PVT coefficients did not move"
