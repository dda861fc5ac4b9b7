"""Auxiliary-subsystem tests: Eclipse parsers, optimizers, checkpointing,
plotting, timestep diagnostics."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from srm_tpu.data.pipeline import (
    parse_tabular_file, parse_continuous_file, reshape_array, convert_target_spec,
    stack_realizations, save_results,
)
from srm_tpu.training.optimizers import build_optimizer_from_config
from srm_tpu.config import get_optimizer_config


# --------------------------------------------------------------------------
# Eclipse-style parsers (ref simulation_data_process_pipeline.py:148-291)
# --------------------------------------------------------------------------
RSM_SAMPLE = """SUMMARY OF RUN
\tTIME\tWGPR\tWBHP
\tDAYS\tMSCF/DAY\tPSIA
\t\tP1\tP1
\t1.0\t500.0\t4500.0
\t2.0\t480.0\t4450.0

"""

FUNRST_SAMPLE = """'PRESSURE'
 5000.0 4999.0 4998.0 4997.0
'SGAS'
 0.78 0.78 0.77 0.76
'PRESSURE'
 4900.0 4890.0 4880.0 4870.0
"""


def test_parse_tabular():
    out = parse_tabular_file(RSM_SAMPLE, [["TIME"], "WGPR", "WBHP"])
    np.testing.assert_allclose(out["TIME"], [1.0, 2.0])
    np.testing.assert_allclose(out["WGPR"], [500.0, 480.0])
    np.testing.assert_allclose(out["WBHP"], [4500.0, 4450.0])


def test_parse_continuous():
    out = parse_continuous_file(FUNRST_SAMPLE, ["PRESSURE", "SGAS"])
    assert len(out["PRESSURE"]) == 2
    np.testing.assert_allclose(out["PRESSURE"][0], [5000, 4999, 4998, 4997])
    np.testing.assert_allclose(out["SGAS"][0], [0.78, 0.78, 0.77, 0.76])


def test_reshape_array_fortran():
    arr = np.arange(12.0)
    out = reshape_array(arr, (3, 4))
    assert out.shape == (3, 4)
    # Fortran order: first axis fastest
    assert out[1, 0] == 1.0 and out[0, 1] == 3.0


def test_convert_target_spec_compound():
    spec = convert_target_spec([["TIME"], ["WOPR", "15 15 1"], "WGPR"])
    assert spec["TIME"] == ["TIME"]
    assert "15 15 1" in spec["WOPR"]
    assert spec["WGPR"] == ["WGPR"]


def test_stack_and_save(tmp_path):
    per_file = {
        "r1.FUNRST": {"PRESSURE": np.ones((2, 3, 3))},
        "r0.FUNRST": {"PRESSURE": np.zeros((2, 3, 3))},
    }
    stacked = stack_realizations(per_file)
    assert stacked["PRESSURE"].shape == (2, 2, 3, 3)
    # sorted by filename: r0 first
    assert stacked["PRESSURE"][0].sum() == 0
    path = save_results(stacked, str(tmp_path))
    assert os.path.isfile(path)
    assert os.path.isfile(os.path.join(str(tmp_path), "summary.json"))


# --------------------------------------------------------------------------
# Optimizers (ref training.py:282-364)
# --------------------------------------------------------------------------
def test_optimizer_configs_build_and_step():
    for role in ["pressure", "time_step", "fluid_property", "saturation"]:
        opt = build_optimizer_from_config(get_optimizer_config(role))
        params = {"w": jnp.ones((3, 3))}
        state = opt.init(params)
        grads = {"w": jnp.ones((3, 3))}
        updates, state = opt.update(grads, state, params)
        new = optax.apply_updates(params, updates)
        assert np.isfinite(np.asarray(new["w"])).all()
        assert not np.allclose(np.asarray(new["w"]), 1.0)


def test_lr_decay_schedule_applied():
    cfg = get_optimizer_config("pressure")  # lr decay enabled, steps=25, rate=0.9
    opt = build_optimizer_from_config(cfg)
    params = {"w": jnp.ones(4)}
    state = opt.init(params)
    g = {"w": jnp.ones(4)}
    # step sizes should shrink over time due to the exponential lr decay
    p = params
    deltas = []
    for i in range(50):
        updates, state = opt.update(g, state, p)
        deltas.append(float(jnp.abs(updates["w"]).mean()))
        p = optax.apply_updates(p, updates)
    assert deltas[-1] < deltas[1]


# --------------------------------------------------------------------------
# Checkpointing (new capability; SURVEY §5.4)
# --------------------------------------------------------------------------
def test_checkpoint_roundtrip(tmp_path):
    from srm_tpu.utils.checkpoint import CheckpointManager
    params = {"pressure": {"w": jnp.arange(4.0)}}
    opt_state = {"pressure": {"count": jnp.asarray(3)}}
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
    assert mgr.save(1, params, opt_state, history={"total_train_loss": [1.0, 0.5]})
    mgr.wait_until_finished()
    restored = mgr.restore()
    assert restored is not None
    r_params, r_opt, history, step = restored
    assert step == 1
    np.testing.assert_allclose(np.asarray(r_params["pressure"]["w"]), [0, 1, 2, 3])
    mgr.close()


# --------------------------------------------------------------------------
# Timestep diagnostics (ref plot_tools/plot_timestep_log.py)
# --------------------------------------------------------------------------
def test_timestep_recorder_and_parser(tmp_path):
    from srm_tpu.eval.timestep_log import TimestepRecorder, parse_timestep_log, plot_timesteps
    rec = TimestepRecorder()
    for i in range(20):
        rec.record(i, np.random.RandomState(i).uniform(1, 9, 32))
    s = rec.summary()
    assert 1.0 <= s["min"] <= s["mean"] <= s["max"] <= 9.0

    logf = tmp_path / "tensor_log.txt"
    logf.write_text('step 0 values: "1.5 2.5 3.5"\nstep 1 values: "2.0 4.0"\n')
    rows = parse_timestep_log(str(logf))
    assert len(rows) == 2
    np.testing.assert_allclose(rows[0], [1.5, 2.5, 3.5])

    fig = plot_timesteps(rec, save_path=str(tmp_path / "ts.png"))
    assert os.path.isfile(tmp_path / "ts.png")


def test_make_mesh_invalid_spatial_raises():
    import pytest as _pytest
    from srm_tpu.parallel.mesh import make_mesh
    with _pytest.raises(ValueError, match="not divisible"):
        make_mesh(n_devices=1, spatial=3)


def test_shard_batch_replication_fallback_warns(caplog):
    """An indivisible batch silently replicating across the mesh was VERDICT
    r2 weak item 4 — it must now log the perf cliff."""
    import logging
    import jax.numpy as jnp
    from srm_tpu.parallel.mesh import make_mesh, shard_batch

    mesh = make_mesh()          # all virtual CPU devices (conftest forces 8)
    if mesh.size == 1:
        import pytest as _pytest
        _pytest.skip("needs a multi-device mesh")
    bad = jnp.zeros((mesh.size + 1, 4, 4))       # not divisible by data axis
    with caplog.at_level(logging.WARNING, logger="srm_tpu.parallel.mesh"):
        shard_batch(bad, mesh)
    assert any("REPLICATING" in r.message for r in caplog.records)
    caplog.clear()
    good = jnp.zeros((mesh.size * 2, 4, 4))
    with caplog.at_level(logging.WARNING, logger="srm_tpu.parallel.mesh"):
        shard_batch(good, mesh)
    assert not any("REPLICATING" in r.message for r in caplog.records)


def test_validate_loss_keys_called_in_unified_driver():
    """train_combined_models_unified must fail fast (clear assertion, before
    any tracing) on a data-mode label dict that can't cover the td terms."""
    import copy

    import pytest as _pytest
    from srm_tpu.config import DEFAULT_GENERAL_CONFIG
    from srm_tpu.training.trainer import train_combined_models_unified

    class _FakeLoss:
        loss_keys = {"gas": ["dom_g", "td_g"]}
        physics_mode_fraction = 0.0
        trainable_models_keys = ("pressure",)

    g = copy.deepcopy(DEFAULT_GENERAL_CONFIG)
    g["physics_mode_fraction"] = 0.0
    import numpy as np
    x = np.zeros((4, 1, 5, 5, 5), np.float32)
    with _pytest.raises(AssertionError, match="td terms"):
        train_combined_models_unified(
            [(x, {})], [], loss_fn=_FakeLoss(), params={},
            training_batch_size=2, epochs=1, verbose=0, general_config=g)


def test_production_overrides():
    from srm_tpu.config import (DEFAULT_GENERAL_CONFIG,
                                TPU_PRODUCTION_OVERRIDES,
                                apply_production_overrides)
    g = apply_production_overrides(DEFAULT_GENERAL_CONFIG)
    assert g["compute_dtype"] == "bfloat16"
    assert g["dt_input_stride"] == 2
    # explicit user settings win
    import copy
    g2 = copy.deepcopy(DEFAULT_GENERAL_CONFIG)
    g2["compute_dtype"] = "float32"
    g2["training_batch_size"] = 64          # non-default: user's choice wins
    out2 = apply_production_overrides(g2)
    assert out2["compute_dtype"] == "float32"
    assert out2["training_batch_size"] == 64
    # the promoted high-MFU batch (VERDICT r4 item 2: 23.8% MFU at b128 vs
    # 21.1% at b32; accuracy gate 21.72 vs 25.50 psia —
    # tools/results_rmse_srm_tpu_production_b128_d62.json) replaces the
    # reference-default batch when the user left it at the default
    assert g["training_batch_size"] == 128
    # the shipped defaults themselves are untouched
    assert DEFAULT_GENERAL_CONFIG["compute_dtype"] is None
    assert DEFAULT_GENERAL_CONFIG["training_batch_size"] == 32
    assert set(TPU_PRODUCTION_OVERRIDES) == {
        "compute_dtype", "dt_input_stride", "training_batch_size"}


def test_production_optimizer_configs():
    # the production profile ships the retuned LR decay (25.5 psia vs 31.8
    # with the reference's 25-step schedule — BASELINE.md round 4); the
    # drawdown recipe shares it; defaults stay at the reference's schedule
    from srm_tpu.config import (DEFAULT_OPTIMIZER_CONFIGS,
                                PRODUCTION_DECAY_STEPS,
                                drawdown_optimizer_configs,
                                production_decay_steps,
                                production_optimizer_configs)
    assert PRODUCTION_DECAY_STEPS == 250
    # the decay is a ~8000-SAMPLE period, batch-invariant (round 5):
    # 250 steps at the reference batch 32, 62 at the promoted batch 128
    assert production_decay_steps(32) == 250
    assert production_decay_steps(128) == 62
    assert production_decay_steps() == 62       # default = production batch
    cfgs = production_optimizer_configs(batch_size=32)
    n_decaying = 0
    for name, cfg in cfgs.items():
        lr = cfg.get("exponential_decay", {}).get("learning_rate")
        ref = DEFAULT_OPTIMIZER_CONFIGS[name].get(
            "exponential_decay", {}).get("learning_rate")
        if lr and lr.get("enabled"):
            n_decaying += 1
            assert lr["decay_steps"] == 250
            assert ref["decay_steps"] in (25, 100)  # defaults untouched
    assert n_decaying > 0
    # the GC drawdown recipe was measured at b32 and keeps that schedule
    assert drawdown_optimizer_configs() == cfgs


# --------------------------------------------------------------------------
# Real-format golden fixtures (VERDICT r3 item 7): a multi-segment .RSM with
# compound well-cell targets and a keyword-block .FUNRST, committed under
# tests/golden/. Expectations are hand-derived from the files.
# --------------------------------------------------------------------------
GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def test_rsm_golden_multisegment():
    with open(os.path.join(GOLDEN, "sample.RSM")) as f:
        text = f.read()
    out = parse_tabular_file(
        text, [["TIME"], "WGPR", "WBHP", ["WOPR", "15 15 1"], ["WOPR", "22 3 1"]])
    # TIME spans all three segments, concatenated in document order
    np.testing.assert_allclose(out["TIME"],
                               [1, 5, 10, 1, 5, 10, 20, 30])
    # WGPR appears in segments 1 and 3 only
    np.testing.assert_allclose(out["WGPR"],
                               [5000, 4800, 4650, 4400, 4210])
    np.testing.assert_allclose(out["WBHP"],
                               [4500, 4420, 4350, 4210, 4100])
    # compound targets disambiguate the two WOPR columns by well cell
    np.testing.assert_allclose(out["WOPR"]["15 15 1"],
                               [120.5, 118.2, 115.9, 112.0, 108.8])
    np.testing.assert_allclose(out["WOPR"]["22 3 1"], [20.1, 19.7, 19.2])


def test_funrst_golden_blocks():
    with open(os.path.join(GOLDEN, "sample.FUNRST")) as f:
        text = f.read()
    out = parse_continuous_file(text, ["PRESSURE", "SGAS", "SWAT"])
    assert len(out["PRESSURE"]) == 2          # two report steps
    np.testing.assert_allclose(
        out["PRESSURE"][0], [5000.0, 4999.1, 4998.2, 4997.3, 4996.4, 4995.5])
    np.testing.assert_allclose(
        out["PRESSURE"][1], [4899.9, 4889.8, 4879.7, 4869.6, 4859.5, 4849.4])
    np.testing.assert_allclose(
        out["SGAS"][0], [0.78, 0.7799, 0.7795, 0.7791, 0.7788, 0.7784])
    assert len(out["SWAT"]) == 1


def test_finite_difference_derivative():
    """Matches the analytic derivative and scrubs non-finite entries
    (ref auxiliary_functions.py:80-109)."""
    import jax.numpy as jnp
    import numpy as np
    from srm_tpu.utils.numerics import finite_difference_derivative

    x = jnp.linspace(0.5, 2.0, 7)
    d = finite_difference_derivative(x, lambda v: v ** 2, grid_spacing=1e-3)
    np.testing.assert_allclose(np.asarray(d), 2 * np.asarray(x), rtol=1e-3)
    # forward difference, multi-output callable → stacked leading axis
    d2 = finite_difference_derivative(
        x, lambda v: (v ** 2, jnp.sin(v)), diff_type="forward", grid_spacing=1e-4)
    assert d2.shape == (2, 7)
    np.testing.assert_allclose(np.asarray(d2[1]), np.cos(np.asarray(x)), atol=1e-3)
    # 1/x blows up at 0 → scrubbed to zero, not NaN/Inf
    d3 = finite_difference_derivative(jnp.asarray([0.0]), lambda v: 1.0 / v,
                                      grid_spacing=1.0)
    assert np.isfinite(np.asarray(d3)).all()


def test_l1_normalize_excluding_index():
    """The excluded slice keeps its values; the rest L1-normalize over the
    axis (ref data_processing_utils.py:1209-1241)."""
    import numpy as np
    from srm_tpu.utils.numerics import l1_normalize_excluding_index

    t = np.array([[1.0, -2.0, 3.0], [0.0, 0.0, 5.0]])
    out = np.asarray(l1_normalize_excluding_index(t, axis=1, exclude_index=2))
    # row 0: |1| + |-2| = 3 → [1/3, -2/3, kept 3]
    np.testing.assert_allclose(out[0], [1 / 3, -2 / 3, 3.0], rtol=1e-6)
    # row 1: zero norm → divide_no_nan semantics (zeros), excluded kept
    np.testing.assert_allclose(out[1], [0.0, 0.0, 5.0])
    # negative axis resolves
    out2 = np.asarray(l1_normalize_excluding_index(t, axis=-1, exclude_index=2))
    np.testing.assert_allclose(out2, out)
