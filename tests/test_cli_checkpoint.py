"""CLI + trainer checkpoint/resume integration tests."""

import os

import numpy as np
import pytest


def test_cli_generate_data(tmp_path):
    from srm_tpu.__main__ import main
    rc = main(["generate-data", "--base-dir", str(tmp_path), "--realizations", "4",
               "--no-dat"])
    assert rc in (0, None)
    roots = os.listdir(tmp_path / "static_dynamic")
    assert roots and roots[0].startswith("KLE_39x39x1_R4")


@pytest.mark.slow
def test_trainer_checkpoint_and_resume(tmp_path, dg9_case):
    from srm_tpu.training.trainer import train_combined_models_unified

    case = dg9_case
    ckpt_dir = str(tmp_path / "ckpt")
    params1, hist1, _ = train_combined_models_unified(
        case["train_groups"], case["val_groups"], models=case["models"],
        params=case["params"], loss_fn=case["loss_fn"],
        training_batch_size=25, epochs=1, verbose=0,
        general_config=case["general_config"],
        checkpoint_dir=ckpt_dir, log_epoch_percentage=0.0)
    assert os.path.isdir(ckpt_dir) and os.listdir(ckpt_dir)

    # resume continues from epoch 1 and only runs the remaining epoch
    params2, hist2, _ = train_combined_models_unified(
        case["train_groups"], case["val_groups"], models=case["models"],
        params=case["params"], loss_fn=case["loss_fn"],
        training_batch_size=25, epochs=2, verbose=0,
        general_config=case["general_config"],
        checkpoint_dir=ckpt_dir, resume=True, log_epoch_percentage=0.0)
    assert len(hist2["total_train_loss"]) == 1
    assert np.isfinite(hist2["total_train_loss"][0])


def test_drawdown_preset_config():
    """The GC drawdown preset IS the measured recipe (BASELINE.md round-3
    GC drawdown table): mixed physics/data on FV labels, balanced td
    errors, the 'abs' Sg rectifier, retuned LR decay, sub-dew-point case."""
    from srm_tpu.config import (DEFAULT_GENERAL_CONFIG, GC_DRAWDOWN_CASE,
                                GC_DRAWDOWN_DECAY_STEPS,
                                apply_drawdown_overrides,
                                drawdown_optimizer_configs)

    g = apply_drawdown_overrides(DEFAULT_GENERAL_CONFIG)
    assert g["fluid_type"] == "GC"
    assert g["label_source"] == "simulator"
    assert g["physics_mode_fraction"] == 0.5
    assert g["td_loss_normalization"] == "balance"
    assert g["sat_input_activation"] == "abs"
    # the input config is never mutated
    assert DEFAULT_GENERAL_CONFIG["fluid_type"] == "DG"
    assert DEFAULT_GENERAL_CONFIG.get("sat_input_activation") is None

    assert GC_DRAWDOWN_CASE == {"pi": 4300.0, "min_bhp": 2000.0}
    retuned = 0
    for cfg in drawdown_optimizer_configs().values():
        lr = cfg.get("exponential_decay", {}).get("learning_rate")
        if lr and lr.get("enabled"):
            assert lr["decay_steps"] == GC_DRAWDOWN_DECAY_STEPS
            retuned += 1
    assert retuned > 0


@pytest.mark.slow
def test_cli_train_drawdown(tmp_path, capsys):
    """`srm_tpu train --drawdown` runs the full recipe end to end: GC fluid
    forced, sub-dew-point FV labels simulated for every split, one mixed
    physics/data epoch trains to a finite loss."""
    from srm_tpu.__main__ import main

    rc = main(["train", "--drawdown", "--nx", "9", "--realizations", "4",
               "--epochs", "1", "--batch-size", "8",
               "--base-dir", str(tmp_path)])
    assert rc in (0, None)
    out = capsys.readouterr().out
    assert "final total train loss:" in out


def test_cli_predict_gc(tmp_path, capsys):
    """`srm_tpu predict --fluid GC` rolls out BOTH heads — pressure and gas
    saturation — and saves both arrays (the GC surrogate replaces the
    two-phase simulator, so a pressure-only rollout would be half a result)."""
    from srm_tpu.__main__ import main

    out_npz = tmp_path / "pred.npz"
    rc = main(["predict", "--fluid", "GC", "--nx", "9", "--realizations", "4",
               "--max-realizations", "1", "--times", "0,30",
               "--base-dir", str(tmp_path), "--out", str(out_npz)])
    assert rc in (0, None)
    out = capsys.readouterr().out
    assert "pressure rollout:" in out
    assert "gas-saturation rollout:" in out
    data = np.load(out_npz)
    assert set(data.files) >= {"pressure", "saturation", "times"}
    assert data["pressure"].shape == data["saturation"].shape
    assert np.all(np.isfinite(data["pressure"]))
    assert np.all(np.isfinite(data["saturation"]))
