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
