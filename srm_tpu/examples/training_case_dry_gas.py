"""Dry-gas training case: the end-to-end entry point.

TPU-native equivalent of the reference's only driver
(``/root/reference/srm_training_examples/training_case_dry_gas_i.py``):
dataset → statistics → model map → PhysicsLoss → unified multi-model
training — on a single chip or data-parallel over a device mesh.

Run directly::

    python -m srm_tpu.examples.training_case_dry_gas --epochs 5
"""

from __future__ import annotations

import argparse
import copy
import logging
from typing import Dict, Optional, Tuple

import jax
import numpy as np

from srm_tpu.config import DEFAULT_GENERAL_CONFIG, get_optimizer_model_mapping
from srm_tpu.data.dataset import SRMDataProcessor
from srm_tpu.losses.physics_loss import PhysicsLoss
from srm_tpu.nn.modules import build_model_map
from srm_tpu.training.trainer import Trainer, train_combined_models_unified
from srm_tpu.utils.stats import DataSummary

log = logging.getLogger(__name__)


def setup_dry_gas_case(base_dir: Optional[str] = None, nx: Optional[int] = None,
                       n_realizations: Optional[int] = None,
                       general_config: Optional[Dict] = None,
                       seed: Optional[int] = None, nz: Optional[int] = None,
                       kle_method: Optional[str] = None,
                       use_pallas_stencil: Optional[bool] = None):
    """Build everything for the dry-gas case; returns a dict bundle.

    ``nx``/``nz``/``n_realizations`` resize the problem for tests, smoke runs
    and benchmarks; ``kle_method='uncorrelated'`` replaces the dense-KLE
    sampler with iid log-normal fields (needed above ~2k grid cells).
    """
    g = copy.deepcopy(general_config or DEFAULT_GENERAL_CONFIG)
    g["fluid_type"] = "DG"
    if seed is not None:
        g["seed"] = seed
    processor = SRMDataProcessor(base_dir=base_dir, general_config=g)
    if nx is not None or nz is not None:
        # resize the grid: rescale well positions and the unit target shape
        nx = nx or processor.reservoir_config["Nx"]
        nz = nz or processor.reservoir_config["Nz"]
        scale = nx / processor.reservoir_config["Nx"]
        processor.reservoir_config["Nx"] = processor.reservoir_config["Ny"] = nx
        processor.reservoir_config["Nz"] = nz
        g["unit_target_shape"] = (1, nz, nx, nx, 1) if nz > 1 else (1, 1, nx, nx, 1)
        for conn in processor.wells_config["connections"]:
            conn["i"] = min(int(conn["i"] * scale), nx - 1)
            conn["j"] = min(int(conn["j"] * scale), nx - 1)
            conn["k"] = min(conn.get("k", 0), nz - 1)
        cond = {(min(5, nx - 1), min(5, nx - 1), 0): 2.0}
        processor.reservoir_config["realizations"]["permx"]["conditional_values"] = cond
        processor.general_config = g
    if n_realizations is not None:
        processor.reservoir_config["realizations"]["permx"]["number"] = n_realizations
    if kle_method is not None:
        processor.reservoir_config["realizations"]["permx"]["method"] = kle_method

    path, train_groups, val_groups, test_groups, pred_groups = \
        processor.get_or_generate_training_data()
    statistics = processor.load_training_statistics()
    data_summary = DataSummary([statistics])

    models, params = build_model_map(
        train_groups[0][0].shape, fluid_type="DG",
        rng=jax.random.PRNGKey(g["seed"]), general_config=g,
        reservoir_config=processor.reservoir_config,
        wells_config=processor.wells_config, data_summary=data_summary)

    loss_fn = PhysicsLoss(models, data_summary,
                          optimizer_model_names_map=get_optimizer_model_mapping("DG"),
                          general_config=g,
                          reservoir_config=processor.reservoir_config,
                          wells_config=processor.wells_config, fluid_type="DG",
                          use_pallas_stencil=use_pallas_stencil)
    return {
        "processor": processor, "data_path": path,
        "train_groups": train_groups, "val_groups": val_groups,
        "test_groups": test_groups, "pred_groups": pred_groups,
        "statistics": statistics, "data_summary": data_summary,
        "models": models, "params": params, "loss_fn": loss_fn,
        "general_config": g,
    }


def main(argv=None):
    parser = argparse.ArgumentParser(description="SRM dry-gas training case (TPU)")
    parser.add_argument("--epochs", type=int, default=5)
    parser.add_argument("--batch-size", type=int, default=None)
    parser.add_argument("--base-dir", type=str, default=None)
    parser.add_argument("--nx", type=int, default=None)
    parser.add_argument("--realizations", type=int, default=None)
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    case = setup_dry_gas_case(base_dir=args.base_dir, nx=args.nx,
                              n_realizations=args.realizations)

    params, history, best = train_combined_models_unified(
        case["train_groups"], case["val_groups"], test_groups=case["test_groups"],
        models=case["models"], params=case["params"], loss_fn=case["loss_fn"],
        training_batch_size=args.batch_size, epochs=args.epochs,
        general_config=case["general_config"],
    )
    print("Final total train loss:", history["total_train_loss"][-1])
    return params, history, best


if __name__ == "__main__":
    main()
