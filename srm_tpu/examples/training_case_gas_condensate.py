"""Gas-condensate (GC) two-phase training case.

The second model family from the reference (`fluid_type='GC'` in
``/root/reference/default_configurations.py:58`` with the saturation model
branch at ``training_case_dry_gas_i.py:303-314``): pressure + saturation
encoder-decoders, 7-property PVT, condensate rate splitting, and the
two-phase PDE residuals.

Run::

    python -m srm_tpu.examples.training_case_gas_condensate --epochs 5
"""

from __future__ import annotations

import argparse
import copy
import logging
from typing import Dict, Optional

import jax

from srm_tpu.config import DEFAULT_GENERAL_CONFIG, get_optimizer_model_mapping
from srm_tpu.data.dataset import SRMDataProcessor
from srm_tpu.losses.physics_loss import PhysicsLoss
from srm_tpu.nn.modules import build_model_map
from srm_tpu.training.trainer import train_combined_models_unified
from srm_tpu.utils.stats import DataSummary

log = logging.getLogger(__name__)


def setup_gas_condensate_case(base_dir: Optional[str] = None, nx: Optional[int] = None,
                              n_realizations: Optional[int] = None,
                              general_config: Optional[Dict] = None,
                              seed: Optional[int] = None):
    g = copy.deepcopy(general_config or DEFAULT_GENERAL_CONFIG)
    g["fluid_type"] = "GC"
    if seed is not None:
        g["seed"] = seed
    processor = SRMDataProcessor(base_dir=base_dir, general_config=g)
    if nx is not None:
        scale = nx / processor.reservoir_config["Nx"]
        processor.reservoir_config["Nx"] = processor.reservoir_config["Ny"] = nx
        g["unit_target_shape"] = (1, 1, nx, nx, 1)
        for conn in processor.wells_config["connections"]:
            conn["i"] = min(int(conn["i"] * scale), nx - 1)
            conn["j"] = min(int(conn["j"] * scale), nx - 1)
        processor.reservoir_config["realizations"]["permx"]["conditional_values"] = {
            (min(5, nx - 1), min(5, nx - 1), 0): 2.0}
        processor.general_config = g
    if n_realizations is not None:
        processor.reservoir_config["realizations"]["permx"]["number"] = n_realizations

    path, tr, va, te, pr = processor.get_or_generate_training_data()
    statistics = processor.load_training_statistics()
    data_summary = DataSummary([statistics])

    models, params = build_model_map(
        tr[0][0].shape, fluid_type="GC", rng=jax.random.PRNGKey(g["seed"]),
        general_config=g, reservoir_config=processor.reservoir_config,
        wells_config=processor.wells_config, data_summary=data_summary)

    loss_fn = PhysicsLoss(models, data_summary,
                          optimizer_model_names_map=get_optimizer_model_mapping("GC"),
                          general_config=g,
                          reservoir_config=processor.reservoir_config,
                          wells_config=processor.wells_config, fluid_type="GC")
    return {
        "processor": processor, "data_path": path,
        "train_groups": tr, "val_groups": va, "test_groups": te, "pred_groups": pr,
        "statistics": statistics, "data_summary": data_summary,
        "models": models, "params": params, "loss_fn": loss_fn, "general_config": g,
    }


def main(argv=None):
    parser = argparse.ArgumentParser(description="SRM gas-condensate training case (TPU)")
    parser.add_argument("--epochs", type=int, default=5)
    parser.add_argument("--batch-size", type=int, default=None)
    parser.add_argument("--base-dir", type=str, default=None)
    parser.add_argument("--nx", type=int, default=None)
    parser.add_argument("--realizations", type=int, default=None)
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    case = setup_gas_condensate_case(base_dir=args.base_dir, nx=args.nx,
                                     n_realizations=args.realizations)
    params, history, best = train_combined_models_unified(
        case["train_groups"], case["val_groups"], models=case["models"],
        params=case["params"], loss_fn=case["loss_fn"],
        training_batch_size=args.batch_size, epochs=args.epochs,
        general_config=case["general_config"])
    print("Final total train loss:", history["total_train_loss"][-1])
    return params, history, best


if __name__ == "__main__":
    main()
