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
import logging
from typing import Dict, Optional, Tuple

import numpy as np

from srm_tpu.config import DEFAULT_GENERAL_CONFIG, get_optimizer_model_mapping
from srm_tpu.losses.physics_loss import PhysicsLoss
from srm_tpu.training.trainer import Trainer, train_combined_models_unified

log = logging.getLogger(__name__)


def setup_dry_gas_case(base_dir: Optional[str] = None, nx: Optional[int] = None,
                       n_realizations: Optional[int] = None,
                       general_config: Optional[Dict] = None,
                       seed: Optional[int] = None, nz: Optional[int] = None,
                       kle_method: Optional[str] = None,
                       use_pallas_stencil: Optional[bool] = None):
    """Dry-gas case bundle (see :func:`srm_tpu.examples.common.setup_case`)."""
    from srm_tpu.examples.common import setup_case
    return setup_case("DG", base_dir=base_dir, nx=nx,
                      n_realizations=n_realizations,
                      general_config=general_config, seed=seed, nz=nz,
                      kle_method=kle_method,
                      use_pallas_stencil=use_pallas_stencil)


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
