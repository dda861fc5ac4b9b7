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
import logging
from typing import Dict, Optional


from srm_tpu.config import DEFAULT_GENERAL_CONFIG, get_optimizer_model_mapping
from srm_tpu.training.trainer import train_combined_models_unified

log = logging.getLogger(__name__)


def setup_gas_condensate_case(base_dir: Optional[str] = None, nx: Optional[int] = None,
                              n_realizations: Optional[int] = None,
                              general_config: Optional[Dict] = None,
                              seed: Optional[int] = None, nz: Optional[int] = None,
                              kle_method: Optional[str] = None,
                              use_pallas_stencil: Optional[bool] = None,
                              pi: Optional[float] = None,
                              min_bhp: Optional[float] = None):
    """Gas-condensate case bundle (see :func:`srm_tpu.examples.common.setup_case`)."""
    from srm_tpu.examples.common import setup_case
    return setup_case("GC", base_dir=base_dir, nx=nx,
                      n_realizations=n_realizations,
                      general_config=general_config, seed=seed, nz=nz,
                      kle_method=kle_method,
                      use_pallas_stencil=use_pallas_stencil,
                      pi=pi, min_bhp=min_bhp)


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
