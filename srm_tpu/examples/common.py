"""Shared case construction for the example training drivers.

``setup_case`` builds the full bundle — data processor, generated/cached
training data, statistics, model map, PhysicsLoss — for either fluid type
(the reference's per-case scripts duplicate this block,
ref training_case_dry_gas_i.py:100-170 / default_configurations.py:1-120).
"""

from __future__ import annotations

import copy
from typing import Dict, Optional

import jax

from srm_tpu.config import DEFAULT_GENERAL_CONFIG, get_optimizer_model_mapping
from srm_tpu.data.dataset import SRMDataProcessor
from srm_tpu.losses.physics_loss import PhysicsLoss
from srm_tpu.nn.modules import build_model_map
from srm_tpu.utils.stats import DataSummary


def setup_case(fluid_type: str, base_dir: Optional[str] = None,
               nx: Optional[int] = None, n_realizations: Optional[int] = None,
               general_config: Optional[Dict] = None,
               seed: Optional[int] = None, nz: Optional[int] = None,
               kle_method: Optional[str] = None,
               use_pallas_stencil: Optional[bool] = None,
               pi: Optional[float] = None,
               min_bhp: Optional[float] = None,
               well_solver_kwargs: Optional[Dict] = None,
               data_cache: Optional[Dict] = None):
    """Build everything for one training case; returns a dict bundle.

    ``nx``/``nz``/``n_realizations`` resize the problem for tests, smoke runs
    and benchmarks; ``kle_method='uncorrelated'`` replaces the dense-KLE
    sampler with iid log-normal fields (needed above ~2k grid cells).
    """
    fluid_type = fluid_type.upper()
    g = copy.deepcopy(general_config or DEFAULT_GENERAL_CONFIG)
    g["fluid_type"] = fluid_type
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
    if pi is not None:
        # Drawdown scenarios: the shipped case (Pi=5000, minimum_bhp=4100)
        # deliberately never crosses the 4048.4-psia dew point
        # (ref default_configurations.py:59 'above_dew_point': True), so GC
        # condensate dropout is never exercised. Lowering Pi and the BHP
        # floor produces sub-dew-point labels; both feed the config hash, so
        # the dataset/label cache regenerates automatically.
        processor.reservoir_config["initialization"]["Pi"] = float(pi)
    if min_bhp is not None:
        for conn in processor.wells_config["connections"]:
            conn["minimum_bhp"] = float(min_bhp)

    # The processed dataset is keyed by the physics config hash ONLY
    # (generate_full_config_hash excludes compute settings like dtype), so
    # callers building several variants of one case — the benchmark's
    # f32/bf16/production sweeps — can pass a shared ``data_cache`` dict to
    # skip the repeated multi-hundred-MB npz reload + group reconstruction.
    cache_key = processor.config_hash()[1]
    if data_cache is not None and cache_key in data_cache:
        path, train_groups, val_groups, test_groups, pred_groups, statistics = \
            data_cache[cache_key]
    else:
        path, train_groups, val_groups, test_groups, pred_groups = \
            processor.get_or_generate_training_data()
        statistics = processor.load_training_statistics()
        if data_cache is not None:
            data_cache[cache_key] = (path, train_groups, val_groups,
                                     test_groups, pred_groups, statistics)
    data_summary = DataSummary([statistics])

    models, params = build_model_map(
        train_groups[0][0].shape, fluid_type=fluid_type,
        rng=jax.random.PRNGKey(g["seed"]), general_config=g,
        reservoir_config=processor.reservoir_config,
        wells_config=processor.wells_config, data_summary=data_summary,
        well_solver_kwargs=well_solver_kwargs)

    loss_fn = PhysicsLoss(models, data_summary,
                          optimizer_model_names_map=get_optimizer_model_mapping(fluid_type),
                          general_config=g,
                          reservoir_config=processor.reservoir_config,
                          wells_config=processor.wells_config, fluid_type=fluid_type,
                          use_pallas_stencil=use_pallas_stencil)
    return {
        "processor": processor, "data_path": path,
        "train_groups": train_groups, "val_groups": val_groups,
        "test_groups": test_groups, "pred_groups": pred_groups,
        "statistics": statistics, "data_summary": data_summary,
        "models": models, "params": params, "loss_fn": loss_fn,
        "general_config": g,
    }
