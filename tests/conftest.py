"""Test configuration: run everything on a virtual 8-device CPU mesh so
multi-chip sharding paths are exercised without TPU hardware (the standard
JAX stand-in; see SURVEY §4)."""

import os

# force (not setdefault): an inherited JAX_PLATFORMS=<tpu-ish> would silently
# move the whole suite onto one real chip, where the 8-device mesh tests and
# debug-callback paths cannot run
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# keep compiled epoch programs small: the 4x scan unroll only pays off on
# real TPU throughput runs, while it quadruples XLA CPU compile time here
os.environ.setdefault("SRM_TPU_SCAN_UNROLL", "1")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Persistent compilation cache: the physics-loss gradient graph is large and
# CPU compiles are slow; cache across test sessions.
import jax  # noqa: E402

# a sitecustomize may force-register an accelerator platform over the env
# var; the in-process config update takes final precedence
jax.config.update("jax_platforms", "cpu")

# machine-keyed cache dir: XLA:CPU entries are AOT machine code, and a dir
# shared across hosts poisons the suite with mismatched executables
# (VERDICT r3 weakness #1)
from srm_tpu.utils.compile_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache(min_compile_secs=2.0, min_entry_bytes=-1)


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)


# --------------------------------------------------------------------------
# Session-scoped shared training cases (VERDICT r2 item 9: the suite's wall
# clock was dominated by per-module rebuilds + XLA CPU compiles of
# near-duplicate loss graphs; shared cases keep one shape per size so the
# persistent compile cache hits across modules).
# --------------------------------------------------------------------------
@pytest.fixture(scope="session")
def dg13_case(tmp_path_factory):
    from srm_tpu.examples.training_case_dry_gas import setup_dry_gas_case
    return setup_dry_gas_case(base_dir=str(tmp_path_factory.mktemp("dg13")),
                              nx=13, n_realizations=8)


@pytest.fixture(scope="session")
def dg9_case(tmp_path_factory):
    from srm_tpu.examples.training_case_dry_gas import setup_dry_gas_case
    return setup_dry_gas_case(base_dir=str(tmp_path_factory.mktemp("dg9")),
                              nx=9, n_realizations=6)


@pytest.fixture(scope="session")
def gc13_case(tmp_path_factory):
    """Small shared GC case (13×13, 4 realizations): one dataset build and
    one compiled two-phase loss shape for every GC test module."""
    import copy

    from srm_tpu.config import DEFAULT_GENERAL_CONFIG
    from srm_tpu.data.dataset import SRMDataProcessor
    from srm_tpu.nn.modules import build_model_map
    from srm_tpu.utils.stats import DataSummary

    g = copy.deepcopy(DEFAULT_GENERAL_CONFIG)
    g["fluid_type"] = "GC"
    g["unit_target_shape"] = (1, 1, 13, 13, 1)
    proc = SRMDataProcessor(base_dir=str(tmp_path_factory.mktemp("gc13")),
                            general_config=g)
    proc.reservoir_config["Nx"] = proc.reservoir_config["Ny"] = 13
    proc.reservoir_config["realizations"]["permx"]["number"] = 4
    proc.reservoir_config["realizations"]["permx"]["conditional_values"] = {(5, 5, 0): 2.0}
    for conn in proc.wells_config["connections"]:
        conn["i"] = min(conn["i"] // 3, 12)
        conn["j"] = min(conn["j"] // 3, 12)
    _, tr, va, te, pr = proc.get_or_generate_training_data()
    ds = DataSummary([proc.load_training_statistics()])
    models, params = build_model_map(tr[0][0].shape, fluid_type="GC",
                                     general_config=g,
                                     reservoir_config=proc.reservoir_config,
                                     wells_config=proc.wells_config,
                                     data_summary=ds)
    return {"g": g, "proc": proc, "ds": ds, "models": models,
            "params": params, "train_groups": tr}
