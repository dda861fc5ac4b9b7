"""Benchmark: full-fidelity dry-gas train step throughput.

Runs the default dry-gas case (39x39 grid, 200 KLE realizations, batch 32,
pure-physics PhysicsLoss with two model forwards, spline PVT, well solver,
per-model optimizer updates — the reference's hot loop, SURVEY §3.2) on the
available accelerator and prints ONE JSON line:

    {"metric": "train_steps_per_sec", "value": N, "unit": "steps/s",
     "vs_baseline": R}

``vs_baseline`` follows BASELINE.md's measurement plan: the reference
publishes no numbers, so the baseline is self-measured — the same jitted
train step on the host CPU (the reference's TF graph also XLA-compiles its
loss kernel, so same-code CPU-vs-TPU is the honest hardware ratio). The CPU
number is measured in a subprocess once and cached next to this file.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
CPU_CACHE = os.path.join(HERE, ".bench_cpu_baseline.json")
BATCH = 32
WARMUP = 3
STEPS = 30


def measure_steps_per_sec(batch: int = BATCH, warmup: int = WARMUP,
                          steps: int = STEPS) -> dict:
    """Times the epoch-scanned train path: all batches of an epoch run in ONE
    device dispatch (lax.scan), so the measurement reflects device throughput
    rather than per-launch host round-trips."""
    import jax
    import numpy as np
    from srm_tpu.data.batching import BatchGenerator
    from srm_tpu.examples.training_case_dry_gas import setup_dry_gas_case
    from srm_tpu.training.trainer import Trainer

    jax.config.update("jax_compilation_cache_dir", "/tmp/srm_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    base = os.environ.get("SRM_TPU_WORKING_DIRECTORY",
                          os.path.join(HERE, "_srm_data"))
    case = setup_dry_gas_case(base_dir=base)
    trainer = Trainer(case["loss_fn"], case["params"])

    # dataset uploaded to HBM once; epochs shuffle/batch on device
    nb, _ = trainer.stage_dataset("train", case["train_groups"], batch)
    key = jax.random.PRNGKey(0)

    for i in range(warmup):
        m = trainer.train_epoch_resident("train", jax.random.fold_in(key, i))
    jax.block_until_ready(m["total"])

    reps = 3
    t0 = time.perf_counter()
    for i in range(reps):
        m = trainer.train_epoch_resident("train", jax.random.fold_in(key, 100 + i))
    jax.block_until_ready(m["total"])
    dt = time.perf_counter() - t0
    assert np.isfinite(np.asarray(m["total"])).all(), "non-finite loss in benchmark"
    sps = (nb * reps) / dt
    return {"steps_per_sec": sps, "batch": batch,
            "residual_evals_per_sec": sps,   # one residual eval (2 forwards) per step
            "cells_per_sec": sps * batch * 39 * 39}


def cpu_baseline() -> float:
    if os.path.isfile(CPU_CACHE):
        with open(CPU_CACHE) as f:
            return json.load(f)["steps_per_sec"]
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    code = (
        "import json, bench; r = bench.measure_steps_per_sec(steps=10, warmup=2); "
        "print('CPU_RESULT ' + json.dumps(r))"
    )
    try:
        out = subprocess.run([sys.executable, "-c", code], cwd=HERE, env=env,
                             capture_output=True, text=True, timeout=3000)
        for line in out.stdout.splitlines():
            if line.startswith("CPU_RESULT "):
                r = json.loads(line[len("CPU_RESULT "):])
                with open(CPU_CACHE, "w") as f:
                    json.dump(r, f)
                return r["steps_per_sec"]
    except Exception:
        pass
    return float("nan")


def main():
    r = measure_steps_per_sec()
    base = cpu_baseline()
    vs = r["steps_per_sec"] / base if base == base and base > 0 else None
    print(json.dumps({
        "metric": "train_steps_per_sec",
        "value": round(r["steps_per_sec"], 3),
        "unit": "steps/s",
        "vs_baseline": round(vs, 3) if vs is not None else None,
    }))


if __name__ == "__main__":
    main()
