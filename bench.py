"""Benchmark: full-fidelity train step throughput + MFU (DG and GC).

Cases (all: full PhysicsLoss with two model forwards, spline PVT, well
solver, per-model optimizer updates — the reference's hot loop, SURVEY §3.2):

* ``dg2d``         — the reference's own default scale (39×39, batch 32);
  the fused Pallas stencil kernel is the default on TPU
* ``dg2d_jnp``     — same with the Pallas kernel disabled (XLA-fused jnp path)
* ``dg3d``         — 39×39×10 volumetric (beyond-reference 7-point residual)
* ``dg3d_bf16``    — dg3d with bfloat16 network compute (+61% measured)
* ``dg2d_large``   — 117×117, batch 128 (compute-bound regime; batch 256
  exceeds one v5e chip's 16G HBM — the loss graph holds two time-level
  forward activations for the backward pass)
* ``gc2d``         — gas-condensate at reference scale (two-phase 4-flux
  upstream residual, the reference's DEFAULT fluid)
* ``gc3d``         — 39×39×10 volumetric GC (beyond-reference)
* ``gc2d_bf16``    — gc2d with bfloat16 network compute
* ``dg3d_bf16_dt2``— dg3d with bf16 + dt_input_stride=2 (the Δt net on a
  strided grid): 2.9× the f32 step time in the r3 profile

Each case reports steps/s and model FLOPs utilization (MFU) estimated from
XLA's own ``cost_analysis`` of the compiled epoch program against the chip's
bf16 peak. Prints ONE JSON line; the driver-required keys are
``metric/value/unit/vs_baseline``, extra detail rides alongside.

``vs_baseline`` follows BASELINE.md: the reference publishes no numbers, so
the primary baseline is the measured REAL TensorFlow reference
(``tools/tf_reference_benchmark.py``, committed result in BASELINE.md); when
that number is absent on this machine we fall back to the cached
reference-execution-strategy CPU run.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
CPU_CACHE = os.path.join(HERE, ".bench_cpu_baseline.json")
# measured by tools/tf_reference_benchmark.py (TF 2.21 + legacy Keras, CPU,
# the reference's own physics_error_gas_2D/pinn_batch_sse_grad kernel);
# see BASELINE.md "Round-2 measured results"
# 0.33 = plain graph mode, the reference's FASTER variant on this host,
# measured UNCONTENDED during the rmse-experiment run (200 steps / 606 s with
# the reference's own optimizers). Its as-written @tf.function(jit_compile=
# True) kernel measured 0.004 steps/s (234 s/step, XLA-CPU single-core
# pathology); an earlier 0.111 graph-mode reading shared the core with an
# XLA compile. Using the fastest variant keeps the speedup a lower bound.
TF_REFERENCE_STEPS_PER_SEC = 0.33
TF_BASELINE_FILE = os.path.join(HERE, ".bench_tf_baseline.json")

BATCH = 32
WARMUP = 3

# shared across cases in one bench process: the processed dataset is keyed by
# the physics config hash (dtype/production variants share it), so the
# f32/bf16 sweeps skip the repeated multi-hundred-MB npz reload (the
# single-core host pays ~40-100 s per setup_case otherwise)
DATA_CACHE: dict = {}

# peak MXU throughput used for the MFU denominator (bf16); one v5e chip.
PEAK_FLOPS = 197e12


def _mfu(flops_per_step: float, steps_per_sec: float) -> float:
    return flops_per_step * steps_per_sec / PEAK_FLOPS


def measure_case(tag: str, *, nx=None, nz=None, batch=BATCH, realizations=None,
                 kle_method=None, pallas=None, general_config=None,
                 fluid: str = "DG", reps: int = 3, budget_left=None,
                 ceiling_s=None) -> dict:
    """Times the epoch-scanned train path: all batches of an epoch run in ONE
    device dispatch (lax.scan), so the measurement reflects device throughput
    rather than per-launch host round-trips.

    ``ceiling_s`` is a hard per-case wall ceiling (VERDICT r4 item 1b): the
    elapsed time is checked between the setup/stage/warmup phases and the
    case aborts cleanly — returning what it has — instead of silently
    overrunning and starving every case queued behind it.
    """
    import jax
    import numpy as np
    from srm_tpu.examples.common import setup_case
    from srm_tpu.training.trainer import Trainer

    t_case0 = time.perf_counter()
    t_phase = t_case0

    def _mark(phase):
        nonlocal t_phase
        now = time.perf_counter()
        print(f"[bench]   {tag}.{phase}: {now - t_phase:.1f}s",
              file=sys.stderr, flush=True)
        t_phase = now

    def _over(phase):
        if ceiling_s is not None and time.perf_counter() - t_case0 > ceiling_s:
            return {"aborted": f"ceiling {round(ceiling_s)}s exceeded after "
                               f"{phase} ({round(time.perf_counter() - t_case0)}s)"}
        return None

    base = os.environ.get("SRM_TPU_WORKING_DIRECTORY",
                          os.path.join(HERE, "_srm_data"))
    case = setup_case(fluid, base_dir=base, nx=nx, nz=nz,
                      n_realizations=realizations,
                      kle_method=kle_method,
                      general_config=general_config,
                      use_pallas_stencil=pallas,
                      data_cache=DATA_CACHE)
    _mark("setup")
    stop = _over("setup")
    if stop:
        return stop
    trainer = Trainer(case["loss_fn"], case["params"])
    nb, n_samples = trainer.stage_dataset("train", case["train_groups"], batch)
    _mark("stage")
    stop = _over("stage")
    if stop:
        return stop
    key = jax.random.PRNGKey(0)

    for i in range(WARMUP):
        m = trainer.train_epoch_resident("train", jax.random.fold_in(key, i))
    jax.block_until_ready(m["total"])
    _mark("warmup_compile")
    stop = _over("warmup_compile")
    if stop:
        return stop

    t0 = time.perf_counter()
    for i in range(reps):
        m = trainer.train_epoch_resident("train", jax.random.fold_in(key, 100 + i))
    # sync via a real device->host fetch: block_until_ready was observed to
    # return early after an axon-tunnel reconnect (bogus 10946 steps/s row),
    # while materializing the metric values cannot lie
    totals = np.asarray(m["total"])
    dt = time.perf_counter() - t0
    _mark("measure")
    assert np.isfinite(totals).all(), f"non-finite loss in {tag}"
    sps = (nb * reps) / dt
    if sps > 5000:  # > one epoch-step per 200 µs is beyond this chip: re-time
        t0 = time.perf_counter()
        for i in range(reps):
            m = trainer.train_epoch_resident("train",
                                             jax.random.fold_in(key, 200 + i))
        np.asarray(m["total"])
        dt = time.perf_counter() - t0
        _mark("re-measure")
        sps = (nb * reps) / dt

    # FLOPs/step for MFU: hand model (srm_tpu.utils.flops) over the lowered
    # TRAIN-STEP program — dot/conv FLOPs counted from OUR unoptimized
    # StableHLO, stable across XLA releases (VERDICT r3 weakness #2:
    # cost_analysis re-costed the same program 593→3010 GFLOP across XLA
    # updates). The STEP program, not the epoch program: StableHLO lowers
    # `lax.scan` to a while/deduplicated function whose body both the hand
    # model and XLA's cost_analysis count ONCE regardless of trip count
    # (verified with a toy scan: hand ratio 1.0, XLA ratio 6.0, true 50) —
    # every epoch-program-based MFU in rounds 2-3 was understated by ~nb/unroll.
    # Optional XLA cross-check of the same step program behind
    # SRM_TPU_BENCH_XLA_COST=1 (costs one extra compile per case).
    # the lowering + parse can take minutes on big programs (429 s observed
    # on dg3d_bf16): when the wall budget is nearly spent, keep the steps/s
    # row and skip the MFU column rather than starving the remaining cases
    flops_per_step = xla_flops_per_step = None
    if (budget_left is not None and budget_left() < 120) or _over("measure"):
        print(f"[bench]   {tag}.flops_model: skipped (budget/ceiling)",
              file=sys.stderr, flush=True)
        return {
            "steps_per_sec": round(sps, 3), "batch": batch,
            "grid": f"{nx or 39}x{nx or 39}x{nz or 1}",
            "samples_per_sec": round(sps * batch, 1),
        }
    try:
        import jax.numpy as jnp
        x_all, y_all, nb_, _ = trainer._resident["train"]
        xb = jnp.asarray(x_all[:batch])
        yb = jax.tree_util.tree_map(lambda a: jnp.asarray(a[:batch]), y_all)
        lowered = trainer._train_step.lower(
            trainer.params, trainer.opt_state, xb, yb)
        from srm_tpu.utils.flops import stablehlo_matmul_flops
        flops_per_step = stablehlo_matmul_flops(lowered.as_text())
        if os.environ.get("SRM_TPU_BENCH_XLA_COST"):
            ca = lowered.compile().cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            if ca and "flops" in ca:
                xla_flops_per_step = float(ca["flops"])
    except Exception:
        pass
    _mark("flops_model")

    res = {
        "steps_per_sec": round(sps, 3), "batch": batch,
        "grid": f"{nx or 39}x{nx or 39}x{nz or 1}",
        "samples_per_sec": round(sps * batch, 1),
    }
    if flops_per_step is not None:
        res["gflops_per_step"] = round(flops_per_step / 1e9, 2)
        res["mfu"] = round(_mfu(flops_per_step, sps), 4)
    if xla_flops_per_step is not None:
        res["gflops_per_step_xla"] = round(xla_flops_per_step / 1e9, 2)
        res["mfu_xla"] = round(_mfu(xla_flops_per_step, sps), 4)
        if flops_per_step is None:
            res["mfu"] = res["mfu_xla"]
    return res


def measure_inference(fluid: str = "DG", n_realizations: int = 16,
                      reps: int = 5, nx=None, setup_realizations=None,
                      kle_method=None, case=None, sim_reps: int = 3,
                      ceiling_s=None) -> dict:
    """Surrogate-vs-simulator processing time — the reference's headline
    claim (ref README closing paragraphs: the surrogate saves "up to 90% of
    the total processing time" vs running the numerical simulator).

    Hardened per VERDICT r4 item 6: both sides are timed as DEVICE work —
    inputs staged once, each repeat synced with ``block_until_ready`` — so a
    loaded axon tunnel cannot leak host-transfer jitter into the ratio; the
    medians of ``reps``/``sim_reps`` repeats are reported together with the
    spread. One end-to-end (host boundary) surrogate wall is kept alongside
    for transparency."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from srm_tpu.eval.predictor import SRMPredictor
    from srm_tpu.examples.common import setup_case
    from srm_tpu.sim import simulate_labels

    t0_case = time.perf_counter()
    base = os.environ.get("SRM_TPU_WORKING_DIRECTORY",
                          os.path.join(HERE, "_srm_data"))
    if case is None:
        case = setup_case(fluid, base_dir=base, nx=nx,
                          n_realizations=setup_realizations,
                          kle_method=kle_method, data_cache=DATA_CACHE)
    proc = case["processor"]
    permx = proc.generate_kle_splits()["test"][:n_realizations]
    times = np.asarray(proc.generate_time_tensor()["test"]).reshape(-1)

    pred = SRMPredictor(case["models"], case["params"], case["data_summary"],
                        general_config=case["general_config"],
                        reservoir_config=proc.reservoir_config)

    # --- surrogate: stage features on device ONCE, time compute-only reps ---
    feats = pred.build_features(permx, np.asarray(times))
    K, T = feats.shape[:2]
    flat = feats.reshape((-1,) + feats.shape[2:])
    bs = pred.batch_size
    pad = (-flat.shape[0]) % bs
    if pad:
        flat = np.concatenate([flat, np.repeat(flat[-1:], pad, axis=0)], axis=0)
    flat_dev = jnp.asarray(flat)
    fn = pred._fn("pressure")

    def run_device():
        outs = [fn(flat_dev[i:i + bs]) for i in range(0, flat_dev.shape[0], bs)]
        jax.block_until_ready(outs)
        return outs

    run_device()                                     # warmup + compile
    sur_ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        run_device()
        sur_ts.append(time.perf_counter() - t0)
    t_sur = float(np.median(sur_ts))
    # one end-to-end wall (host→device→host) for transparency
    t0 = time.perf_counter()
    pred.predict_pressure(permx, times)
    t_sur_e2e = time.perf_counter() - t0
    n_fields = K * T

    # --- FV simulator on the identical workload (compile once, then time) ---
    simulate_labels(proc, "test", permx=permx[:2], times=times)
    sim_ts = []
    for _ in range(sim_reps):
        t0 = time.perf_counter()
        simulate_labels(proc, "test", permx=permx, times=times)
        sim_ts.append(time.perf_counter() - t0)
        if ceiling_s is not None and time.perf_counter() - t0_case > ceiling_s:
            break                       # keep what we have — median over ≥1
    t_sim = float(np.median(sim_ts))

    spread = lambda ts: round(100.0 * (max(ts) - min(ts)) / (2 * np.median(ts)), 2)  # noqa: E731
    return {
        "grid": f"{proc.reservoir_config['Nx']}x{proc.reservoir_config['Ny']}"
                f"x{proc.reservoir_config['Nz']}",
        "realizations": int(permx.shape[0]), "timesteps": int(times.size),
        "surrogate_s": round(t_sur, 4), "simulator_s": round(t_sim, 4),
        "surrogate_s_e2e": round(t_sur_e2e, 4),
        "surrogate_reps": len(sur_ts), "simulator_reps": len(sim_ts),
        "surrogate_spread_pct": spread(sur_ts),
        "simulator_spread_pct": spread(sim_ts),
        "surrogate_fields_per_sec": round(n_fields / t_sur, 1),
        "speedup_vs_simulator": round(t_sim / t_sur, 1),
        "time_saving_pct": round(100.0 * (1.0 - t_sur / t_sim), 2),
    }


def measure_reference_style_cpu(batch: int = BATCH, steps: int = 20) -> dict:
    """Fallback baseline: the reference's execution strategy with identical
    math on the host CPU — eager per-step Python loop, ONE compiled loss
    kernel with NINE separate per-term gradient passes
    (ref physics_loss.py:849-859), per-term scalar syncs per step
    (ref training.py:608-640), separate optimizer dispatch (:643-652)."""
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

    @jax.jit
    def reference_style_grads(p, x, y):
        grads = {}
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
    opt_state = {k: opts[k].init(params[k]) for k in opts}

    @jax.jit
    def apply_updates(p, s, g):
        out_p = dict(p)
        out_s = dict(s)
        for k in ("pressure", "time_step"):
            upd, out_s[k] = opts[k].update(g[k], s[k], p[k])
            out_p[k] = optax.apply_updates(p[k], upd)
        return out_p, out_s

    ds = BatchGenerator(case["train_groups"], batch_size=batch, seed=0)

    def one_step(i, p, s):
        x, y = ds[i % len(ds)]
        x = jnp.asarray(x)
        y = {k: jnp.asarray(v) for k, v in y.items()}
        tot, terms, grad = reference_style_grads(p, x, y)
        for t in TERMS:
            float(terms[t])
        p, s = apply_updates(p, s, grad)
        return float(tot), p, s

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


def tf_baseline() -> float:
    """The measured REAL TF reference (tools/tf_reference_benchmark.py).

    Prefers the machine-local measured artifact; falls back to the committed
    constant (0.33 steps/s, graph mode, measured 2026-08-16 — BASELINE.md)."""
    if os.path.isfile(TF_BASELINE_FILE):
        try:
            with open(TF_BASELINE_FILE) as f:
                return float(json.load(f)["tf_reference_steps_per_sec"])
        except (ValueError, KeyError, OSError):
            pass
    return TF_REFERENCE_STEPS_PER_SEC


def _bf16(extra=None):
    import copy

    from srm_tpu.config import DEFAULT_GENERAL_CONFIG
    gb = copy.deepcopy(DEFAULT_GENERAL_CONFIG)
    gb["compute_dtype"] = "bfloat16"
    for k, v in (extra or {}).items():
        gb[k] = v
    return gb


def _production(extra=None):
    from srm_tpu.config import DEFAULT_GENERAL_CONFIG, apply_production_overrides
    g = apply_production_overrides(DEFAULT_GENERAL_CONFIG)
    for k, v in (extra or {}).items():
        g[k] = v
    return g


def main():
    from srm_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()  # machine-keyed: round-3 cross-host AOT fix

    # Total wall-clock budget (VERDICT r3 item 1): cases run in priority
    # order; once the budget is spent the rest are skipped and the JSON line
    # still prints. Default sits well under the driver's timeout (r3 bench
    # was killed by `timeout` at rc 124 with no artifact).
    budget_s = float(os.environ.get("SRM_TPU_BENCH_BUDGET_S", "1200"))
    t_start = time.perf_counter()

    def remaining():
        return budget_s - (time.perf_counter() - t_start)

    # per-case hard ceiling (VERDICT r4 item 1b): the estimate is enforced —
    # with 1.5x slack for compile variance — via phase checks inside
    # measure_case, never letting one case starve the queue behind it
    def mc(tag, est=None, **kw):
        ceil = min(est * 1.5, remaining()) if est else remaining()
        return measure_case(tag, budget_left=remaining, ceiling_s=ceil, **kw)

    # (name, thunk, est_cost_s) in priority order. The must-have rows for the
    # artifact (headline production, a GC row, the high-MFU b128 row,
    # gc3d_production, infer_vs_sim — VERDICT r4 item 1) all run before any
    # nice-to-have f32/ablation case.
    D3 = dict(nx=39, nz=10, batch=32, realizations=50,
              kle_method="uncorrelated")
    plan = [
        ("dg2d", lambda est: mc("dg2d", est=est), 90),
        ("dg2d_production",
         lambda est: mc("dg2d_production", general_config=_production(),
                        est=est), 90),
        # gc2d before the 3D cases so even a cold-compile-cache run records a
        # GC row alongside the production row
        ("gc2d", lambda est: mc("gc2d", fluid="GC", est=est), 120),
        ("dg3d_production",
         lambda est: mc("dg3d_production", general_config=_production(),
                        est=est, **D3), 150),
        ("gc3d_production",
         lambda est: mc("gc3d_production", fluid="GC",
                        general_config=_bf16({"dt_input_stride": 2}),
                        est=est, **D3), 220),
        # batch-scaled production 3D: the compute-bound high-MFU row
        ("dg3d_production_b128",
         lambda est: mc("dg3d_production_b128", nx=39, nz=10, batch=128,
                        realizations=50, kle_method="uncorrelated",
                        general_config=_production(), est=est), 150),
        # b256 + remat: rematerialized forwards halve activation HBM so the
        # batch doubles again — the highest-MFU configuration measured
        # (25.8% round 4); promoted ahead of infer_vs_sim so the ≥25%-MFU
        # row is driver-captured even on a tight budget (VERDICT r4 item 2)
        ("dg3d_production_b256_remat",
         lambda est: mc("dg3d_production_b256_remat", nx=39, nz=10,
                        batch=256, realizations=50,
                        kle_method="uncorrelated",
                        general_config=_production(
                            {"remat_forwards": True}), est=est), 150),
        # surrogate-replaces-the-simulator headline (ref README's "90% of
        # the total processing time" claim, measured on identical workloads)
        ("infer_vs_sim",
         lambda est: measure_inference(
             ceiling_s=min(est * 1.5, remaining())), 240),
        ("dg3d", lambda est: mc("dg3d", est=est, **D3), 120),
        ("gc3d", lambda est: mc("gc3d", fluid="GC", est=est, **D3), 120),
        ("dg3d_bf16", lambda est: mc("dg3d_bf16", general_config=_bf16(),
                                     est=est, **D3), 120),
        ("dg2d_large",
         lambda est: mc("dg2d_large", nx=117, batch=128,
                        realizations=50, kle_method="uncorrelated",
                        est=est), 150),
        ("gc2d_bf16", lambda est: mc("gc2d_bf16", fluid="GC",
                                     general_config=_bf16(), est=est), 120),
        ("dg2d_jnp", lambda est: mc("dg2d_jnp", pallas=False, est=est), 90),
    ]

    # transient tunnel/transport errors are retried ONCE (VERDICT r4 item 1a:
    # round 4 lost its gc3d_production row to a single
    # "remote_compile: read body" hiccup that a retry would have absorbed)
    transient = ("remote_compile", "read body", "DEADLINE", "UNAVAILABLE",
                 "socket", "connection", "tunnel")

    def _is_transient(msg: str) -> bool:
        low = msg.lower()
        return any(t.lower() in low for t in transient)

    cases = {}
    for name, thunk, est in plan:
        if remaining() < est:
            cases[name] = {"skipped": f"budget ({round(remaining())}s left, "
                                      f"est {est}s)"}
            continue
        # progress to stderr (the JSON line owns stdout): when a driver
        # timeout kills the run anyway, the tail shows which case ate the time
        print(f"[bench] {name}: starting ({round(remaining())}s budget left)",
              file=sys.stderr, flush=True)
        t_case = time.perf_counter()
        try:
            cases[name] = thunk(est)
        except Exception as e:
            cases[name] = {"error": str(e)[:200]}
            if _is_transient(str(e)) and remaining() > est:
                print(f"[bench] {name}: transient error, retrying once "
                      f"({str(e)[:120]})", file=sys.stderr, flush=True)
                try:
                    cases[name] = thunk(est)
                    cases[name]["retried"] = True
                except Exception as e2:
                    cases[name] = {"error": str(e2)[:200], "retried": True}
        print(f"[bench] {name}: done in {time.perf_counter() - t_case:.1f}s "
              f"-> {cases[name]}", file=sys.stderr, flush=True)

    # headline: the shipped production profile at reference scale — it
    # converges BETTER than f32 on the matched-RMSE protocol (31.8 vs 34.3
    # psia, BASELINE.md round 3), so its step rate is accuracy-fair; fall
    # back to the f32 case if the production case errored
    headline_case, headline = None, None
    for name in ("dg2d_production", "dg2d"):
        sps = cases.get(name, {}).get("steps_per_sec")
        if isinstance(sps, (int, float)):
            headline_case, headline = name, sps
            break
    base_tf = tf_baseline()
    base = base_tf if base_tf == base_tf else cpu_baseline()
    vs = (headline / base
          if headline is not None and base == base and base > 0 else None)
    print(json.dumps({
        "metric": "train_steps_per_sec",
        "value": headline,
        "unit": "steps/s",
        "headline_case": headline_case,
        "vs_baseline": round(vs, 3) if vs is not None else None,
        "baseline_kind": ("tf_reference_cpu" if base_tf == base_tf
                          else "reference_style_jax_cpu"),
        "cases": cases,
    }))


if __name__ == "__main__":
    main()
