"""Decompose the full train step's wall time on the real chip.

The r3 MFU probe showed the conv networks take <1 ms of a ~120 ms dg3d step:
the bottleneck is in the physics-loss path, not the MXU work. This tool
times each stage of the hot loop separately to find it:

  fwd_pressure   one pressure-net forward (doubled batch, as the loss runs it)
  fwd_dt         one Δt-net forward
  pvt            PVT layer (values + jvp derivatives) on a field
  wells          WellRatesPressure.compute_rates_and_bhp
  residual       the stencil residual math given model outputs (loss minus nets)
  loss           loss_and_metrics (everything, no grad)
  loss_grad      pinn_batch_sse_grad (the backward)
  train_step     Trainer.train_step (loss_grad + optimizer updates)

Usage:  python tools/step_profile.py [--nz 10] [--batch 32] [--fluid DG]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, reps=10, warmup=2):
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3      # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nz", type=int, default=10)
    ap.add_argument("--nx", type=int, default=39)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--fluid", default="DG")
    ap.add_argument("--pallas", type=int, default=None)
    ap.add_argument("--pad", type=int, default=None,
                    help="spatial_pad_to override")
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--precision", default=None)
    ap.add_argument("--dt-stride", type=int, default=None, dest="dt_stride")
    ap.add_argument("--width", type=int, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from srm_tpu.examples.common import setup_case
    from srm_tpu.training.trainer import Trainer

    from srm_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    base = os.environ.get("SRM_TPU_WORKING_DIRECTORY",
                          os.path.join(os.path.dirname(os.path.dirname(
                              os.path.abspath(__file__))), "_srm_data"))
    gcfg = None
    if args.pad or args.bf16 or args.precision or args.dt_stride or args.width:
        import copy
        from srm_tpu.config import DEFAULT_GENERAL_CONFIG
        gcfg = copy.deepcopy(DEFAULT_GENERAL_CONFIG)
        if args.pad:
            gcfg["spatial_pad_to"] = args.pad
        if args.bf16:
            gcfg["compute_dtype"] = "bfloat16"
        if args.precision:
            gcfg["precision_policy"] = args.precision
        if args.dt_stride:
            gcfg["dt_input_stride"] = args.dt_stride
        if args.width:
            gcfg["network_width"] = args.width
    case = setup_case(args.fluid, base_dir=base, nx=args.nx,
                      nz=None if args.nz <= 1 else args.nz,
                      n_realizations=50, kle_method="uncorrelated",
                      general_config=gcfg,
                      use_pallas_stencil=(None if args.pallas is None
                                          else bool(args.pallas)))
    loss_fn = case["loss_fn"]
    params = case["params"]
    x, y = case["train_groups"][0]
    xb = jnp.asarray(np.reshape(x, (-1,) + x.shape[2:])[:args.batch])
    yb = {k: jnp.asarray(np.reshape(v, (-1,) + v.shape[2:])[:args.batch])
          for k, v in y.items()}

    out = {"fluid": args.fluid, "grid": f"{args.nx}x{args.nx}x{args.nz}",
           "batch": args.batch, "pallas": loss_fn.use_pallas_stencil,
           "pad": args.pad, "bf16": args.bf16, "dt_stride": args.dt_stride,
           "width": args.width, "ms": {}}

    m = loss_fn.models
    x2 = jnp.concatenate([xb, xb], axis=0)

    fwd_p = jax.jit(lambda p, xx: loss_fn._net("pressure", p, xx))
    out["ms"]["fwd_pressure_2B"] = timeit(fwd_p, params, x2)

    fwd_dt = jax.jit(lambda p, xx: loss_fn._net("time_step", p, xx))
    out["ms"]["fwd_dt"] = timeit(fwd_dt, params, xb)

    p_field = fwd_p(params, x2)
    pvt = jax.jit(lambda p, f: m["pvt_model"].apply(p["pvt_model"], f))
    out["ms"]["pvt_2B"] = timeit(pvt, params, p_field)

    pvt_fn = lambda f: m["pvt_model"].apply(params["pvt_model"], f)  # noqa: E731
    well = m["well_rate_bhp_model"]
    p1 = p_field[:args.batch]
    if args.fluid.upper() == "GC":
        sg1 = jnp.clip(loss_fn._net("saturation_model", params, xb), 0.0, loss_fn.Sgi)
        wells = jax.jit(lambda xx, pp, ss: well.compute_rates_and_bhp(
            xx, pp, ss, relperm_model=loss_fn.relperm, model_PVT=pvt_fn))
        out["ms"]["wells"] = timeit(wells, xb, p1, sg1)
    else:
        wells = jax.jit(lambda xx, pp: well.compute_rates_and_bhp(
            xx, pp, None, relperm_model=loss_fn.relperm, model_PVT=pvt_fn))
        out["ms"]["wells"] = timeit(wells, xb, p1)

    # NOTE: return the FULL outputs from jit — returning only a scalar lets
    # XLA dead-code-eliminate the rest (the first version of this tool timed
    # a backward pass that wasn't running)
    bwd_p = jax.jit(jax.grad(
        lambda p, xx: jnp.sum(jnp.square(loss_fn._net("pressure", p, xx)))))
    out["ms"]["fwdbwd_pressure_2B"] = timeit(bwd_p, params, x2)

    bwd_dt = jax.jit(jax.grad(
        lambda p, xx: jnp.sum(jnp.square(loss_fn._net("time_step", p, xx)))))
    out["ms"]["fwdbwd_dt"] = timeit(bwd_dt, params, xb)

    loss = jax.jit(lambda p, xx, yy: loss_fn.loss_and_metrics(p, xx, yy)[0])
    out["ms"]["loss"] = timeit(loss, params, xb, yb)

    grad = jax.jit(lambda p, xx, yy: loss_fn.pinn_batch_sse_grad(p, xx, yy)[:3])
    out["ms"]["loss_grad"] = timeit(grad, params, xb, yb)

    trainer = Trainer(loss_fn, params, donate_params=False)
    step = lambda: trainer.train_step(xb, yb)                   # noqa: E731
    out["ms"]["train_step"] = timeit(step)

    out["ms"] = {k: round(v, 3) for k, v in out["ms"].items()}
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
