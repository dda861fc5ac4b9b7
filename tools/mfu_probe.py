"""MFU probe: isolate the conv-network forward+backward and measure achieved
FLOP/s on the real chip under each candidate lever (VERDICT r2 item 3).

Levers probed (each vs the shipped geometry):

* ``base``       — shipped config (channels 32/48/72/108), f32
* ``bf16``       — compute_dtype=bfloat16
* ``mixed``      — bf16 + f32 input conv/output head (precision_policy)
* ``pad40``      — input spatially padded 39→40 (lane/sublane-aligned),
                   cropped back at the output
* ``pad48``      — padded 39→48
* ``wide``       — channels ×2 (64/96/144/216): fills the 128-lane MXU
* ``wide_bf16``  — both
* ``batchX``     — batch 64/128 (row-dim fill)

Run on the TPU:  python tools/mfu_probe.py [--nz 10] [--batch 32]
Prints one JSON line per case: {case, ms_per_step, gflops, tflops_per_s, mfu}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

PEAK_FLOPS = 197e12


def probe(case_name: str, *, batch=32, nx=39, nz=1, width=(32, 1.5),
          compute_dtype=None, f32_io=False, pad_to=None, reps=20):
    from srm_tpu.config import get_configuration
    from srm_tpu.nn.encoder_decoder import EncoderDecoderModel

    cfg = get_configuration("encoder_decoder",
                            input_shape=(1, nz, nx, nx, 1) if nz > 1 else None)
    cfg["spatial_dims"] = 3 if nz > 1 else 2
    cfg["temporal"] = False
    cfg["width"] = {"Bottom_Size": width[0], "Growth_Rate": width[1]}
    cfg["compute_dtype"] = compute_dtype
    cfg["f32_io"] = f32_io
    model = EncoderDecoderModel.from_config(cfg)

    shape = (batch, nz, nx, nx, 5) if nz > 1 else (batch, nx, nx, 5)
    x = jax.random.uniform(jax.random.PRNGKey(0), shape, jnp.float32, -1, 1)
    params = model.init(jax.random.PRNGKey(1), x)

    if pad_to is not None:
        d = pad_to - nx

        def fwd(p, xx):
            pads = ([(0, 0), (0, 0), (0, d), (0, d), (0, 0)] if nz > 1
                    else [(0, 0), (0, d), (0, d), (0, 0)])
            y = model.apply(p, jnp.pad(xx, pads))
            sl = ((slice(None), slice(None), slice(0, nx), slice(0, nx))
                  if nz > 1 else (slice(None), slice(0, nx), slice(0, nx)))
            return y[sl]
    else:
        def fwd(p, xx):
            return model.apply(p, xx)

    def loss(p, xx):
        return jnp.sum(jnp.square(fwd(p, xx)))

    step = jax.jit(jax.grad(loss))
    g = step(params, x)
    jax.block_until_ready(g)

    t0 = time.perf_counter()
    for _ in range(reps):
        g = step(params, x)
    jax.block_until_ready(g)
    dt = (time.perf_counter() - t0) / reps

    flops = None
    try:
        ca = step.lower(params, x).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        if ca and "flops" in ca:
            flops = float(ca["flops"])
    except Exception:
        pass

    out = {"case": case_name, "ms_per_step": round(dt * 1e3, 3),
           "batch": batch, "grid": f"{nx}x{nx}x{nz}"}
    if flops:
        out["gflops"] = round(flops / 1e9, 2)
        out["tflops_per_s"] = round(flops / dt / 1e12, 2)
        out["mfu"] = round(flops / dt / PEAK_FLOPS, 4)
    print(json.dumps(out), flush=True)
    return out


def probe_two_nets(case_name: str, *, batch=32, nx=39, nz=1,
                   compute_dtype=None, stacked=False, reps=20):
    """Two architecturally-identical encoder-decoders (the GC pressure +
    saturation pair, nn/modules.py:129-171) evaluated either sequentially
    (the shipped design) or as one vmap-over-stacked-params forward
    (VERDICT r2 item 3b). On TPU, vmapping params turns each conv into a
    grouped/batched conv — this probe measures whether XLA executes that
    faster than two plain convs."""
    from srm_tpu.config import get_configuration
    from srm_tpu.nn.encoder_decoder import EncoderDecoderModel

    cfg = get_configuration("encoder_decoder",
                            input_shape=(1, nz, nx, nx, 1) if nz > 1 else None)
    cfg["spatial_dims"] = 3 if nz > 1 else 2
    cfg["temporal"] = False
    cfg["compute_dtype"] = compute_dtype
    model = EncoderDecoderModel.from_config(cfg)

    shape = (batch, nz, nx, nx, 5) if nz > 1 else (batch, nx, nx, 5)
    x = jax.random.uniform(jax.random.PRNGKey(0), shape, jnp.float32, -1, 1)
    p1 = model.init(jax.random.PRNGKey(1), x)
    p2 = model.init(jax.random.PRNGKey(2), x)

    if stacked:
        pstk = jax.tree_util.tree_map(lambda a, b: jnp.stack([a, b]), p1, p2)

        def loss(p, xx):
            y = jax.vmap(model.apply, in_axes=(0, None))(p, xx)
            return jnp.sum(jnp.square(y))

        args_ = (pstk, x)
    else:
        def loss(ps, xx):
            return (jnp.sum(jnp.square(model.apply(ps[0], xx)))
                    + jnp.sum(jnp.square(model.apply(ps[1], xx))))

        args_ = ((p1, p2), x)

    step = jax.jit(jax.grad(loss))
    g = step(*args_)
    jax.block_until_ready(g)
    t0 = time.perf_counter()
    for _ in range(reps):
        g = step(*args_)
    jax.block_until_ready(g)
    dt = (time.perf_counter() - t0) / reps
    out = {"case": case_name, "ms_per_step": round(dt * 1e3, 3),
           "batch": batch, "grid": f"{nx}x{nx}x{nz}"}
    print(json.dumps(out), flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nz", type=int, default=1)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--nx", type=int, default=39)
    args = ap.parse_args()
    b, nx, nz = args.batch, args.nx, args.nz

    probe("base", batch=b, nx=nx, nz=nz)
    probe("bf16", batch=b, nx=nx, nz=nz, compute_dtype="bfloat16")
    probe("mixed", batch=b, nx=nx, nz=nz, compute_dtype="bfloat16", f32_io=True)
    probe("pad40", batch=b, nx=nx, nz=nz, pad_to=40)
    probe("pad48", batch=b, nx=nx, nz=nz, pad_to=48)
    probe("pad40_bf16", batch=b, nx=nx, nz=nz, pad_to=40, compute_dtype="bfloat16")
    probe("wide", batch=b, nx=nx, nz=nz, width=(64, 1.5))
    probe("wide_bf16", batch=b, nx=nx, nz=nz, width=(64, 1.5),
          compute_dtype="bfloat16")
    probe("batch2x", batch=2 * b, nx=nx, nz=nz)
    probe("batch2x_bf16", batch=2 * b, nx=nx, nz=nz, compute_dtype="bfloat16")


if __name__ == "__main__":
    main()
