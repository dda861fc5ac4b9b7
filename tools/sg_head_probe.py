"""Diagnose WHY the GC saturation head pins at the trivial predict-Sgi floor.

Hypothesis (BASELINE.md round 3): the saturation model's HardLayer squashes
the net output through softplus (``Sg = Sgi - alpha * softplus(net)``); if
training drives the pre-activation far negative, softplus and its gradient
both vanish and the head is permanently dead — no label weighting
(``--sg-td-weight``, ``--td-norm balance``, ``--sg-focus``) can revive it.

This probe trains the GC drawdown case for a few epochs with the measured
recipe, then reports, on a test batch:

* pre-activation (inner network output) min / mean / max;
* softplus(pre-activation) stats — the realized |Sg - Sgi| departure;
* the Sg-label-SSE gradient norm on the saturation net (dead head -> ~0).

Usage: python tools/sg_head_probe.py [--epochs N] [--sat-act ACT]
"""

from __future__ import annotations

import argparse
import copy
import json
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--sat-act", default=None,
                    help="saturation-model input_activation override "
                         "(e.g. 'abs'); default keeps the shipped softplus")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from srm_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    from srm_tpu.config import DEFAULT_GENERAL_CONFIG, DEFAULT_OPTIMIZER_CONFIGS
    from srm_tpu.examples.common import setup_case
    from srm_tpu.training.trainer import Trainer

    g = copy.deepcopy(DEFAULT_GENERAL_CONFIG)
    g["label_source"] = "simulator"
    g["physics_mode_fraction"] = 0.5
    g["td_loss_normalization"] = "balance"
    if args.sat_act:
        g["sat_input_activation"] = args.sat_act
    case = setup_case("GC", base_dir=os.path.join(REPO, "_srm_data"),
                      general_config=g, pi=4300.0, min_bhp=2000.0)

    opt_cfgs = copy.deepcopy(DEFAULT_OPTIMIZER_CONFIGS)
    for cfg in opt_cfgs.values():
        lr = cfg.get("exponential_decay", {}).get("learning_rate")
        if lr and lr.get("enabled"):
            lr["decay_steps"] = 250
    trainer = Trainer(case["loss_fn"], case["params"], optimizer_configs=opt_cfgs)
    trainer.stage_dataset("train", case["train_groups"], args.batch)
    key = jax.random.PRNGKey(0)
    for epoch in range(args.epochs):
        m = trainer.train_epoch_resident("train", jax.random.fold_in(key, epoch))
        jax.block_until_ready(m["total"])
        print(f"  epoch {epoch+1}/{args.epochs} "
              f"loss {float(np.asarray(m['total']).reshape(-1)[-1]):.4g}",
              file=sys.stderr, flush=True)

    xte, yte = case["test_groups"][0]
    xte = np.asarray(xte)
    # fold (K, T, D, H, W, C) -> a (B, D, H, W, C) batch of mid-trajectory samples
    xb = jnp.asarray(xte.reshape((-1,) + xte.shape[2:])[50:82])
    sgas = np.asarray(yte["SGAS"]).reshape((-1,) + xte.shape[2:-1] + (1,))[50:82]

    sat = case["models"]["saturation_model"]
    p_sat = trainer.params["saturation_model"]
    sgi = float(case["loss_fn"].Sgi)

    out, inter = sat.apply(p_sat, xb, capture_intermediates=True)
    # the inner network's output = the HardLayer pre-activation
    flat = jax.tree_util.tree_flatten_with_path(inter)[0]
    pre = None
    for path, val in flat:
        names = "/".join(getattr(k, "key", str(k)) for k in path)
        if "network" in names.lower() or "encoder" in names.lower():
            pre = val
            break
    report = {"sat_act": args.sat_act or "softplus (default)",
              "Sgi": sgi,
              "sg_pred_minus_sgi": {
                  "min": float(jnp.min(out - sgi)),
                  "mean": float(jnp.mean(out - sgi)),
                  "max": float(jnp.max(out - sgi))}}
    if pre is not None:
        pre = jnp.asarray(pre)
        report["pre_activation"] = {"min": float(jnp.min(pre)),
                                    "mean": float(jnp.mean(pre)),
                                    "max": float(jnp.max(pre))}
        report["softplus_pre"] = {
            "mean": float(jnp.mean(jax.nn.softplus(pre))),
            "max": float(jnp.max(jax.nn.softplus(pre)))}

    # Sg-label gradient norm on the saturation net
    lab = jnp.asarray(sgas)

    def label_sse(p):
        o = sat.apply(p, xb)
        return jnp.sum(jnp.square(o - lab))

    grads = jax.grad(label_sse)(p_sat)
    gnorm = float(sum(jnp.sum(jnp.abs(l))
                      for l in jax.tree_util.tree_leaves(grads)))
    nparam = int(sum(np.prod(l.shape)
                     for l in jax.tree_util.tree_leaves(p_sat)))
    report["sg_label_grad_l1_per_param"] = gnorm / max(nparam, 1)
    report["sg_label_sse"] = float(label_sse(p_sat))
    report["trivial_sse"] = float(jnp.sum(jnp.square(sgi - lab)))
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
