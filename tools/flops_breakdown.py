"""Per-op breakdown of the hand FLOP model over a lowered train step.

Diagnoses where the matmul FLOPs of a case go: aggregates
``stablehlo.dot_general``/``stablehlo.convolution`` records by their type
signature and prints the top contributors.  Used in round 4 to chase the
superlinear-in-batch FLOP growth seen in the bench MFU rows.

Usage:
    JAX_PLATFORMS=cpu python tools/flops_breakdown.py --batch 32 --nz 10
"""

from __future__ import annotations

import argparse
import collections
import os
import re
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from srm_tpu.utils.flops import _conv_flops, _dot_flops, _op_records  # noqa: E402

_SIG_TXT = re.compile(r":\s*\(([^)]*)\)\s*->\s*(tensor<[^>]+>)")


def breakdown(stablehlo_text: str, top: int = 15):
    agg = collections.Counter()
    count = collections.Counter()
    for rec in _op_records(stablehlo_text):
        if "stablehlo.dot_general" in rec:
            f = _dot_flops(rec)
            kind = "dot"
        elif "stablehlo.convolution" in rec:
            f = _conv_flops(rec)
            kind = "conv"
        else:
            continue
        m = _SIG_TXT.search(rec)
        sig = m.group(0)[:140] if m else rec[:140]
        agg[f"{kind} {sig}"] += f
        count[f"{kind} {sig}"] += 1
    total = sum(agg.values())
    print(f"total matmul FLOPs: {total/1e9:.2f} G")
    for sig, f in agg.most_common(top):
        print(f"  {f/1e9:12.3f} G  x{count[sig]:<4d} {sig}")
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--nx", type=int, default=39)
    ap.add_argument("--nz", type=int, default=10)
    ap.add_argument("--realizations", type=int, default=8)
    ap.add_argument("--production", action="store_true", default=True)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--epoch", action="store_true",
                    help="lower the full resident-epoch program (default: "
                         "one train step)")
    ap.add_argument("--top", type=int, default=15)
    args = ap.parse_args()

    import jax

    from srm_tpu.config import DEFAULT_GENERAL_CONFIG, apply_production_overrides
    from srm_tpu.examples.common import setup_case
    from srm_tpu.training.trainer import Trainer

    g = apply_production_overrides(DEFAULT_GENERAL_CONFIG)
    if args.remat:
        g["remat_forwards"] = True
    base = os.environ.get("SRM_TPU_WORKING_DIRECTORY",
                          os.path.join(HERE, "_srm_data"))
    case = setup_case("DG", base_dir=base, nx=args.nx, nz=args.nz,
                      n_realizations=args.realizations,
                      kle_method="uncorrelated", general_config=g)
    trainer = Trainer(case["loss_fn"], case["params"])
    nb, _ = trainer.stage_dataset("train", case["train_groups"], args.batch)
    key = jax.random.PRNGKey(0)

    if args.epoch:
        x_all, y_all, nb_, _ = trainer._resident["train"]
        lowered = trainer._train_epoch_resident.lower(
            trainer.params, trainer.opt_state, key, (x_all, y_all), nb_)
        print(f"epoch program, nb={nb_}, batch={args.batch}")
    else:
        import jax.numpy as jnp
        x_all, y_all, _, _ = trainer._resident["train"]
        x = jnp.asarray(x_all[: args.batch])
        y = jax.tree_util.tree_map(lambda a: jnp.asarray(a[: args.batch]), y_all)
        lowered = trainer._train_step.lower(
            trainer.params, trainer.opt_state, x, y)
        print(f"train step program, batch={args.batch}")
    breakdown(lowered.as_text(), args.top)


if __name__ == "__main__":
    main()
