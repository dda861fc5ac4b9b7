"""srm_tpu command-line interface.

    python -m srm_tpu generate-data [--base-dir DIR]
    python -m srm_tpu train --fluid DG|GC [--epochs N] [--batch-size B]
                            [--checkpoint-dir DIR] [--resume] [--nx N]
    python -m srm_tpu predict --times 0,10,50 [--realizations K] [--out FILE]
    python -m srm_tpu export --out-dir DIR [--checkpoint-dir DIR]
    python -m srm_tpu benchmark

(The reference had no CLI at all — its only entry point was running the
training example script directly; SURVEY §1.)
"""

from __future__ import annotations

import argparse
import logging
import sys


def cmd_generate_data(args):
    from srm_tpu.data.kle_generator import KLConfig, generate_and_save_realizations
    cfg = KLConfig.from_reservoir_config()
    if args.realizations:
        cfg.n_realizations = args.realizations
    folder = generate_and_save_realizations(cfg, base_dir=args.base_dir,
                                            write_dat_files=not args.no_dat)
    print(f"KLE dataset written to {folder}")


def cmd_train(args):
    drawdown = getattr(args, "drawdown", False)
    fluid = "GC" if drawdown else args.fluid.upper()
    if fluid == "GC":
        from srm_tpu.examples.training_case_gas_condensate import setup_gas_condensate_case as setup
    else:
        from srm_tpu.examples.training_case_dry_gas import setup_dry_gas_case as setup
    from srm_tpu.training.trainer import train_combined_models_unified

    g = None
    opt_cfgs = None
    setup_kwargs = {}
    if getattr(args, "production", False):
        # measured-best TPU settings (bf16 nets + strided Δt input + retuned
        # LR decay): 2.9x the f32 dg3d step AND better converged RMSE
        # (25.5 vs 34.3 psia f32 baseline — BASELINE.md rounds 3-4)
        from srm_tpu.config import (DEFAULT_GENERAL_CONFIG,
                                    apply_production_overrides,
                                    production_optimizer_configs)
        g = apply_production_overrides(DEFAULT_GENERAL_CONFIG)
        # the retuned decay is a ~8000-SAMPLE period: scale its step count to
        # whatever batch size this run actually trains with
        opt_cfgs = production_optimizer_configs(
            batch_size=args.batch_size or g["training_batch_size"])
    if drawdown:
        # measured-best GC below-dew-point recipe: mixed physics/data on FV
        # labels, balanced td errors, 'abs' Sg rectifier, retuned LR decay,
        # sub-dew-point Pi/BHP (12.9 psia / 0.0103 Sg RMSE — BASELINE.md)
        from srm_tpu.config import (DEFAULT_GENERAL_CONFIG, GC_DRAWDOWN_CASE,
                                    apply_drawdown_overrides,
                                    drawdown_optimizer_configs)
        g = apply_drawdown_overrides(g or DEFAULT_GENERAL_CONFIG)
        opt_cfgs = drawdown_optimizer_configs()
        setup_kwargs = dict(GC_DRAWDOWN_CASE)
    case = setup(base_dir=args.base_dir, nx=args.nx,
                 n_realizations=args.realizations, general_config=g,
                 **setup_kwargs)
    params, history, best = train_combined_models_unified(
        case["train_groups"], case["val_groups"], models=case["models"],
        params=case["params"], loss_fn=case["loss_fn"],
        training_batch_size=args.batch_size, epochs=args.epochs,
        general_config=case["general_config"],
        checkpoint_dir=args.checkpoint_dir, resume=args.resume,
        optimizer_configs=opt_cfgs)
    print("final total train loss:", history["total_train_loss"][-1])
    return 0


def _restore_predictor(args):
    """Shared by predict/export: rebuild the case (mirroring any --drawdown
    preset), restore the checkpoint, return (predictor, case, fluid)."""
    from srm_tpu.eval.predictor import SRMPredictor

    drawdown = getattr(args, "drawdown", False)
    fluid = "GC" if drawdown else args.fluid.upper()
    g = None
    setup_kwargs = {}
    if drawdown:
        # mirror the --drawdown train preset so predict restores a
        # checkpoint trained with it against the identical case
        from srm_tpu.config import (DEFAULT_GENERAL_CONFIG, GC_DRAWDOWN_CASE,
                                    apply_drawdown_overrides)
        g = apply_drawdown_overrides(DEFAULT_GENERAL_CONFIG)
        setup_kwargs = dict(GC_DRAWDOWN_CASE)
    if fluid == "GC":
        from srm_tpu.examples.training_case_gas_condensate import setup_gas_condensate_case as setup
    else:
        from srm_tpu.examples.training_case_dry_gas import setup_dry_gas_case as setup
    case = setup(base_dir=args.base_dir, nx=args.nx,
                 n_realizations=args.realizations, general_config=g,
                 **setup_kwargs)
    if args.checkpoint_dir:
        from srm_tpu.utils.checkpoint import CheckpointManager
        mgr = CheckpointManager(args.checkpoint_dir)
        restored = mgr.restore()
        if restored is not None:
            case["params"] = restored[0]
    pred = SRMPredictor(case["models"], case["params"], case["data_summary"],
                        general_config=case["general_config"],
                        reservoir_config=case["processor"].reservoir_config)
    return pred, case, fluid


def cmd_predict(args):
    import numpy as np

    pred, case, fluid = _restore_predictor(args)
    permx = case["processor"].generate_kle_splits()["test"]
    if args.max_realizations:
        permx = permx[: args.max_realizations]
    times = [float(t) for t in args.times.split(",")]
    p = pred.predict_pressure(permx, times)
    print(f"pressure rollout: shape {p.shape}, range "
          f"[{p.min():.1f}, {p.max():.1f}] psia")
    arrays = {"pressure": p, "times": np.asarray(times)}
    if fluid == "GC":
        sg = pred.predict_saturation(permx, times)
        print(f"gas-saturation rollout: shape {sg.shape}, range "
              f"[{sg.min():.4f}, {sg.max():.4f}]")
        arrays["saturation"] = sg
    if args.out:
        np.savez_compressed(args.out, **arrays)
        print(f"saved to {args.out}")
    return 0


def cmd_export(args):
    from srm_tpu.eval.serving import export_surrogate

    pred, _, fluid = _restore_predictor(args)
    fields = ("pressure", "saturation") if fluid == "GC" else ("pressure",)
    platforms = tuple(p.strip() for p in args.platforms.split(",") if p.strip())
    paths = export_surrogate(pred, args.out_dir, fields=fields,
                             platforms=platforms)
    for field, path in paths.items():
        print(f"exported {field}: {path}")
    print(f"serving bundle written to {args.out_dir} "
          f"(platforms: {', '.join(platforms)})")
    return 0


def cmd_benchmark(args):
    import bench
    bench.main()
    return 0


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    parser = argparse.ArgumentParser(prog="srm_tpu", description=__doc__)
    sub = parser.add_subparsers(dest="command", required=True)

    g = sub.add_parser("generate-data", help="generate the KLE dataset + Eclipse decks")
    g.add_argument("--base-dir", default=None)
    g.add_argument("--realizations", type=int, default=None)
    g.add_argument("--no-dat", action="store_true")
    g.set_defaults(fn=cmd_generate_data)

    t = sub.add_parser("train", help="train the SRM")
    t.add_argument("--fluid", default="DG", choices=["DG", "GC", "dg", "gc"])
    t.add_argument("--epochs", type=int, default=5)
    t.add_argument("--batch-size", type=int, default=None)
    t.add_argument("--base-dir", default=None)
    t.add_argument("--nx", type=int, default=None)
    t.add_argument("--realizations", type=int, default=None)
    t.add_argument("--checkpoint-dir", default=None)
    t.add_argument("--resume", action="store_true")
    t.add_argument("--production", action="store_true",
                   help="apply the measured-best TPU settings "
                        "(bfloat16 nets, dt_input_stride=2)")
    t.add_argument("--drawdown", action="store_true",
                   help="apply the measured-best GC below-dew-point recipe "
                        "(implies --fluid GC): mixed physics/data training "
                        "on FV-simulator labels, balanced td errors, 'abs' "
                        "Sg rectifier, retuned LR decay, Pi 4300 / BHP "
                        "floor 2000 psia")
    t.set_defaults(fn=cmd_train)

    p = sub.add_parser("predict", help="pressure (and, for GC, gas-saturation) "
                                       "rollout with the trained surrogate")
    p.add_argument("--fluid", default="DG", choices=["DG", "GC", "dg", "gc"])
    p.add_argument("--drawdown", action="store_true",
                   help="predict against the --drawdown train preset's case "
                        "(implies --fluid GC, sub-dew-point Pi/BHP)")
    p.add_argument("--times", default="0,30,90,180,365")
    p.add_argument("--base-dir", default=None)
    p.add_argument("--nx", type=int, default=None)
    p.add_argument("--realizations", type=int, default=None)
    p.add_argument("--max-realizations", type=int, default=4)
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--out", default=None)
    p.set_defaults(fn=cmd_predict)

    e = sub.add_parser("export", help="serialize the trained surrogate as a "
                                      "StableHLO serving bundle (jax.export; "
                                      "loads with no model/config code)")
    e.add_argument("--fluid", default="DG", choices=["DG", "GC", "dg", "gc"])
    e.add_argument("--drawdown", action="store_true",
                   help="export against the --drawdown train preset's case")
    e.add_argument("--base-dir", default=None)
    e.add_argument("--nx", type=int, default=None)
    e.add_argument("--realizations", type=int, default=None)
    e.add_argument("--checkpoint-dir", default=None)
    e.add_argument("--out-dir", required=True)
    e.add_argument("--platforms", default="cpu,tpu",
                   help="comma-separated lowering platforms baked into the "
                        "artifact (default: cpu,tpu)")
    e.set_defaults(fn=cmd_export)

    b = sub.add_parser("benchmark", help="one-line JSON throughput benchmark")
    b.set_defaults(fn=cmd_benchmark)

    args = parser.parse_args(argv)
    return args.fn(args) or 0


if __name__ == "__main__":
    sys.exit(main())
