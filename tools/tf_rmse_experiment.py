"""TF-reference half of the matched-RMSE experiment (see rmse_experiment.py).

Trains the reference's OWN Keras models with its legacy physics kernel
(graph mode — its faster variant on this host, see BASELINE.md) on the
features exported by ``rmse_experiment.py export``, evaluating pressure RMSE
against the SAME FV-simulator labels at intervals. Prints ONE JSON line with
the ``[(wall_s, step, rmse), ...]`` trajectory.

Feature channels in the npz follow srm_tpu order ``z,y,x,time,permx``
(normalized, lnk-linear-scaling to (-1,1)); the reference kernel consumes a
6-list ``[x0,x1,x2,time,phi,permx]`` and denormalizes channels 3/4/5 via the
injected ``nonormalize`` — here wired to the EXPORTED stats rows so both
frameworks see identical physical quantities (time linear inverse, permx
log-branch inverse; ref auxiliary_functions.py:175-225).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, HERE)

import tf_reference_benchmark as harness  # noqa: E402  (shared builders)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--npz", default=os.path.join(REPO, "_srm_data",
                                                  "rmse_experiment.npz"))
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--eval-every", type=int, default=50)
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args(argv)

    data = np.load(args.npz)
    x_train = data["x_train"]          # (K, T, 1, H, W, 5) or (N, 1, H, W, 5)
    x_test = data["x_test"]
    y_test = data["y_test_pressure"]   # psia
    t_lo, t_hi = float(data["stats_time"][0]), float(data["stats_time"][1])
    k_lo, k_hi = float(data["stats_permx"][0]), float(data["stats_permx"][1])
    qgrid = data["q_grid"]             # (H, W, 1)

    if x_train.ndim == 6:              # collapse (K, T)
        x_train = x_train.reshape((-1,) + x_train.shape[2:])
    if x_test.ndim == 6:
        x_test = x_test.reshape((-1,) + x_test.shape[2:])
        y_test = y_test.reshape((-1,) + y_test.shape[2:]) \
            if y_test.ndim >= 5 else y_test.reshape(-1, *y_test.shape[-2:])

    import tensorflow as tf
    tf.get_logger().setLevel("ERROR")

    model1, model2 = harness.build_reference_models(tf)
    pvt = harness.build_spline_pvt(tf)
    PHI = harness.PHI

    # stats-driven inverses of srm_tpu's lnk-linear-scaling (a,b)=(-1,1)
    def nonormalize(model, v, stat_idx=None, compute=True):
        if stat_idx == 3:
            return (v + 1.0) * 0.5 * (t_hi - t_lo) + t_lo
        if stat_idx == 4:
            return tf.ones_like(v) * PHI
        if stat_idx == 5:
            return tf.exp(tf.math.log(k_hi / k_lo) * (v + 1.0) * 0.5
                          + tf.math.log(k_lo))
        raise ValueError(stat_idx)

    def normalize_diff(model, dv, stat_idx=None, compute=True):
        return dv * 2.0 / (t_hi - t_lo)

    model, pinn_batch_sse_grad = harness.build_composite(
        tf, model1, model2, pvt, qgrid, nonormalize, normalize_diff,
        no_xla=True)

    # the reference's own optimizer defaults (default_configurations.py:
    # 310-345): AdamW lr=0.005 wd=5e-5 with exp LR decay (25, 0.90) for the
    # pressure model, Adam 1e-4 for the time-step model
    lr1 = tf.keras.optimizers.schedules.ExponentialDecay(
        0.005, decay_steps=25, decay_rate=0.90, staircase=False)
    try:
        opt1 = tf.keras.optimizers.AdamW(learning_rate=lr1, weight_decay=5e-5)
    except AttributeError:
        opt1 = tf.keras.optimizers.Adam(learning_rate=lr1)
    opt2 = tf.keras.optimizers.Adam(1e-4)
    n1 = None

    # features: srm_tpu channel order z,y,x,time,permx (drop the leading
    # folded-time axis) → reference 6-list x0,x1,x2,time,phi,permx
    def to_list(xb):
        xb = xb[:, 0]                              # (B, H, W, 5)
        chans = [xb[..., i:i + 1] for i in range(5)]
        phi = np.zeros_like(chans[0])
        return [chans[2], chans[1], chans[0], chans[3], phi, chans[4]]

    ys = [np.zeros((args.batch,) + x_train.shape[2:4] + (1,), np.float32)]
    rng = np.random.RandomState(0)

    def one_step():
        nonlocal n1
        idx = rng.randint(0, x_train.shape[0], size=args.batch)
        xl = [tf.convert_to_tensor(a) for a in to_list(x_train[idx])]
        yl = [tf.convert_to_tensor(a) for a in ys]
        wsse, wsse_grad, error_count, wmse, y_model = pinn_batch_sse_grad(
            model, xl, yl)
        loss = float(wmse[0].numpy().sum())
        grads = wsse_grad[0]
        if n1 is None:
            n1 = len(model.m1.trainable_variables)
        opt1.apply_gradients(zip(grads[:n1], model.trainable_variables[:n1]))
        opt2.apply_gradients(
            zip(grads[n1:n1 + len(model.m2.trainable_variables)],
                model.trainable_variables[n1:n1 + len(
                    model.m2.trainable_variables)]))
        return loss

    @tf.function
    def predict_pressure(xt):
        return model.m1(xt, training=False)

    def rmse_now():
        preds = []
        for i in range(0, x_test.shape[0], 256):
            xb = x_test[i:i + 256, 0]
            xl = to_list(x_test[i:i + 256])
            xt = tf.concat([t[:, None] for t in xl], axis=-1)
            preds.append(predict_pressure(xt).numpy()[:, 0, ..., 0])
        pred = np.concatenate(preds, axis=0)
        true = y_test.reshape(pred.shape)
        return float(np.sqrt(np.mean((pred - true) ** 2)))

    pi_rmse = float(np.sqrt(np.mean((y_test - 5000.0) ** 2)))

    print("compiling...", file=sys.stderr, flush=True)
    one_step()
    traj = []
    t0 = time.time()
    for s in range(1, args.steps + 1):
        one_step()
        if s % args.eval_every == 0 or s == args.steps:
            wall = time.time() - t0
            r = rmse_now()
            traj.append({"wall_s": round(wall, 1), "step": s,
                         "rmse_psia": round(r, 3)})
            print(f"step {s}: wall {wall:.0f}s rmse {r:.2f}",
                  file=sys.stderr, flush=True)
            if args.json_out:   # partial dump: long runs may be cut short
                with open(args.json_out, "w") as f:
                    json.dump({"framework": "tf_reference", "device": "cpu",
                               "batch": args.batch, "partial": s < args.steps,
                               "rmse_predict_pi": round(pi_rmse, 3),
                               "trajectory": traj}, f)

    out = {"framework": "tf_reference", "device": "cpu",
           "batch": args.batch, "rmse_predict_pi": round(pi_rmse, 3),
           "trajectory": traj}
    print(json.dumps(out))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(out, f)


if __name__ == "__main__":
    main()
