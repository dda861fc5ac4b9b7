"""Measure the REAL TensorFlow reference's training throughput (CPU).

Runs the reference's OWN code — not an emulation:

* Model 1 / Model 2 are built with the reference's Keras classes
  (``CompleteTrainableModule`` over ``EncoderDecoderModel`` /
  ``ResidualNetworkLayer``) using the exact config mutations of the entry
  point (``/root/reference/srm_training_examples/training_case_dry_gas_i.py:
  67-195``; that file itself cannot be imported — it imports the missing
  ``physics_loss_Subclassed`` module).
* PVT is the reference's ``PolyharmonicSplineInterpolationLayer`` (per-call
  ``tf.linalg.solve``) with the derivative via an inner ``GradientTape``,
  exactly as ``PVT_Layer_Subclassed.py:118-141,189-205`` does.
* The loss+grad step is the reference's legacy
  ``pinn_batch_sse_grad`` / ``physics_error_gas_2D``
  (``/root/reference/physics_loss.py:9-227,742-870``), exec-ed with its
  dangling symbols injected (the file is a snippet: ``tf``, ``nonormalize``
  etc. are unbound — SURVEY.md §7.4). A composite Keras model provides the
  reconstructed output-stacking contract of the missing ``PhysicsLoss``
  class (SURVEY.md §2.1 #13).
* The step loop mirrors ``training.py:594-652``: eager per-step Python,
  tensor conversion, the single jit-compiled loss kernel with NINE
  per-term gradient tapes, per-term scalar ``.numpy()`` syncs, Keras
  optimizer ``apply_gradients`` per model.

Well rates are a constant target-rate scatter (the reference's separate
``WellRatesPressure`` solver is NOT timed) — this makes the TF baseline
FASTER than the full reference pipeline, i.e. the reported speedup of the
JAX rebuild is a lower bound.

Usage: python tools/tf_reference_benchmark.py [--steps 20] [--batch 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import types

import numpy as np

REF = "/root/reference"

# legacy Keras 2 (the reference's era): Keras 3 variables carry string dtypes
# that break tape.gradient(..., UnconnectedGradients.ZERO) under jit_compile
os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")

# --- stub python-dotenv before the reference configs import it -------------
dotenv_stub = types.ModuleType("dotenv")
dotenv_stub.load_dotenv = lambda *a, **k: None
sys.modules.setdefault("dotenv", dotenv_stub)
os.environ.setdefault("WORKING_DIRECTORY", "/tmp/tf_ref_bench")
sys.path.insert(0, REF)

H = W = 39
PI = 5000.0
TMAX = 365.0
SWMIN = 0.22
SGI = 1.0 - SWMIN
PHI = 0.2
DX = DY = 2900.0 / 39.0
DZ = 80.0
CF = 97.32e-6 / (1.0 + 55.8721 * PHI**1.428586)


def build_reference_models(tf):
    import EncoderDecoderSubclassed
    EncoderDecoderSubclassed.DEBUG_SHAPES = False
    from complete_trainable_module import CompleteTrainableModule
    from default_configurations import (
        DEFAULT_GENERAL_CONFIG, DEFAULT_RESERVOIR_CONFIG, get_configuration,
    )

    ed = get_configuration("encoder_decoder")
    ed["spatial_dims"] = 2
    ed["temporal"] = True
    ed["residual_params"]["Extra_Conv_Layers"]["Count"] = 2
    ed["residual_params"]["Extra_Dec_Conv_Layers"]["Count"] = 2
    ed["residual_params"]["Latent_Layer"]["Depth"] = 1
    ed["residual_params"]["Latent_Layer"]["Activation"] = None
    ed["residual_params"]["Out_Activation_Func"] = None
    ed["residual_params"]["Skip_Connections"] = {"Add": False, "Layers": [1, 1, 1, 1]}
    hard = get_configuration("hard_layer", use_rbf=False)
    hard["init_value"] = DEFAULT_RESERVOIR_CONFIG["initialization"]["Pi"]
    hard["kernel_activation"] = None
    hard["kernel_exponent_config"]["initial_value"] = (0.5,)
    hard["kernel_exponent_config"]["min_value"] = 0.1
    hard["kernel_exponent_config"]["max_value"] = 1
    slc = get_configuration("input_slice")

    m1 = CompleteTrainableModule(network_type="encoder_decoder",
                                 encoder_decoder_config=ed, use_hard_layer=True,
                                 hard_layer_config=hard, input_slice_config=slc)
    inp = tf.keras.layers.Input(shape=(1, H, W, 6))
    model1 = tf.keras.Model(inputs=inp, outputs=m1(inp), name="m1")

    res = get_configuration("residual")
    res["network_type"] = "cnn"
    res["number_of_output_bins"] = 50
    res["temporal"] = True
    res["output_distribution"] = False
    max_lim = DEFAULT_GENERAL_CONFIG["maximum_srm_timestep"]

    def scaled_tanh_with_xtanhx(x, min_val=0.1, max_val=10.0, steepness=1.0):
        lisht = x * tf.math.tanh(x)
        return (max_val - min_val) * tf.math.tanh(steepness * lisht) + min_val

    res["output_activation"] = lambda x: scaled_tanh_with_xtanhx(x, max_val=max_lim)
    m2 = CompleteTrainableModule(network_type="residual",
                                 residual_network_config=res,
                                 use_hard_layer=False, input_slice_config=slc)
    inp2 = tf.keras.layers.Input(shape=(1, H, W, 6))
    model2 = tf.keras.Model(inputs=inp2, outputs=m2(inp2), name="m2")
    return model1, model2


def build_spline_pvt(tf):
    """The reference's spline interpolant (per-call tf.linalg.solve) over the
    37-knot PVT table, value+derivative via inner GradientTape."""
    from polyhm_splines import PolyharmonicSplineInterpolationLayer
    import csv

    table = os.path.join(os.path.dirname(__file__), "..", "srm_tpu", "data",
                         "assets", "pvt_table.csv")
    rows = list(csv.DictReader(open(table)))
    pre = np.array([float(r["Pre"]) for r in rows], np.float32)
    invBg = np.array([float(r["InvBg"]) for r in rows], np.float32)
    invug = np.array([float(r["Invug"]) for r in rows], np.float32)

    layers = {
        "invBg": PolyharmonicSplineInterpolationLayer(pre, invBg, order=1),
        "invug": PolyharmonicSplineInterpolationLayer(pre, invug, order=1),
    }

    def pvt(p):
        p_clip = tf.clip_by_value(p, 14.7, 10000.0)
        outs = {}
        for k, layer in layers.items():
            with tf.GradientTape() as g:
                g.watch(p_clip)
                flat = tf.reshape(p_clip, (1, -1, 1))
                v = layer(flat)
                v = tf.reshape(v, tf.shape(p_clip))
            outs[k] = (v, g.gradient(v, p_clip))
        return outs

    return pvt


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--json-out", type=str, default=None)
    ap.add_argument("--no-xla", action="store_true",
                    help="run the loss kernel as plain tf.function graph mode "
                         "(the reference's jit_compile=True kernel can take "
                         ">40 min to XLA-compile on CPU)")
    args = ap.parse_args(argv)

    import tensorflow as tf
    tf.get_logger().setLevel("ERROR")

    model1, model2 = build_reference_models(tf)
    pvt = build_spline_pvt(tf)

    conn = np.array([[9, 9, 0], [29, 29, 0], [9, 29, 0], [29, 9, 0]], np.int64)
    q_rates = np.array([5000.0, 5000.0, 5000.0, 5000.0], np.float32)
    qgrid = np.zeros((H, W, 1), np.float32)
    qgrid[conn[:, 0], conn[:, 1], 0] = q_rates

    model, pinn_batch_sse_grad = build_composite(
        tf, model1, model2, pvt, qgrid, no_xla=args.no_xla)
    main_step_loop(args, tf, model, pinn_batch_sse_grad)


def build_composite(tf, model1, model2, pvt, qgrid,
                    nonormalize=None, normalize_diff=None, no_xla=False):
    """Build the composite SRM model + the reference's loss kernel.

    ``nonormalize``/``normalize_diff`` are the denormalization wrappers the
    legacy kernel expects as free symbols; by default linear (-1,1) scalings
    over the module constants (TMAX, kmin/kmax) — pass stats-driven versions
    (see tf_rmse_experiment.py) to match an exported dataset exactly.
    """
    kmin, kmax = 0.3, 25.0
    if nonormalize is None:
        def nonormalize(model, v, stat_idx=None, compute=True):
            if stat_idx == 3:
                return (v + 1.0) * 0.5 * TMAX
            if stat_idx == 4:
                return tf.ones_like(v) * PHI
            if stat_idx == 5:
                return (v + 1.0) * 0.5 * (kmax - kmin) + kmin
            raise ValueError(stat_idx)
    if normalize_diff is None:
        def normalize_diff(model, dv, stat_idx=None, compute=True):
            return dv * 2.0 / TMAX

    # well connections: the cells the q scatter marks (row-major j,i order)
    jj, ii = np.nonzero(qgrid[..., 0])
    conn = np.stack([jj, ii, np.zeros_like(jj)], axis=1).astype(np.int64)
    q_rates = qgrid[jj, ii, 0].astype(np.float32)

    def time_shifting(model, x, shift_frac_mean=0.05, pred_cycle_mean=0.0, random=False):
        return list(x), tf.constant(1.0, tf.float32), tf.constant(10.0, tf.float32)

    class _DNN:
        @staticmethod
        def conn_shutins_idx(tn0, conn_idx, days):
            return tf.ones_like(tn0)

    src = open(os.path.join(REF, "physics_loss.py")).read()
    # TF 2.21 compatibility: the string form isn't auto-converted under
    # jit_compile in this version
    src = src.replace("unconnected_gradients='zero'",
                      "unconnected_gradients=tf.UnconnectedGradients.ZERO")
    if no_xla:
        src = src.replace("@tf.function(jit_compile=True)", "@tf.function")
    # AutoGraph re-reads source from the compile() filename, so the patched
    # text must exist on disk
    import tempfile
    patched = os.path.join(tempfile.gettempdir(), "ref_physics_loss_tf221.py")
    with open(patched, "w") as f:
        f.write(src)
    ns = {"tf": tf, "np": np, "nonormalize": nonormalize,
          "normalize_diff": normalize_diff, "time_shifting": time_shifting,
          "dnn": _DNN(),
          "zeros_to_ones": lambda t: tf.where(t == 0, tf.ones_like(t), t)}
    exec(compile(src, patched, "exec"), ns)

    class CompositeSRM(tf.keras.Model):
        """The missing PhysicsLoss class's model-stacking contract
        (SURVEY.md §2.1 #13): [p, Sg, invBg, invug, dPVT, Δt, _, q, pwf]."""

        dtype_ = tf.float32

        def __init__(self):
            super().__init__()
            self.m1, self.m2 = model1, model2
            self.nwt = tf.constant([1., 0., 0., 1., 0., 1., 0., 0.], tf.float32)
            self.nT = 1
            self.nT_list = [0]
            self.cf = CF
            self.cfd_type = {
                "Dimension": {"Gridblock_Dim": [DX, DY, DZ], "Dim": (H, W, 1),
                              "Measurement": [2900.0, 2900.0, 80.0]},
                "Conn_Idx": tf.constant(conn),
                "Init_Grate": tf.constant(q_rates),
                "Min_BHP": tf.constant([2000.0] * 4, tf.float32),
                "Completion_Ratio": 1.0,
                "SCAL": {"End_Points": {"Swmin": SWMIN}},
                "Kr_gas_oil": lambda sg: (tf.constant(0.0), tf.constant(0.9)),
                "Max_Train_Time": TMAX, "Pi": PI,
                "Init_InvBg": 5.0, "Init_DinvBg": 1e-3, "Init_Invug": 30.0,
                "Connection_Shutins": {"Days": [[[0.0, 0.0]]] * 4},
            }
            self.loss_func = {
                "Physics_Error": ns["physics_error_gas_2D"],
                "Squeeze_Out": lambda t: t,
                "Reshape": lambda t: t,
                "Reduce_Axis": [1, 2, 3],
            }

        def call(self, x, training=False):
            xt = tf.concat([t[:, None] for t in x], axis=-1)     # (B,1,H,W,6)
            p = self.m1(xt, training=training)[:, 0]             # (B,H,W,1)
            dtf = self.m2(xt, training=training)[:, 0]
            props = pvt(p)
            invBg, dinvBg = props["invBg"]
            invug, dinvug = props["invug"]
            dPVT = tf.stack([dinvBg, dinvug], axis=0)
            q = tf.ones_like(p) * tf.constant(qgrid)
            return [p, tf.ones_like(p) * SGI, invBg, invug, dPVT,
                    dtf, tf.zeros_like(p), q, tf.zeros_like(p)]

    return CompositeSRM(), ns["pinn_batch_sse_grad"]


def main_step_loop(args, tf, model, pinn_batch_sse_grad):
    rng = np.random.RandomState(0)
    xs = [rng.uniform(-1, 1, (args.batch, H, W, 1)).astype(np.float32)
          for _ in range(6)]
    ys = [np.zeros((args.batch, H, W, 1), np.float32)]

    opt1 = tf.keras.optimizers.Adam(1e-4)
    opt2 = tf.keras.optimizers.Adam(1e-4)

    def one_step():
        # the reference loop: convert per step (training.py:595-600), one
        # compiled loss+9-tape kernel, per-term scalar syncs (:608-640),
        # per-model eager apply (:643-652)
        x_batch = [tf.convert_to_tensor(a) for a in xs]
        y_batch = [tf.convert_to_tensor(a) for a in ys]
        wsse, wsse_grad, error_count, wmse, y_model = pinn_batch_sse_grad(
            model, x_batch, y_batch)
        loss_scalars = [float(w.numpy().sum()) for w in wmse]     # host syncs
        grads = wsse_grad[0]
        n1 = len(model.m1.trainable_variables)
        opt1.apply_gradients(zip(grads[:n1], model.trainable_variables[:n1]))
        opt2.apply_gradients(zip(grads[n1:n1 + len(model.m2.trainable_variables)],
                                 model.trainable_variables[n1:n1 + len(
                                     model.m2.trainable_variables)]))
        return loss_scalars[0]

    print("compiling (first step)...", flush=True)
    t0 = time.time()
    loss0 = one_step()
    print(f"first step (incl. XLA compile): {time.time()-t0:.1f}s, loss {loss0:.3e}")
    one_step()   # settle caches

    t0 = time.time()
    for _ in range(args.steps):
        one_step()
    dt = time.time() - t0
    sps = args.steps / dt
    result = {"tf_reference_steps_per_sec": round(sps, 3),
              "batch": args.batch, "grid": f"{H}x{W}",
              "steps": args.steps, "wall_s": round(dt, 2),
              "xla": not args.no_xla,
              "tf_version": tf.__version__, "device": "cpu"}
    print(json.dumps(result))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(result, f)


if __name__ == "__main__":
    main()
