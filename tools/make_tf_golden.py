"""Generate the TF-reference golden file for the DG residual parity test.

Executes the REFERENCE's own ``physics_error_gas_2D``
(``/root/reference/physics_loss.py:9-227``) — not a re-implementation — by
exec-ing its source with the missing module-level symbols injected
(the file is a snippet with no imports: ``tf``, ``nonormalize``,
``normalize_diff``, ``time_shifting`` and ``dnn`` are all dangling,
see SURVEY.md §7.4). A dummy "model" returns fixed synthetic fields, so the
comparison isolates exactly the stencil/coefficient assembly.

Outputs ``tests/golden/tf_dg_residual.npz`` holding the synthetic inputs and
the reference-computed (dom, ibc, mbc) tensors. Run once on a machine with
TensorFlow; the committed npz then gates JAX-side parity forever
(tests/test_tf_golden.py).
"""

from __future__ import annotations

import os
import sys

import numpy as np

REF = "/root/reference/physics_loss.py"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden",
                   "tf_dg_residual.npz")

B, H, W = 2, 13, 13
DX = DY = 2900.0 / 39.0
DZ = 80.0
PHI = 0.2
PI = 5000.0
TMAX = 365.0
SWMIN = 0.22
SGI = 1.0 - SWMIN
KRGO = 0.9        # constant DG relperm at Sgi
C1, C0 = 2.1e-7, 1.2e-4          # invBg = C0 + C1 * p   (linear synthetic PVT)
D1, D0 = 3.3e-6, 55.0            # invug = D0 + D1 * p
CF = 97.32e-6 / (1.0 + 55.8721 * PHI**1.428586)

rng = np.random.RandomState(7)
kx_c = np.exp(rng.uniform(0.0, 2.5, (B, H, W, 1))).astype(np.float32)
p0 = (PI - 300.0 * rng.uniform(0.2, 1.0, (B, H, W, 1))).astype(np.float32)
p1 = (p0 - 120.0 * rng.uniform(0.2, 1.0, (B, H, W, 1))).astype(np.float32)
t1 = rng.uniform(3.0, 8.0, (B, 1, 1, 1)).astype(np.float32)   # Δt means
t2 = rng.uniform(3.0, 8.0, (B, 1, 1, 1)).astype(np.float32)

conn = np.array([[3, 3, 0], [9, 9, 0], [3, 9, 0], [9, 3, 0]], np.int64)  # (j,i,0)
q_rates = np.array([120.0, 90.0, 60.0, 150.0], np.float32)
qgrid = np.zeros((H, W, 1), np.float32)
qgrid[conn[:, 0], conn[:, 1], 0] = q_rates
q1 = np.broadcast_to(qgrid, (B, H, W, 1)).astype(np.float32)


def main():
    import tensorflow as tf

    def nonormalize(model, v, stat_idx=None, compute=True):
        if stat_idx == 3:                                   # time, linear (-1,1)
            return (v + 1.0) * 0.5 * TMAX
        if stat_idx == 4:                                   # porosity: constant
            return tf.ones_like(v) * PHI
        if stat_idx == 5:                                   # permx: the grid itself
            return tf.constant(kx_c) * tf.ones_like(v)
        raise ValueError(stat_idx)

    def normalize_diff(model, dv, stat_idx=None, compute=True):
        assert stat_idx == 3
        return dv * 2.0 / TMAX

    def time_shifting(model, x, shift_frac_mean=0.05, pred_cycle_mean=0.0, random=False):
        return list(x), tf.constant(1.0, tf.float32), tf.constant(10.0, tf.float32)

    class _DNN:
        @staticmethod
        def conn_shutins_idx(tn0, conn_idx, days):
            return tf.ones_like(tn0)

    class DummyModel:
        """Callable satisfying the reference's implied model contract
        (SURVEY.md §2.1 #14): returns the fixed synthetic field stack; the
        first call is time level n0, the second n1."""

        dtype = tf.float32

        def __init__(self):
            self.calls = 0
            self.cf = CF
            self.cfd_type = {
                "Dimension": {"Gridblock_Dim": [DX, DY, DZ], "Dim": (H, W, 1),
                              "Measurement": [2900.0, 2900.0, 80.0]},
                "Conn_Idx": tf.constant(conn),
                "Init_Grate": tf.constant(q_rates),
                "Min_BHP": tf.constant([2000.0] * len(q_rates), tf.float32),
                "Completion_Ratio": 1.0,
                "SCAL": {"End_Points": {"Swmin": SWMIN}},
                "Kr_gas_oil": lambda sg: (tf.constant(0.0), tf.constant(KRGO)),
                "Max_Train_Time": TMAX,
                "Pi": PI,
                "Init_InvBg": C0 + C1 * PI,
                "Init_DinvBg": C1,
                "Init_Invug": D0 + D1 * PI,
                "Connection_Shutins": {"Days": [[[0.0, 0.0]]] * len(q_rates)},
            }

        def __call__(self, x, training=False):
            p = tf.constant(p0 if self.calls == 0 else p1)
            dtf = tf.ones_like(p) * tf.constant(t1 if self.calls == 0 else t2)
            self.calls += 1
            invBg = C0 + C1 * p
            invug = D0 + D1 * p
            dPVT = tf.stack([tf.ones_like(p) * C1, tf.ones_like(p) * D1], axis=0)
            sg = tf.ones_like(p) * SGI
            q = tf.constant(q1)
            pwf = tf.ones_like(p) * 3000.0
            return [p, sg, invBg, invug, dPVT, dtf, tf.zeros_like(p), q, pwf]

    # exec the reference source with the dangling symbols injected
    src = open(REF).read()
    ns = {"tf": tf, "np": np, "nonormalize": nonormalize,
          "normalize_diff": normalize_diff, "time_shifting": time_shifting,
          "dnn": _DNN(), "zeros_to_ones": lambda t: tf.where(t == 0, tf.ones_like(t), t)}
    exec(compile(src, REF, "exec"), ns)          # noqa: S102 (trusted local file)
    physics_error_gas_2D = ns["physics_error_gas_2D"]

    model = DummyModel()
    x = [tf.zeros((B, H, W, 1), tf.float32) for _ in range(6)]
    # time channel: mid-horizon; only enters through Δt normalization and the
    # (unused) shut-in mask
    x[3] = tf.zeros((B, H, W, 1), tf.float32)
    x[4] = tf.zeros((B, H, W, 1), tf.float32)
    x[5] = tf.zeros((B, H, W, 1), tf.float32)

    errors, outs, checks, no_blks = physics_error_gas_2D(model, x, None)
    dom, dbc, nbc, ibc, ic, qrc = errors
    mbc = checks[0]

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(
        OUT,
        p0=p0[..., 0], p1=p1[..., 0], kx=kx_c[..., 0], q1=q1[..., 0],
        t1=t1[..., 0], t2=t2[..., 0],
        conn=conn, phi=PHI, Pi=PI, dx=DX, dy=DY, dz=DZ,
        Sgi=SGI, krgo=KRGO, c0=C0, c1=C1, d0=D0, d1=D1, cf=CF,
        dom=np.asarray(dom)[..., 0], ibc=np.asarray(ibc)[..., 0],
        mbc=np.asarray(mbc),
        tf_version=tf.__version__,
    )
    print("golden written:", os.path.abspath(OUT))
    print("dom range:", float(np.abs(np.asarray(dom)).max()),
          "mbc:", np.asarray(mbc))


if __name__ == "__main__":
    sys.exit(main())
