"""Generate the TF-reference golden file for the GAS-CONDENSATE residual test.

Executes the REFERENCE's own ``physics_error_gas_oil_2D``
(``/root/reference/physics_loss.py:230-712``) — not a re-implementation — by
exec-ing its source with the missing module-level symbols injected (the file
is a snippet with no imports: ``tf``, ``normalize``, ``nonormalize``,
``normalize_diff``, ``time_shifting`` and ``dnn`` are all dangling, see
SURVEY.md §7.4). A dummy "model" returns fixed synthetic two-phase fields
(p, Sg, So, 7-property PVT closure, 4-way well-rate split), so the comparison
isolates exactly the two-phase stencil/coefficient assembly: 4-flux upstream
divergences, chord-slope saturation derivatives, per-phase accumulation,
material balance, and the per-phase Richardson truncation error.

Outputs ``tests/golden/tf_gc_residual.npz`` holding the synthetic inputs and
the reference-computed (dom, ibc, mbc, cmbc≡trn_err) tensors. Run once on a
machine with TensorFlow; the committed npz then gates JAX-side parity forever
(tests/test_tf_golden.py::test_gc_residual_matches_tf_reference).
"""

from __future__ import annotations

import os
import sys

import numpy as np

REF = "/root/reference/physics_loss.py"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden",
                   "tf_gc_residual.npz")

B, H, W = 2, 13, 13
DX = DY = 2900.0 / 39.0
DZ = 80.0
PHI = 0.2
PI = 5000.0
TMAX = 365.0
SWMIN = 0.22
SORG = 0.2
SGI = 1.0 - SWMIN
PDEW = 4048.0
CF = 97.32e-6 / (1.0 + 55.8721 * PHI**1.428586)

# linear synthetic PVT closures: prop = a0 + a1 * p  (slopes are the dPVT rows)
PVT_LIN = {
    "invBg": (1.2e-4, 2.1e-7),       # 1/Bg  [Mscf/bbl-ish scale]
    "invBo": (0.42, 2.4e-5),         # 1/Bo
    "invug": (55.0, 3.3e-6),         # 1/ug
    "invuo": (2.1, 6.0e-5),          # 1/uo
    "Rs": (0.45, 1.6e-4),            # dissolved gas
    "Rv": (0.021, 1.9e-6),           # vaporized oil
}

# quadratic synthetic relperm in Sg (pointwise; commutes with SYMMETRIC pad)
KRGO_A, KROG_A = 0.9, 0.8


def kr_numpy(sg):
    sgn = np.clip((sg - 0.05) / (SGI - 0.05), 0.0, 1.0)
    return KROG_A * (1.0 - sgn) ** 2, KRGO_A * sgn**2   # (krog, krgo)


rng = np.random.RandomState(11)
kx_c = np.exp(rng.uniform(0.0, 2.5, (B, H, W, 1))).astype(np.float32)
p0 = (PI - 400.0 * rng.uniform(0.2, 1.0, (B, H, W, 1))).astype(np.float32)
p1 = (p0 - 150.0 * rng.uniform(0.2, 1.0, (B, H, W, 1))).astype(np.float32)
sg0 = (SGI - rng.uniform(0.02, 0.15, (B, H, W, 1))).astype(np.float32)
sg1 = (sg0 - rng.uniform(0.005, 0.03, (B, H, W, 1))).astype(np.float32)
t1 = rng.uniform(3.0, 8.0, (B, 1, 1, 1)).astype(np.float32)
t2 = rng.uniform(3.0, 8.0, (B, 1, 1, 1)).astype(np.float32)

conn = np.array([[3, 3, 0], [9, 9, 0], [3, 9, 0], [9, 3, 0]], np.int64)
q_rates = np.array([120.0, 90.0, 60.0, 150.0], np.float32)


def scatter(vals):
    g = np.zeros((H, W, 1), np.float32)
    g[conn[:, 0], conn[:, 1], 0] = vals
    return np.broadcast_to(g, (B, H, W, 1)).astype(np.float32)


qfg1 = scatter(q_rates)                                # free gas
qdg1 = scatter(q_rates * 0.04)                         # dissolved gas (in oil)
qfo1 = scatter(q_rates * 0.11)                         # free oil
qvo1 = scatter(q_rates * 0.007)                        # vaporized oil (in gas)


def main():
    os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")
    import tensorflow as tf

    def nonormalize(model, v, stat_idx=None, compute=True):
        if stat_idx == 3:
            return (v + 1.0) * 0.5 * TMAX
        if stat_idx == 4:
            return tf.ones_like(v) * PHI
        if stat_idx == 5:
            return tf.constant(kx_c) * tf.ones_like(v)
        raise ValueError(stat_idx)

    def normalize(model, v, stat_idx=None, compute=True):
        assert stat_idx == 3
        return v / TMAX * 2.0 - 1.0

    def normalize_diff(model, dv, stat_idx=None, compute=True):
        assert stat_idx == 3
        return dv * 2.0 / TMAX

    def time_shifting(model, x, shift_frac_mean=0.05, pred_cycle_mean=0.0, random=False):
        return list(x), tf.constant(1.0, tf.float32), tf.constant(10.0, tf.float32)

    class _DNN:
        @staticmethod
        def conn_shutins_idx(tn0, conn_idx, days):
            return tf.ones_like(tn0)

    def kr_gas_oil(sg):
        sgn = tf.clip_by_value((sg - 0.05) / (SGI - 0.05), 0.0, 1.0)
        return KROG_A * (1.0 - sgn) ** 2, KRGO_A * sgn**2

    class DummyModel:
        """Callable satisfying the reference's implied GC model contract
        (ref physics_loss.py:333-335): returns the fixed synthetic field
        stack [p, Sg, So, invBg, invBo, invug, invuo, Rs, Rv, Vro, dPVT,
        tstep, lmd, [qfg,qdg,qfo,qvo], pwf]; the first call is time level
        n0, the second n1."""

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
                "SCAL": {"End_Points": {"Swmin": SWMIN, "Sorg": SORG}},
                "Kr_gas_oil": kr_gas_oil,
                "Max_Train_Time": TMAX,
                "Pi": PI,
                "Dew_Point": PDEW,
                "Rhg_Std": 0.0647,
                "Rho_Std": 51.45,
                "Connection_Shutins": {"Days": [[[0.0, 0.0]]] * len(q_rates)},
            }
            for name, (a0, a1) in PVT_LIN.items():
                cap = name[0].upper() + name[1:]
                self.cfd_type[f"Init_{cap}"] = a0 + a1 * PI
                self.cfd_type[f"Init_D{name}"] = a1
            # reference key casing: Init_InvBg / Init_DinvBg / Init_Invug ...
            self.cfd_type["Init_InvBg"] = PVT_LIN["invBg"][0] + PVT_LIN["invBg"][1] * PI
            self.cfd_type["Init_DinvBg"] = PVT_LIN["invBg"][1]
            self.cfd_type["Init_InvBo"] = PVT_LIN["invBo"][0] + PVT_LIN["invBo"][1] * PI
            self.cfd_type["Init_Invug"] = PVT_LIN["invug"][0] + PVT_LIN["invug"][1] * PI
            self.cfd_type["Init_Invuo"] = PVT_LIN["invuo"][0] + PVT_LIN["invuo"][1] * PI
            self.cfd_type["Init_Rs"] = PVT_LIN["Rs"][0] + PVT_LIN["Rs"][1] * PI
            self.cfd_type["Init_Rv"] = PVT_LIN["Rv"][0] + PVT_LIN["Rv"][1] * PI

        def __call__(self, x, training=False):
            p = tf.constant(p0 if self.calls == 0 else p1)
            sg = tf.constant(sg0 if self.calls == 0 else sg1)
            dtf = tf.ones_like(p) * tf.constant(t1 if self.calls == 0 else t2)
            self.calls += 1
            so = 1.0 - SWMIN - sg
            props = {k: a0 + a1 * p for k, (a0, a1) in PVT_LIN.items()}
            # dPVT rows: [dinvBg, dinvBo, dinvug, dinvuo, dRs, dRv] (ref :506-514)
            dPVT = tf.stack([tf.ones_like(p) * PVT_LIN[k][1]
                             for k in ("invBg", "invBo", "invug", "invuo", "Rs", "Rv")],
                            axis=0)
            vro = tf.ones_like(p) * 0.1
            lmd = tf.ones_like(p)
            q_list = [tf.constant(qfg1), tf.constant(qdg1),
                      tf.constant(qfo1), tf.constant(qvo1)]
            pwf = tf.ones_like(p) * 3000.0
            return [p, sg, so, props["invBg"], props["invBo"], props["invug"],
                    props["invuo"], props["Rs"], props["Rv"], vro, dPVT,
                    dtf, lmd, q_list, pwf]

    src = open(REF).read()
    ns = {"tf": tf, "np": np, "normalize": normalize, "nonormalize": nonormalize,
          "normalize_diff": normalize_diff, "time_shifting": time_shifting,
          "dnn": _DNN(), "zeros_to_ones": lambda t: tf.where(t == 0, tf.ones_like(t), t)}
    exec(compile(src, REF, "exec"), ns)          # noqa: S102 (trusted local file)
    physics_error_gas_oil_2D = ns["physics_error_gas_oil_2D"]

    model = DummyModel()
    x = [tf.zeros((B, H, W, 1), tf.float32) for _ in range(6)]

    errors, outs, checks, no_blks = physics_error_gas_oil_2D(model, x, None)
    dom, dbc, nbc, ibc, ic, qrc = errors
    mbc, cmbc = checks

    krog1_np, krgo1_np = kr_numpy(sg1)

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(
        OUT,
        p0=p0[..., 0], p1=p1[..., 0], sg0=sg0[..., 0], sg1=sg1[..., 0],
        kx=kx_c[..., 0],
        qfg1=qfg1[..., 0], qdg1=qdg1[..., 0], qfo1=qfo1[..., 0], qvo1=qvo1[..., 0],
        t1=t1[..., 0], t2=t2[..., 0],
        krgo1=krgo1_np[..., 0], krog1=krog1_np[..., 0],
        conn=conn, phi=PHI, Pi=PI, dx=DX, dy=DY, dz=DZ,
        Swmin=SWMIN,
        pvt_lin=np.array([PVT_LIN[k] for k in
                          ("invBg", "invBo", "invug", "invuo", "Rs", "Rv")],
                         np.float64),
        dom=np.asarray(dom)[..., 0], ibc=np.asarray(ibc)[..., 0],
        mbc=np.asarray(mbc), cmbc=np.asarray(cmbc)[..., 0],
        tf_version=tf.__version__,
    )
    print("golden written:", os.path.abspath(OUT))
    print("dom range:", float(np.abs(np.asarray(dom)).max()),
          "mbc:", np.asarray(mbc),
          "cmbc range:", float(np.abs(np.asarray(cmbc)).max()))


if __name__ == "__main__":
    sys.exit(main())
