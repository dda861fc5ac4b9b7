"""PhysicsLoss: finite-volume PDE residual loss over the multi-model SRM.

This module is the TPU-native reconstruction of the reference's **missing**
``physics_loss_Subclassed.py`` (class ``PhysicsLoss``; interface recovered
from its call sites at ``/root/reference/training.py:552-652`` and
``training_case_dry_gas_i.py:357-364``), with the residual mathematics from
the legacy functional file ``/root/reference/physics_loss.py``:

* dry-gas residual      — ``physics_error_gas_2D``      (ref :9-227)
* gas-condensate        — ``physics_error_gas_oil_2D``  (ref :230-712)
* loss/grad assembly    — ``pinn_batch_sse_grad``       (ref :742-870)

Design (all-TPU, one XLA program):

* The entire evaluation — two network forward passes at times n and n+Δt
  (Δt predicted per-sample by Model 2), PVT properties + AD derivatives,
  well rates/BHP, stencil residuals, weighted SSE, and **per-model
  gradients** — is one pure function of ``(params, x, y)``; the trainer jits
  it together with the optimizer updates.
* The reference takes 8 separate persistent-tape gradients (one per loss
  term) plus the batch gradient, but its training loop applies only the
  per-model gradient of the total weighted loss (training.py:643-652). Here
  a single ``jax.grad`` over the params dict produces exactly those applied
  updates; per-term MSEs are returned as aux for logging.
* The reference adds the Richardson truncation-error term into the domain
  accumulation with dom's weight (physics_loss.py:175); since
  ``default_weights`` carries a separate ``tde`` weight, the term is kept
  separate here and weighted by ``tde`` (equal totals at the default
  dom == tde == 1).

Feature layout: ``x`` is the woven normalized tensor ``(B, T, H, W, 5)``
with channels ``(z, y, x, time, permx)``; porosity is the constant reservoir
value (the reference's 6-channel variant carried it as a channel; the shipped
5-channel pipeline does not).
"""

from __future__ import annotations

import contextlib
import logging
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from srm_tpu.config import (
    DEFAULT_GENERAL_CONFIG,
    DEFAULT_RESERVOIR_CONFIG,
    DEFAULT_SCAL_CONFIG,
    DEFAULT_WELLS_CONFIG,
    get_conversion_constants,
    get_optimizer_model_mapping,
)
from srm_tpu.ops.stencil import (
    Neighbors, average_faces, five_point_divergence, harmonic_faces,
    neighbors, pad_symmetric, upstream_faces,
)
from srm_tpu.physics.relperm import RelativePermeability
from srm_tpu.physics.wells import scatter_to_grid
from srm_tpu.utils.stats import denormalize, normalize_diff

Array = jnp.ndarray
log = logging.getLogger(__name__)

EPSILON = 1e-7  # keras backend epsilon used in the truncation-error term

# loss-term order (mirrors the legacy _wmse list, ref physics_loss.py:863-867,
# with tde split out as its own term)
LOSS_TERMS = ("dom", "dbc", "nbc", "ibc", "ic", "mbc", "cmbc", "tde", "td")


def dg_residual_from_fields(p0: Array, p1: Array, invBg0: Array, invBg1: Array,
                            invug1: Array, dinvBg0: Array, q1c: Array,
                            q_well: Array, kx_c: Array, phi_c: Array,
                            t1: Array, t2: Array, krgo: Array,
                            C: float, D: float, dx: float, dy: float, dz: float,
                            Sgi: float) -> Tuple[Array, Array, Array, Array]:
    """Dry-gas FV residual from explicit (B, H, W) fields → (dom, ibc, mbc, tde).

    The stencil core of ``physics_error_gas_2D`` (ref physics_loss.py:126-206)
    as a pure function of fields — shared by :meth:`PhysicsLoss._residuals_dg`
    and the TF-reference golden test (which feeds both implementations the
    same synthetic fields).
    """
    dv = dx * dy * dz
    kfaces = harmonic_faces(neighbors(pad_symmetric(kx_c)))
    kx_ih, kx_i_h, ky_jh, ky_j_h = kfaces
    cf = 97.32e-6 / (1.0 + 55.8721 * phi_c**1.428586)          # (ref :64)

    pn = neighbors(pad_symmetric(p1))
    bgug1 = neighbors(pad_symmetric(invBg1 * invug1))
    bgug_ih, bgug_i_h, bgug_jh, bgug_j_h = average_faces(bgug1)

    cr0 = phi_c * cf * invBg0                                  # (ref :147-150)
    cp1 = Sgi * (phi_c * dinvBg0 + cr0)

    inv_dxx = 1.0 / (dx * dx)
    inv_dyy = 1.0 / (dy * dy)
    a1 = C * kx_i_h * krgo * bgug_i_h * inv_dxx
    a2 = C * ky_j_h * krgo * bgug_j_h * inv_dyy
    a3 = C * kx_ih * krgo * bgug_ih * inv_dxx
    a4 = C * ky_jh * krgo * bgug_jh * inv_dyy
    a5 = (1.0 / D) * (cp1 / t1)

    # extrapolated p at n2 and Richardson truncation error (ref :126,:171).
    # NOTE: because p2 is extrapolated with the same (1 + t2/t1) ratio, the
    # numerator t2·p0 + t1·p2 − (t1+t2)·p1 cancels algebraically — the term's
    # trained value is the 2ε/t1 part, i.e. a 1/Δt regularizer that pushes
    # Model 2 toward larger time steps (plus f32 roundoff). Kept exactly as
    # the reference computes it.
    p2 = (p1 - p0) * (1.0 + t2 / jnp.maximum(t1, 1e-12)) + p0
    trn_err = (dv / D) * cp1 * (
        2.0 * EPSILON / t1
        + (t2 * p0 + t1 * p2 - (t1 + t2) * p1) / (t1 * t2 + t2**2))

    dom_divq = five_point_divergence(a3, a1, a4, a2, pn, q1c / dv, dv)
    dom_acc = dv * a5 * (p1 - p0)
    dom = dom_divq + dom_acc                                   # tde kept separate
    ibc = q_well * dom_divq                                    # (ref :189)

    mbc = (-jnp.sum(q1c, axis=(1, 2))
           - jnp.sum(dv * Sgi * phi_c * (invBg1 - invBg0)
                     / (D * t1), axis=(1, 2)))
    return dom, ibc, mbc, trn_err


def gc_residual_from_fields(p0: Array, p1: Array, Sg0: Array, Sg1: Array,
                            invBg0: Array, invBo0: Array, Rs0: Array, Rv0: Array,
                            invBg1: Array, invBo1: Array, invug1: Array,
                            invuo1: Array, Rs1: Array, Rv1: Array,
                            dinvBg0: Array, dinvBo0: Array, dRs0: Array,
                            dRv0: Array, krgo1: Array, krog1: Array,
                            qfg1c: Array, qdg1c: Array, qfo1c: Array,
                            qvo1c: Array, q_well: Array, kx_c: Array,
                            phi_c: Array, t1: Array, t2: Array,
                            C: float, D: float, dx: float, dy: float, dz: float,
                            Swmin: float) -> Tuple[Array, ...]:
    """Gas-condensate two-phase FV residual from explicit (B, H, W) fields.

    The stencil core of ``physics_error_gas_oil_2D``
    (ref physics_loss.py:400-693) as a pure function of fields — shared by
    :meth:`PhysicsLoss._residuals_gc` and the TF-reference golden test
    (tests/test_tf_golden.py), which feeds both implementations identical
    synthetic fields. ``So`` is closed as ``1 - Swmin - Sg`` (no water phase).

    Returns ``(dom_g, dom_o, ibc, mbc_g, mbc_o, trn_g, trn_o)``.
    """
    dv = dx * dy * dz
    kx_ih, kx_i_h, ky_jh, ky_j_h = harmonic_faces(neighbors(pad_symmetric(kx_c)))
    cf = 97.32e-6 / (1.0 + 55.8721 * phi_c**1.428586)          # (ref :64)
    So0 = 1.0 - Swmin - Sg0
    So1 = 1.0 - Swmin - Sg1

    # surface-mass accumulations m_g, m_o (ref :419-427)
    RsinvBo0, RvinvBg0 = Rs0 * invBo0, Rv0 * invBg0
    RsinvBo1, RvinvBg1 = Rs1 * invBo1, Rv1 * invBg1
    mg0 = phi_c * (invBg0 * Sg0 + RsinvBo0 * So0)
    mo0 = phi_c * (invBo0 * So0 + RvinvBg0 * Sg0)
    mg1 = phi_c * (invBg1 * Sg1 + RsinvBo1 * So1)
    mo1 = phi_c * (invBo1 * So1 + RvinvBg1 * Sg1)
    ratio = 1.0 + t2 / jnp.maximum(t1, 1e-12)
    mg2 = (mg1 - mg0) * ratio + mg0
    mo2 = (mo1 - mo0) * ratio + mo0

    # per-phase Richardson truncation errors (ref :433-436)
    rte = EPSILON * 0.25
    denom_t = t1 * t2 + t2**2
    trn_g = (dv / D) * (rte / t1 + (t2 * mg0 + t1 * mg2 - (t1 + t2) * mg1) / denom_t)
    trn_o = (dv / D) * (rte / t1 + (t2 * mo0 + t1 * mo2 - (t1 + t2) * mo1) / denom_t)

    # upstream relperm weighting at n1 faces (ref :453-551)
    krn_go = neighbors(pad_symmetric(krgo1))
    krn_og = neighbors(pad_symmetric(krog1))
    pn = neighbors(pad_symmetric(p1))
    krgo_ih, krgo_i_h, krgo_jh, krgo_j_h = upstream_faces(krn_go, pn)
    krog_ih, krog_i_h, krog_jh, krog_j_h = upstream_faces(krn_og, pn)

    # face-averaged fluid-property products (ref :517-525)
    def favg(f):
        return average_faces(neighbors(pad_symmetric(f)))

    bgug_faces = favg(invBg1 * invug1)
    bouo_faces = favg(invBo1 * invuo1)
    rvbgug_faces = favg(Rv1 * invBg1 * invug1)
    rsbouo_faces = favg(Rs1 * invBo1 * invuo1)

    # chord-slope saturation derivatives (ref :465-468)
    dp = p1 - p0
    safe_dp = jnp.where(jnp.abs(dp) > 0, dp, 1.0)
    d_Sg = jnp.where(jnp.abs(dp) > 0, (Sg1 - Sg0) / safe_dp, 0.0)
    d_So = jnp.where(jnp.abs(dp) > 0, (So1 - So0) / safe_dp, 0.0)

    # derivative products at n0 (ref :506-514)
    d_RsinvBo = Rs0 * dinvBo0 + invBo0 * dRs0
    d_RvinvBg = Rv0 * dinvBg0 + invBg0 * dRv0

    # rock-compressibility products (ref :556-560)
    cprgg = phi_c * cf * invBg0
    cprgo = phi_c * cf * RsinvBo0
    cproo = phi_c * cf * invBo0
    cprog = phi_c * cf * RvinvBg0

    inv_dxx = 1.0 / (dx * dx)
    inv_dyy = 1.0 / (dy * dy)

    def trans(kr_faces, prop_faces):
        (kr_ih, kr_i_h, kr_jh, kr_j_h) = kr_faces
        (pr_ih, pr_i_h, pr_jh, pr_j_h) = prop_faces
        a_ih = C * kx_ih * kr_ih * pr_ih * inv_dxx
        a_i_h = C * kx_i_h * kr_i_h * pr_i_h * inv_dxx
        a_jh = C * ky_jh * kr_jh * pr_jh * inv_dyy
        a_j_h = C * ky_j_h * kr_j_h * pr_j_h * inv_dyy
        return a_ih, a_i_h, a_jh, a_j_h

    kr_g = (krgo_ih, krgo_i_h, krgo_jh, krgo_j_h)
    kr_o = (krog_ih, krog_i_h, krog_jh, krog_j_h)
    agg = trans(kr_g, bgug_faces)
    ago = trans(kr_o, rsbouo_faces)
    aoo = trans(kr_o, bouo_faces)
    aog = trans(kr_g, rvbgug_faces)

    # accumulation coefficients (ref :572-586)
    inv_Dt = 1.0 / (D * t1)
    cpgg = inv_Dt * (phi_c * invBg1 * d_Sg + Sg0 * (phi_c * dinvBg0 + cprgg)) * dp
    cpgo = inv_Dt * (phi_c * RsinvBo1 * d_So + So0 * (phi_c * d_RsinvBo + cprgo)) * dp
    cpoo = inv_Dt * (phi_c * invBo1 * d_So + So0 * (phi_c * dinvBo0 + cproo)) * dp
    cpog = inv_Dt * (phi_c * RvinvBg1 * d_Sg + Sg0 * (phi_c * d_RvinvBg + cprog)) * dp

    dom_divq_gg = five_point_divergence(agg[0], agg[1], agg[2], agg[3], pn, qfg1c / dv, dv)
    dom_divq_go = five_point_divergence(ago[0], ago[1], ago[2], ago[3], pn, qdg1c / dv, dv)
    dom_divq_oo = five_point_divergence(aoo[0], aoo[1], aoo[2], aoo[3], pn, qfo1c / dv, dv)
    dom_divq_og = five_point_divergence(aog[0], aog[1], aog[2], aog[3], pn, qvo1c / dv, dv)

    dom_g = (dom_divq_gg + dv * cpgg) + (dom_divq_go + dv * cpgo)
    dom_o = (dom_divq_oo + dv * cpoo) + (dom_divq_og + dv * cpog)
    ibc = q_well * ((dom_divq_gg + dom_divq_go) + (dom_divq_oo + dom_divq_og))

    # per-phase tank material balance (ref :655-665)
    mbc_gg = dv * inv_Dt * phi_c * (Sg1 * invBg1 - Sg0 * invBg0)
    mbc_go = dv * inv_Dt * phi_c * (So1 * RsinvBo1 - So0 * RsinvBo0)
    mbc_oo = dv * inv_Dt * phi_c * (So1 * invBo1 - So0 * invBo0)
    mbc_og = dv * inv_Dt * phi_c * (Sg1 * RvinvBg1 - Sg0 * RvinvBg0)
    mbc_g = (-jnp.sum(qfg1c + qdg1c, axis=(1, 2))
             - jnp.sum(mbc_gg + mbc_go, axis=(1, 2)))
    mbc_o = (-jnp.sum(qfo1c + qvo1c, axis=(1, 2))
             - jnp.sum(mbc_oo + mbc_og, axis=(1, 2)))

    return dom_g, dom_o, ibc, mbc_g, mbc_o, trn_g, trn_o


class PhysicsLoss:
    """Composes the model map into PDE residual losses with per-model grads.

    Parameters mirror the reference ctor (training_case_dry_gas_i.py:357-364)
    with JAX separations: modules are passed together with a ``params`` dict
    keyed by logical model name ('pressure', 'time_step', 'pvt_model',
    'well_rate_bhp_model'[, 'saturation_model']).
    """

    def __init__(self, models: Dict[str, Any], data_summary,
                 optimizer_model_names_map: Optional[Dict[str, str]] = None,
                 general_config: Optional[Dict] = None,
                 reservoir_config: Optional[Dict] = None,
                 wells_config: Optional[Dict] = None,
                 scal_config: Optional[Dict] = None,
                 fluid_type: Optional[str] = None,
                 use_pallas_stencil: Optional[bool] = None):
        if use_pallas_stencil is None:
            # default ON where the fused kernel runs compiled (TPU): measured
            # faster at every compute-bound scale (BASELINE.md round-2 table).
            # On CPU backends pallas falls back to interpret mode, which is
            # far slower than the jnp twin — keep it off there.
            use_pallas_stencil = jax.default_backend() == "tpu"
        self.use_pallas_stencil = use_pallas_stencil
        self.models = models
        self.data_summary = data_summary
        self.general_config = general_config or DEFAULT_GENERAL_CONFIG
        self.reservoir_config = reservoir_config or DEFAULT_RESERVOIR_CONFIG
        self.wells_config = wells_config or DEFAULT_WELLS_CONFIG
        self.scal_config = scal_config or DEFAULT_SCAL_CONFIG
        self.fluid_type = (fluid_type or self.general_config["fluid_type"]).upper()
        self.physics_mode_fraction = float(self.general_config["physics_mode_fraction"])
        # td (training-data) error scaling. The raw td errors live in wildly
        # different units — pressure in psia (SSE ~1e4/elem) vs saturation in
        # fractions (SSE ~1e-3/elem) — so with comparable weights the pressure
        # term swamps the Sg term by ~7 orders of magnitude and the Sg head is
        # governed by physics terms alone (measured: trained Sg RMSE 2-3x the
        # trivial predict-Sgi baseline, drifting worse with epochs).
        #   None        — raw errors (reference parity; ref physics_loss.py
        #                 td terms are raw differences too).
        #   "balance"   — leave the first label's (pressure) error unchanged,
        #                 rescale every further label's error to the first
        #                 label's batch std. DG runs are a no-op.
        #   "label_std" — divide every label's error by its batch std
        #                 (pure relative errors; also rescales pressure).
        self.td_normalization = self.general_config.get("td_loss_normalization")
        # dropout-focus weighting for the Sg td error (see
        # config/defaults.py "sg_td_focus"): beta=0 disables; beta>0 tilts
        # the per-pixel label gradient toward cells whose label departs from
        # Sgi (condensate dropout), mean-1-normalized so the term scale and
        # every td_normalization mode compose unchanged.
        self.sg_td_focus = float(self.general_config.get("sg_td_focus") or 0.0)
        self.remat_forwards = bool(self.general_config.get("remat_forwards", False))
        self.dt_input_stride = int(self.general_config.get("dt_input_stride", 1) or 1)
        self.optimizer_model_names_map = (optimizer_model_names_map
                                          or get_optimizer_model_mapping(self.fluid_type))

        units = get_conversion_constants(self.general_config["srm_units"])
        self.C, self.D = units["C"], units["D"]
        res = self.reservoir_config
        self.dx = res["length"] / res["Nx"]
        self.dy = res["width"] / res["Ny"]
        self.dz = res["thickness"] / res["Nz"]
        # porosity: scalar, or a per-cell field (heterogeneous φ — the
        # reference de-normalizes a porosity channel, ref physics_loss.py:
        # 21-27 phi_0_ij). Accepts (Ny,Nx), (Nz,Ny,Nx) or flat; canonical
        # storage is (Nz,Ny,Nx).
        poro = np.asarray(res["porosity"], np.float32)
        if poro.ndim == 0:
            self.phi_field = None
            self.phi0 = float(poro)
        else:
            self.phi_field = poro.reshape(res["Nz"], res["Ny"], res["Nx"])
            self.phi0 = float(poro.mean())
            if self.use_pallas_stencil:
                log.info("per-cell porosity: fused Pallas stencil disabled "
                         "(scalar-φ kernel); using the XLA-fused jnp path")
                self.use_pallas_stencil = False
        self.Pi = res["initialization"]["Pi"]
        self.Swmin = self.scal_config["end_points"]["Swmin"]
        self.Sgi = 1.0 - self.Swmin
        self.relperm = RelativePermeability.from_config(
            self.scal_config["end_points"], self.scal_config["corey_exponents"])
        # constant DG relperm at Sgi, evaluated eagerly so it is a static
        # Python float inside jitted losses (used by the Pallas config).
        # Evaluated on the HOST CPU backend: on a remote-attached chip this
        # single scalar round-trip rides the tunnel, whose degraded phases
        # were measured at 30+ s per fetch (round 5) — a setup stall for a
        # value that never needs the accelerator.
        try:
            _cpu = jax.local_devices(backend="cpu")
        except RuntimeError:
            _cpu = []
        with (jax.default_device(_cpu[0]) if _cpu else contextlib.nullcontext()):
            self._krgo_sgi = float(self.relperm(jnp.asarray(self.Sgi))[1])

            # well scatter grids ((H, W) plane for Nz == 1, full (D, H, W)
            # for 3D) — also host-side: each np.asarray(...) is otherwise a
            # full-grid device→host fetch through the tunnel at setup
            well = models["well_rate_bhp_model"]
            conn = well.well_data["connection_index"]
            Ny, Nx, Nz = res["Ny"], res["Nx"], res["Nz"]
            self.Nz = Nz
            self.kv_kh = res.get("vertical_anisotropy", 1.0)
            if Nz > 1:
                self.q_well_idx = np.asarray(
                    scatter_to_grid((1, Nz, Ny, Nx), conn, 1.0, start_dim=1))[0]
                self.q_t0 = np.asarray(scatter_to_grid(
                    (1, Nz, Ny, Nx), conn, well.well_data["control_mode_value"], start_dim=1))[0]
            else:
                self.q_well_idx = np.asarray(
                    scatter_to_grid((1, Ny, Nx), conn[:, 1:], 1.0, start_dim=1))[0]
                self.q_t0 = np.asarray(scatter_to_grid(
                    (1, Ny, Nx), conn[:, 1:], well.well_data["control_mode_value"], start_dim=1))[0]

        # stat rows
        ds = data_summary
        self.t_row = np.asarray(ds.row("time"))
        self.k_row = np.asarray(ds.row("permx"))
        self.k_is_log = bool(ds.is_log_np[ds.get_key_index("permx")])
        nc = self.general_config["data_normalization"]
        self.norm_method = nc["feature_normalization_method"]
        self.norm_limits = tuple(nc["normalization_limits"])

        # loss keys + weights (ref default_configurations.py:63-84; the
        # training loop reads custom_loss_fn.loss_keys, ref training.py:560)
        w = self.general_config["default_weights"]
        phases = ("gas",) if self.fluid_type == "DG" else ("gas", "oil")
        self.loss_keys = {ph: [f"{t}_{ph[0]}" for t in LOSS_TERMS] for ph in phases}
        self.weights = {
            ph: {"dom": w[ph]["dom"], "dbc": w[ph]["obc"], "nbc": w[ph]["obc"],
                 "ibc": w[ph]["ibc"], "ic": w[ph]["ic"], "mbc": w[ph]["mbc"],
                 "cmbc": w[ph]["cmbc"], "tde": w[ph]["tde"], "td": w[ph]["td"]}
            for ph in phases
        }
        # Trainable-model set: the conv nets always; 'fluid_property' joins
        # when the PVT backend is the trainable polynomial — the reference
        # maps an optimizer to the PVT model (ref default_configurations.py:
        # 420-433 'fluid_property': 'pvt_model'), its training loop applies
        # that gradient (ref training.py:643-652), and the polynomial
        # coefficients are trainable weights (ref PVT_Layer_Subclassed.py:
        # 108-116). The spline backend is solved once at init and carries no
        # flax params, so it stays frozen (matching the shipped examples).
        trainable = {"pressure", "time_step", "saturation"}
        pvt_layer = getattr(models.get("pvt_model"), "pvt_layer", None)
        if getattr(pvt_layer, "fitting_method", None) == "polynomial":
            trainable.add("fluid_property")
        self.trainable_models_keys = [k for k in self.optimizer_model_names_map
                                      if k in trainable]

    # ------------------------------------------------------------------
    # helpers
    # ------------------------------------------------------------------
    def _phi(self, like: Array) -> Array:
        """Per-cell porosity broadcast to the field shape (B, [D,] H, W)."""
        if self.phi_field is None:
            return jnp.full_like(like, self.phi0)
        want = like.ndim - 1                        # spatial rank (2 or 3)
        phi = self.phi_field.reshape(self.phi_field.shape[-want:])
        return jnp.broadcast_to(jnp.asarray(phi, like.dtype), like.shape)

    def _denorm_time(self, t: Array) -> Array:
        return denormalize(t, jnp.asarray(self.t_row), method=self.norm_method,
                           limits=self.norm_limits, is_log=False)

    def _denorm_permx(self, k: Array) -> Array:
        return denormalize(k, jnp.asarray(self.k_row), method=self.norm_method,
                           limits=self.norm_limits, is_log=self.k_is_log)

    def _norm_dt(self, dt: Array) -> Array:
        return normalize_diff(dt, jnp.asarray(self.t_row), method=self.norm_method,
                              limits=self.norm_limits, is_log=False)

    def _net(self, name: str, params, x, training=True):
        """Forward one conv network, optionally rematerialized.

        ``general_config['remat_forwards'] = True`` wraps the network in
        ``jax.checkpoint``: the backward pass recomputes activations instead
        of storing them, trading ~1 extra forward of FLOPs for the activation
        HBM — the standard TPU lever for batch sizes that otherwise OOM
        (117×117 at batch 256 exceeds one v5e chip's 15.75 GiB without it).
        """
        mod = self.models[name]
        if name == "time_step" and self.dt_input_stride > 1:
            # TPU-mode lever: the Δt field is consumed ONLY through its
            # per-sample spatial mean (ref physics_loss.py:102,122), so the
            # residual net may run on a spatially strided grid — ~1/s² of its
            # cost at dg3d's scale, where it is the single most expensive
            # forward (tools/step_profile.py). Validate at matched RMSE with
            # tools/rmse_experiment.py --dt-stride before flipping defaults.
            s = self.dt_input_stride
            x = x[..., ::s, ::s, :]
        f = lambda p, x_: mod.apply(p, x_, training=training)  # noqa: E731
        if self.remat_forwards:
            f = jax.checkpoint(f)
        return f(params[name], x)

    def _forward(self, params, x, training=True):
        """One multi-model forward: (p, Δt-field, pvt, Sg)."""
        m = self.models
        p = self._net("pressure", params, x, training=training)
        dt = self._net("time_step", params, x, training=training)
        pvt = m["pvt_model"].apply(params["pvt_model"], p)
        Sg = None
        if self.fluid_type == "GC":
            Sg_raw = self._net("saturation_model", params, x,
                               training=training)
            # saturation hard-enforced to Sgi at t0 by its HardLayer; clamp to
            # the physical range for the relperm/PVT consumers
            Sg = jnp.clip(Sg_raw, 0.0, self.Sgi)
        return p, dt, pvt, Sg

    @staticmethod
    def _sq(f: Array) -> Array:
        """(B, T, H, W, 1) → (B, H, W): drop the singleton temporal/channel
        axes for the stencil math."""
        return f[:, 0, :, :, 0]

    # ------------------------------------------------------------------
    # residuals
    # ------------------------------------------------------------------
    def residuals(self, params, x: Array) -> Dict[str, Any]:
        if self.fluid_type == "DG":
            if self.Nz > 1:
                return self._residuals_dg_3d(params, x)
            return self._residuals_dg(params, x)
        if self.Nz > 1:
            return self._residuals_gc_3d(params, x)
        return self._residuals_gc(params, x)

    def _static_fields(self, x: Array):
        """Unnormalized porosity/permeability pads + well grids + metrics."""
        kx_c = self._denorm_permx(x[:, 0, :, :, 4])            # (B, H, W)
        phi_c = self._phi(kx_c)
        kxp = pad_symmetric(kx_c)
        k = neighbors(kxp)
        dv = self.dx * self.dy * self.dz
        kx_ih, kx_i_h, ky_jh, ky_j_h = harmonic_faces(k)
        cf = 97.32e-6 / (1.0 + 55.8721 * phi_c**1.428586)      # rock compress (ref :64)
        return kx_c, phi_c, k, dv, (kx_ih, kx_i_h, ky_jh, ky_j_h), cf

    def _residuals_dg(self, params, x: Array) -> Dict[str, Any]:
        """Dry-gas residual (ref physics_loss.py:79-227)."""
        C, D = self.C, self.D
        kx_c = self._denorm_permx(x[:, 0, :, :, 4])            # (B, H, W)
        phi_c = self._phi(kx_c)
        q_well = jnp.asarray(self.q_well_idx)

        # ---- adaptive time step (Model 2) ----------------------------------
        # Δt is the PER-SAMPLE spatial mean of the Model-2 field, exactly the
        # reference's ``tf.reduce_mean(fac_n0[0], axis=[1,2,3], keepdims=True)``
        # (ref physics_loss.py:102,122 — batch axis 0 is retained). Because no
        # cross-sample reduction exists, the residual is invariant to how the
        # batch axis is sharded over the mesh.
        # The n1 features depend only on Model 2's Δt at n0, so the two
        # pressure/PVT forwards are independent given Δt: run them as ONE
        # doubled-batch forward (half the op dispatches, better MXU/VPU
        # utilization than the reference's two sequential passes).
        m = self.models
        dt0f = self._net("time_step", params, x)
        tstep = jnp.mean(dt0f, axis=tuple(range(1, dt0f.ndim - 1)), keepdims=True)
        dt_norm = self._norm_dt(tstep)
        x1 = x.at[..., 3:4].add(jnp.broadcast_to(dt_norm, x[..., 3:4].shape))
        dt1f = self._net("time_step", params, x1)
        tstep2 = jnp.mean(dt1f, axis=tuple(range(1, dt1f.ndim - 1)), keepdims=True)

        B = x.shape[0]
        x01 = jnp.concatenate([x, x1], axis=0)
        p01 = self._net("pressure", params, x01)
        pvt01 = m["pvt_model"].apply(params["pvt_model"], p01)
        p0f, p1f = p01[:B], p01[B:]
        pvt0, pvt1 = pvt01[:, :, :B], pvt01[:, :, B:]

        # well rates/BHP at n1 (ref :168 uses fac_n1)
        well = self.models["well_rate_bhp_model"]
        pvt_fn = lambda p: self.models["pvt_model"].apply(params["pvt_model"], p)  # noqa: E731
        q1, pwf1 = well.compute_rates_and_bhp(x1, p1f, None, relperm_model=self.relperm,
                                              model_PVT=pvt_fn)

        # ---- squeeze and pad ----------------------------------------------
        sq = self._sq
        p0, p1 = sq(p0f), sq(p1f)
        invBg0, invug0 = sq(pvt0[0, 0]), sq(pvt0[0, 1])
        dinvBg0 = sq(pvt0[1, 0])
        invBg1, invug1 = sq(pvt1[0, 0]), sq(pvt1[0, 1])
        q1c = sq(q1)
        t1 = tstep[:, 0, :, :, 0]                              # (B,1,1)
        t2 = tstep2[:, 0, :, :, 0]

        if self.use_pallas_stencil:
            # fused single-VMEM-pass residual (srm_tpu.kernels); gradients via
            # the kernel's custom vjp
            from srm_tpu.kernels.stencil_pallas import StencilConfig, dg_stencil_residual
            cfg = StencilConfig(C=C, D=D, dx=self.dx, dy=self.dy, dz=self.dz,
                                Sgi=self.Sgi, krgo=self._krgo_sgi, phi=self.phi0)
            tsteps = jnp.concatenate(
                [t1.reshape(-1, 1), t2.reshape(-1, 1)], axis=1)
            dom, ibc, trn_err, mbc = dg_stencil_residual(
                pad_symmetric(p0), pad_symmetric(p1), pad_symmetric(kx_c),
                pad_symmetric(invBg1 * invug1), invBg0, invBg1, dinvBg0, q1c,
                q_well, tsteps, cfg)
            zeros = jnp.zeros_like(dom)
            return {
                "gas": {"dom": dom, "dbc": zeros, "nbc": zeros, "ibc": ibc,
                        "ic": zeros, "mbc": mbc, "cmbc": zeros, "tde": trn_err},
                "outputs": {"p_n0": p0f, "p_n1": p1f, "tstep": tstep,
                            "q": q1, "pwf": pwf1},
            }

        # constant DG relperm at Sgi (ref :129)
        _, krgo = self.relperm(jnp.asarray(self.Sgi))
        dom, ibc, mbc, trn_err = dg_residual_from_fields(
            p0, p1, invBg0, invBg1, invug1, dinvBg0, q1c, q_well, kx_c, phi_c,
            t1, t2, krgo, C, D, self.dx, self.dy, self.dz, self.Sgi)

        zeros = jnp.zeros_like(dom)
        return {
            "gas": {
                "dom": dom, "dbc": zeros, "nbc": zeros, "ibc": ibc, "ic": zeros,
                "mbc": mbc, "cmbc": zeros, "tde": trn_err,
            },
            "outputs": {"p_n0": p0f, "p_n1": p1f, "tstep": tstep, "q": q1, "pwf": pwf1},
        }

    def _residuals_dg_3d(self, params, x: Array) -> Dict[str, Any]:
        """Full-3D dry-gas residual with z-direction fluxes (7-point stencil).

        NEW capability: the reference's residual is 2D-only
        ("1D model adapted to 2D", physics_loss.py:10) even though its data
        model carries a depth axis. Vertical permeability
        kz = vertical_anisotropy · kx; fields are (B, D, H, W).
        """
        from srm_tpu.ops.stencil import (
            average_faces_3d, harmonic_faces_3d, neighbors_3d, pad_symmetric_3d,
            seven_point_divergence,
        )
        C, D = self.C, self.D
        sq3 = lambda f: f[..., 0]                              # noqa: E731
        kx_c = self._denorm_permx(x[..., 4])                   # (B, D, H, W)
        phi_c = self._phi(kx_c)
        kxp = pad_symmetric_3d(kx_c)
        kn = neighbors_3d(kxp)
        kzn = neighbors_3d(pad_symmetric_3d(self.kv_kh * kx_c))
        kx_ih, kx_i_h, ky_jh, ky_j_h, kz_kh, kz_k_h = harmonic_faces_3d(kn, kzn)
        dv = self.dx * self.dy * self.dz
        cf = 97.32e-6 / (1.0 + 55.8721 * phi_c**1.428586)
        q_well = jnp.asarray(self.q_well_idx)

        m = self.models
        dt0f = self._net("time_step", params, x)
        tstep = jnp.mean(dt0f, axis=tuple(range(1, dt0f.ndim - 1)), keepdims=True)
        dt_norm = self._norm_dt(tstep)
        x1 = x.at[..., 3:4].add(jnp.broadcast_to(dt_norm, x[..., 3:4].shape))
        dt1f = self._net("time_step", params, x1)
        tstep2 = jnp.mean(dt1f, axis=tuple(range(1, dt1f.ndim - 1)), keepdims=True)

        B = x.shape[0]
        x01 = jnp.concatenate([x, x1], axis=0)
        p01 = self._net("pressure", params, x01)
        pvt01 = m["pvt_model"].apply(params["pvt_model"], p01)
        p0f, p1f = p01[:B], p01[B:]
        pvt0, pvt1 = pvt01[:, :, :B], pvt01[:, :, B:]

        pvt_fn = lambda p: m["pvt_model"].apply(params["pvt_model"], p)  # noqa: E731
        well = m["well_rate_bhp_model"]
        q1, pwf1 = well.compute_rates_and_bhp(x1, p1f, None, relperm_model=self.relperm,
                                              model_PVT=pvt_fn)

        p0, p1 = sq3(p0f), sq3(p1f)
        invBg0, dinvBg0 = sq3(pvt0[0, 0]), sq3(pvt0[1, 0])
        invBg1, invug1 = sq3(pvt1[0, 0]), sq3(pvt1[0, 1])
        q1c = sq3(q1)
        # reshape Δt to broadcast against the rank-5 (B,1,D,H,W) fields
        t1 = tstep.reshape((B,) + (1,) * (p0.ndim - 1))
        t2 = tstep2.reshape((B,) + (1,) * (p0.ndim - 1))

        if self.use_pallas_stencil:
            from srm_tpu.kernels.stencil_pallas import (
                StencilConfig, dg3d_stencil_residual,
            )
            cfg3 = StencilConfig(C=C, D=D, dx=self.dx, dy=self.dy, dz=self.dz,
                                 Sgi=self.Sgi, krgo=float(self._krgo_sgi),
                                 phi=self.phi0)
            # collapse the folded temporal singleton: kernel fields are
            # (B, D, H, W) / padded (B, D+2, H+2, W+2)
            vol = lambda f: f.reshape((B,) + f.shape[-3:])       # noqa: E731
            volp = lambda f: pad_symmetric_3d(vol(f))            # noqa: E731
            tsteps = jnp.concatenate([tstep.reshape(B, 1), tstep2.reshape(B, 1)],
                                     axis=1)
            dom, ibc, trn_err, mbc = dg3d_stencil_residual(
                volp(p0), volp(p1), volp(kx_c), volp(self.kv_kh * kx_c),
                volp(invBg1 * invug1), vol(invBg0), vol(invBg1), vol(dinvBg0),
                vol(q1c), jnp.asarray(self.q_well_idx), tsteps, cfg3)
            reshape_back = lambda f: f.reshape(p0.shape)         # noqa: E731
            dom, ibc, trn_err = map(reshape_back, (dom, ibc, trn_err))
            zeros = jnp.zeros_like(dom)
            return {
                "gas": {"dom": dom, "dbc": zeros, "nbc": zeros, "ibc": ibc,
                        "ic": zeros, "mbc": mbc, "cmbc": zeros, "tde": trn_err},
                "outputs": {"p_n0": p0f, "p_n1": p1f, "tstep": tstep,
                            "q": q1, "pwf": pwf1},
            }

        pn = neighbors_3d(pad_symmetric_3d(p1))
        bgug = neighbors_3d(pad_symmetric_3d(invBg1 * invug1))
        b_ih, b_i_h, b_jh, b_j_h, b_kh, b_k_h = average_faces_3d(bgug)
        _, krgo = self.relperm(jnp.asarray(self.Sgi))

        cr0 = phi_c * cf * invBg0
        cp1 = self.Sgi * (phi_c * dinvBg0 + cr0)

        inv_dxx = 1.0 / (self.dx * self.dx)
        inv_dyy = 1.0 / (self.dy * self.dy)
        inv_dzz = 1.0 / (self.dz * self.dz)
        a1 = C * kx_i_h * krgo * b_i_h * inv_dxx
        a2 = C * ky_j_h * krgo * b_j_h * inv_dyy
        a3 = C * kx_ih * krgo * b_ih * inv_dxx
        a4 = C * ky_jh * krgo * b_jh * inv_dyy
        a5 = C * kz_k_h * krgo * b_k_h * inv_dzz
        a6 = C * kz_kh * krgo * b_kh * inv_dzz
        a_acc = (1.0 / D) * (cp1 / t1)

        p2 = (p1 - p0) * (1.0 + t2 / jnp.maximum(t1, 1e-12)) + p0
        trn_err = (dv / D) * cp1 * (
            2.0 * EPSILON / t1
            + (t2 * p0 + t1 * p2 - (t1 + t2) * p1) / (t1 * t2 + t2**2))

        dom_divq = seven_point_divergence(a3, a1, a4, a2, a6, a5, pn, q1c / dv, dv)
        dom = dom_divq + dv * a_acc * (p1 - p0)
        ibc = q_well * dom_divq
        red_axes = tuple(range(1, q1c.ndim))
        mbc = (-jnp.sum(q1c, axis=red_axes)
               - jnp.sum(dv * self.Sgi * phi_c * (invBg1 - invBg0)
                         / (D * t1), axis=red_axes))

        zeros = jnp.zeros_like(dom)
        return {
            "gas": {"dom": dom, "dbc": zeros, "nbc": zeros, "ibc": ibc, "ic": zeros,
                    "mbc": mbc, "cmbc": zeros, "tde": trn_err},
            "outputs": {"p_n0": p0f, "p_n1": p1f, "tstep": tstep, "q": q1, "pwf": pwf1},
        }

    def _residuals_gc(self, params, x: Array) -> Dict[str, Any]:
        """Gas-condensate two-phase residual (ref physics_loss.py:319-693).

        Model 1S predicts Sg; So is closed as (1 - Swmin - Sg) in the absence
        of water (the reference's missing class stacked [p, Sg, So, ...]).
        """
        C, D = self.C, self.D
        kx_c, phi_c, _, dv, _kfaces, _cf = self._static_fields(x)
        q_well = jnp.asarray(self.q_well_idx)
        sq = self._sq

        # ---- forwards (doubled-batch over the two time levels) -------------
        m = self.models
        dt0f = self._net("time_step", params, x)
        tstep = jnp.mean(dt0f, axis=tuple(range(1, dt0f.ndim - 1)), keepdims=True)
        dt_norm = self._norm_dt(tstep)
        x1 = x.at[..., 3:4].add(jnp.broadcast_to(dt_norm, x[..., 3:4].shape))
        dt1f = self._net("time_step", params, x1)
        tstep2 = jnp.mean(dt1f, axis=tuple(range(1, dt1f.ndim - 1)), keepdims=True)

        B = x.shape[0]
        x01 = jnp.concatenate([x, x1], axis=0)
        p01 = self._net("pressure", params, x01)
        Sg01 = jnp.clip(self._net("saturation_model", params, x01),
                        0.0, self.Sgi)
        pvt01 = m["pvt_model"].apply(params["pvt_model"], p01)
        p0f, p1f = p01[:B], p01[B:]
        Sg0f, Sg1f = Sg01[:B], Sg01[B:]
        pvt0, pvt1 = pvt01[:, :, :B], pvt01[:, :, B:]

        well = self.models["well_rate_bhp_model"]
        pvt_fn = lambda p: self.models["pvt_model"].apply(params["pvt_model"], p)  # noqa: E731
        (qfg1, qdg1, qfo1, qvo1), pwf1 = well.compute_rates_and_bhp(
            x1, p1f, Sg1f, relperm_model=self.relperm, model_PVT=pvt_fn)

        p0, p1 = sq(p0f), sq(p1f)
        Sg0, Sg1 = sq(Sg0f), sq(Sg1f)
        t1 = tstep[:, 0, :, :, 0]
        t2 = tstep2[:, 0, :, :, 0]

        # PVT values at n0/n1: rows (invBg, invBo, invug, invuo, Rs, Rv, Vro)
        def props(pvt):
            return tuple(sq(pvt[0, i]) for i in range(6))

        invBg0, invBo0, invug0, invuo0, Rs0, Rv0 = props(pvt0)
        invBg1, invBo1, invug1, invuo1, Rs1, Rv1 = props(pvt1)
        dinvBg0, dinvBo0 = sq(pvt0[1, 0]), sq(pvt0[1, 1])
        dRs0, dRv0 = sq(pvt0[1, 4]), sq(pvt0[1, 5])

        if self.use_pallas_stencil:
            # fused single-VMEM-pass two-phase residual (the heavy 4-flux
            # upstream math); gradients via the kernel's custom vjp
            from srm_tpu.kernels.stencil_pallas import (
                GCStencilConfig, gc_stencil_residual,
            )
            krog1_full, krgo1_full = self.relperm(Sg1)
            gcfg = GCStencilConfig(C=C, D=D, dx=self.dx, dy=self.dy, dz=self.dz,
                                   Swmin=self.Swmin, phi=self.phi0)
            tsteps = jnp.concatenate([t1.reshape(-1, 1), t2.reshape(-1, 1)], axis=1)
            fields = (p0, pad_symmetric(p1), pad_symmetric(kx_c), Sg0, Sg1,
                      pad_symmetric(krgo1_full), pad_symmetric(krog1_full),
                      invBg0, invBo0, Rs0, Rv0, dinvBg0, dinvBo0, dRs0, dRv0,
                      pad_symmetric(invBg1), pad_symmetric(invBo1),
                      pad_symmetric(invug1), pad_symmetric(invuo1),
                      pad_symmetric(Rs1), pad_symmetric(Rv1),
                      sq(qfg1), sq(qdg1), sq(qfo1), sq(qvo1))
            (dom_g, dom_o, ibc, trn_g, trn_o, mbc_g, mbc_o) = gc_stencil_residual(
                fields, q_well, tsteps, gcfg)
            zeros = jnp.zeros_like(dom_g)
            out = {"p_n0": p0f, "p_n1": p1f, "Sg_n0": Sg0f, "Sg_n1": Sg1f,
                   "tstep": tstep, "q": (qfg1, qdg1, qfo1, qvo1), "pwf": pwf1}
            return {
                "gas": {"dom": dom_g, "dbc": zeros, "nbc": zeros, "ibc": ibc,
                        "ic": zeros, "mbc": mbc_g, "cmbc": zeros, "tde": trn_g},
                "oil": {"dom": dom_o, "dbc": zeros, "nbc": zeros, "ibc": ibc,
                        "ic": zeros, "mbc": mbc_o, "cmbc": zeros, "tde": trn_o},
                "outputs": out,
            }

        # field-level stencil math shared with the TF golden test
        krog1_full, krgo1_full = self.relperm(Sg1)
        qfg1c, qdg1c = sq(qfg1), sq(qdg1)
        qfo1c, qvo1c = sq(qfo1), sq(qvo1)
        (dom_g, dom_o, ibc, mbc_g, mbc_o, trn_g, trn_o) = gc_residual_from_fields(
            p0, p1, Sg0, Sg1, invBg0, invBo0, Rs0, Rv0,
            invBg1, invBo1, invug1, invuo1, Rs1, Rv1,
            dinvBg0, dinvBo0, dRs0, dRv0, krgo1_full, krog1_full,
            qfg1c, qdg1c, qfo1c, qvo1c, q_well, kx_c, phi_c, t1, t2,
            C, D, self.dx, self.dy, self.dz, self.Swmin)

        zeros = jnp.zeros_like(dom_g)
        out = {"p_n0": p0f, "p_n1": p1f, "Sg_n0": Sg0f, "Sg_n1": Sg1f,
               "tstep": tstep, "q": (qfg1, qdg1, qfo1, qvo1), "pwf": pwf1}
        return {
            "gas": {"dom": dom_g, "dbc": zeros, "nbc": zeros, "ibc": ibc, "ic": zeros,
                    "mbc": mbc_g, "cmbc": zeros, "tde": trn_g},
            "oil": {"dom": dom_o, "dbc": zeros, "nbc": zeros, "ibc": ibc, "ic": zeros,
                    "mbc": mbc_o, "cmbc": zeros, "tde": trn_o},
            "outputs": out,
        }

    def _residuals_gc_3d(self, params, x: Array) -> Dict[str, Any]:
        """Full-3D gas-condensate residual with z-direction fluxes.

        NEW capability: the reference's GC residual is 2D-only
        (``physics_error_gas_oil_2D``, ref physics_loss.py:230-712); this
        extends the 4-flux (gg/go/oo/og) upstream-weighted math to a 7-point
        stencil with vertical permeability kz = vertical_anisotropy · kx,
        mirroring ``_residuals_dg_3d``. Fields are (B, D, H, W).
        """
        from srm_tpu.ops.stencil import (
            average_faces_3d, harmonic_faces_3d, neighbors_3d, pad_symmetric_3d,
            seven_point_divergence, upstream_faces_3d,
        )
        C, D = self.C, self.D
        sq3 = lambda f: f[..., 0]                              # noqa: E731
        kx_c = self._denorm_permx(x[..., 4])                   # (B, D, H, W)
        phi_c = self._phi(kx_c)
        kn = neighbors_3d(pad_symmetric_3d(kx_c))
        kzn = neighbors_3d(pad_symmetric_3d(self.kv_kh * kx_c))
        kx_ih, kx_i_h, ky_jh, ky_j_h, kz_kh, kz_k_h = harmonic_faces_3d(kn, kzn)
        dv = self.dx * self.dy * self.dz
        cf = 97.32e-6 / (1.0 + 55.8721 * phi_c**1.428586)
        q_well = jnp.asarray(self.q_well_idx)

        # ---- forwards (doubled-batch over the two time levels) -------------
        m = self.models
        dt0f = self._net("time_step", params, x)
        tstep = jnp.mean(dt0f, axis=tuple(range(1, dt0f.ndim - 1)), keepdims=True)
        dt_norm = self._norm_dt(tstep)
        x1 = x.at[..., 3:4].add(jnp.broadcast_to(dt_norm, x[..., 3:4].shape))
        dt1f = self._net("time_step", params, x1)
        tstep2 = jnp.mean(dt1f, axis=tuple(range(1, dt1f.ndim - 1)), keepdims=True)

        B = x.shape[0]
        x01 = jnp.concatenate([x, x1], axis=0)
        p01 = self._net("pressure", params, x01)
        Sg01 = jnp.clip(self._net("saturation_model", params, x01),
                        0.0, self.Sgi)
        pvt01 = m["pvt_model"].apply(params["pvt_model"], p01)
        p0f, p1f = p01[:B], p01[B:]
        Sg0f, Sg1f = Sg01[:B], Sg01[B:]
        pvt0, pvt1 = pvt01[:, :, :B], pvt01[:, :, B:]

        well = m["well_rate_bhp_model"]
        pvt_fn = lambda p: m["pvt_model"].apply(params["pvt_model"], p)  # noqa: E731
        (qfg1, qdg1, qfo1, qvo1), pwf1 = well.compute_rates_and_bhp(
            x1, p1f, Sg1f, relperm_model=self.relperm, model_PVT=pvt_fn)

        p0, p1 = sq3(p0f), sq3(p1f)
        Sg0, Sg1 = sq3(Sg0f), sq3(Sg1f)
        So0 = 1.0 - self.Swmin - Sg0
        So1 = 1.0 - self.Swmin - Sg1
        t1 = tstep.reshape((B,) + (1,) * (p0.ndim - 1))
        t2 = tstep2.reshape((B,) + (1,) * (p0.ndim - 1))

        def props(pvt):
            return tuple(sq3(pvt[0, i]) for i in range(6))

        invBg0, invBo0, invug0, invuo0, Rs0, Rv0 = props(pvt0)
        invBg1, invBo1, invug1, invuo1, Rs1, Rv1 = props(pvt1)
        dinvBg0, dinvBo0 = sq3(pvt0[1, 0]), sq3(pvt0[1, 1])
        dRs0, dRv0 = sq3(pvt0[1, 4]), sq3(pvt0[1, 5])

        # surface-mass accumulations m_g, m_o (ref :419-427)
        RsinvBo0, RvinvBg0 = Rs0 * invBo0, Rv0 * invBg0
        RsinvBo1, RvinvBg1 = Rs1 * invBo1, Rv1 * invBg1
        mg0 = phi_c * (invBg0 * Sg0 + RsinvBo0 * So0)
        mo0 = phi_c * (invBo0 * So0 + RvinvBg0 * Sg0)
        mg1 = phi_c * (invBg1 * Sg1 + RsinvBo1 * So1)
        mo1 = phi_c * (invBo1 * So1 + RvinvBg1 * Sg1)
        ratio = 1.0 + t2 / jnp.maximum(t1, 1e-12)
        mg2 = (mg1 - mg0) * ratio + mg0
        mo2 = (mo1 - mo0) * ratio + mo0

        rte = EPSILON * 0.25
        denom_t = t1 * t2 + t2**2
        trn_g = (dv / D) * (rte / t1 + (t2 * mg0 + t1 * mg2 - (t1 + t2) * mg1) / denom_t)
        trn_o = (dv / D) * (rte / t1 + (t2 * mo0 + t1 * mo2 - (t1 + t2) * mo1) / denom_t)

        # relperm at n1 + upstream weighting over the six faces
        krog1_full, krgo1_full = self.relperm(Sg1)
        pn = neighbors_3d(pad_symmetric_3d(p1))
        kgo = upstream_faces_3d(neighbors_3d(pad_symmetric_3d(krgo1_full)), pn)
        kog = upstream_faces_3d(neighbors_3d(pad_symmetric_3d(krog1_full)), pn)

        def favg(f):
            return average_faces_3d(neighbors_3d(pad_symmetric_3d(f)))

        bgug = favg(invBg1 * invug1)
        bouo = favg(invBo1 * invuo1)
        rvbgug = favg(Rv1 * invBg1 * invug1)
        rsbouo = favg(Rs1 * invBo1 * invuo1)

        # chord-slope saturation derivatives (ref :465-468)
        dp = p1 - p0
        safe_dp = jnp.where(jnp.abs(dp) > 0, dp, 1.0)
        d_Sg = jnp.where(jnp.abs(dp) > 0, (Sg1 - Sg0) / safe_dp, 0.0)
        d_So = jnp.where(jnp.abs(dp) > 0, (So1 - So0) / safe_dp, 0.0)

        d_invBg = dinvBg0
        d_invBo = dinvBo0
        d_RsinvBo = Rs0 * dinvBo0 + invBo0 * dRs0
        d_RvinvBg = Rv0 * dinvBg0 + invBg0 * dRv0

        cprgg = phi_c * cf * invBg0
        cprgo = phi_c * cf * RsinvBo0
        cproo = phi_c * cf * invBo0
        cprog = phi_c * cf * RvinvBg0

        inv_dxx = 1.0 / (self.dx * self.dx)
        inv_dyy = 1.0 / (self.dy * self.dy)
        inv_dzz = 1.0 / (self.dz * self.dz)
        kfaces = (kx_ih, kx_i_h, ky_jh, ky_j_h, kz_kh, kz_k_h)
        inv_d = (inv_dxx, inv_dxx, inv_dyy, inv_dyy, inv_dzz, inv_dzz)

        def trans(kr_faces, prop_faces):
            return tuple(C * kf * kr * pr * iv
                         for kf, kr, pr, iv in zip(kfaces, kr_faces, prop_faces, inv_d))

        agg = trans(kgo, bgug)
        ago = trans(kog, rsbouo)
        aoo = trans(kog, bouo)
        aog = trans(kgo, rvbgug)

        inv_Dt = 1.0 / (D * t1)
        cpgg = inv_Dt * (phi_c * invBg1 * d_Sg + Sg0 * (phi_c * d_invBg + cprgg)) * dp
        cpgo = inv_Dt * (phi_c * RsinvBo1 * d_So + So0 * (phi_c * d_RsinvBo + cprgo)) * dp
        cpoo = inv_Dt * (phi_c * invBo1 * d_So + So0 * (phi_c * d_invBo + cproo)) * dp
        cpog = inv_Dt * (phi_c * RvinvBg1 * d_Sg + Sg0 * (phi_c * d_RvinvBg + cprog)) * dp

        qfg1c, qdg1c = sq3(qfg1), sq3(qdg1)
        qfo1c, qvo1c = sq3(qfo1), sq3(qvo1)

        def div7(a, q):
            return seven_point_divergence(a[0], a[1], a[2], a[3], a[4], a[5],
                                          pn, q / dv, dv)

        dom_divq_gg = div7(agg, qfg1c)
        dom_divq_go = div7(ago, qdg1c)
        dom_divq_oo = div7(aoo, qfo1c)
        dom_divq_og = div7(aog, qvo1c)

        dom_g = (dom_divq_gg + dv * cpgg) + (dom_divq_go + dv * cpgo)
        dom_o = (dom_divq_oo + dv * cpoo) + (dom_divq_og + dv * cpog)
        ibc = q_well * ((dom_divq_gg + dom_divq_go) + (dom_divq_oo + dom_divq_og))

        red_axes = tuple(range(1, qfg1c.ndim))
        mbc_gg = dv * inv_Dt * phi_c * (Sg1 * invBg1 - Sg0 * invBg0)
        mbc_go = dv * inv_Dt * phi_c * (So1 * RsinvBo1 - So0 * RsinvBo0)
        mbc_oo = dv * inv_Dt * phi_c * (So1 * invBo1 - So0 * invBo0)
        mbc_og = dv * inv_Dt * phi_c * (Sg1 * RvinvBg1 - Sg0 * RvinvBg0)
        mbc_g = (-jnp.sum(qfg1c + qdg1c, axis=red_axes)
                 - jnp.sum(mbc_gg + mbc_go, axis=red_axes))
        mbc_o = (-jnp.sum(qfo1c + qvo1c, axis=red_axes)
                 - jnp.sum(mbc_oo + mbc_og, axis=red_axes))

        zeros = jnp.zeros_like(dom_g)
        out = {"p_n0": p0f, "p_n1": p1f, "Sg_n0": Sg0f, "Sg_n1": Sg1f,
               "tstep": tstep, "q": (qfg1, qdg1, qfo1, qvo1), "pwf": pwf1}
        return {
            "gas": {"dom": dom_g, "dbc": zeros, "nbc": zeros, "ibc": ibc, "ic": zeros,
                    "mbc": mbc_g, "cmbc": zeros, "tde": trn_g},
            "oil": {"dom": dom_o, "dbc": zeros, "nbc": zeros, "ibc": ibc, "ic": zeros,
                    "mbc": mbc_o, "cmbc": zeros, "tde": trn_o},
            "outputs": out,
        }

    # ------------------------------------------------------------------
    # loss + gradients (ref pinn_batch_sse_grad, physics_loss.py:742-870)
    # ------------------------------------------------------------------
    def _label_list(self, y) -> List[Array]:
        if isinstance(y, dict):
            keys = ["PRESSURE"] if self.fluid_type == "DG" else ["PRESSURE", "SGAS"]
            return [y[k] for k in keys if k in y]
        return [y]

    def loss_and_metrics(self, params, x: Array, y) -> Tuple[Array, Dict]:
        """Total weighted SSE + per-term aux (pure function; jit-safe).

        ``physics_mode_fraction`` semantics (DOCUMENTED DEVIATION):

        * ``f >= 1``  — pure physics (labels ignored; td weight from config,
          0 by default). Matches the reference.
        * ``f == 0``  — pure data (physics residuals are not evaluated;
          the td weight defaults to 1 when the physics-mode default of 0
          would zero the loss). Matches the reference's
          ``zeros_like_pinn_error`` path (ref physics_loss.py:716-729).
        * ``0 < f < 1`` — a TRUE mixed mode: physics-term weights are scaled
          by ``f`` and the td weight by ``1 - f``. The reference degenerates
          to pure data mode for any fraction below 1
          (ref training.py:605 unpacks every f<1 as data mode), so this is
          new capability, covered by ``tests/test_modes.py``.
        """
        physics = self.physics_mode_fraction >= 1.0
        f = min(max(self.physics_mode_fraction, 0.0), 1.0)
        mixed = 0.0 < f < 1.0
        phases = ("gas",) if self.fluid_type == "DG" else ("gas", "oil")

        if physics or self.physics_mode_fraction > 0.0:
            res = self.residuals(params, x)
        else:
            # data-only mode: single forward, zero physics residuals
            p0f, dt0f, _, Sg0f = self._forward(params, x)
            zeros = jnp.zeros_like(self._sq(p0f))
            res = {ph: {t: zeros for t in LOSS_TERMS if t != "td"} for ph in phases}
            res["outputs"] = {"p_n0": p0f, "p_n1": p0f,
                              "tstep": jnp.mean(dt0f, axis=tuple(range(1, dt0f.ndim - 1)), keepdims=True)}
            if self.fluid_type == "GC":
                res["outputs"]["Sg_n0"] = Sg0f

        # training-data term
        labels = self._label_list(y)
        model_out = [res["outputs"]["p_n0"]]
        if self.fluid_type == "GC":
            model_out.append(res["outputs"]["Sg_n0"])
        td_terms, td_stds = [], []
        for lab, out in zip(labels, model_out):
            lab = jnp.reshape(lab, out.shape)
            td_terms.append(out - lab)
            td_stds.append(jnp.maximum(jnp.std(lab), 1e-8))
        if self.td_normalization == "label_std":
            td_terms = [e / s for e, s in zip(td_terms, td_stds)]
        elif self.td_normalization == "balance" and len(td_terms) > 1:
            td_terms = [td_terms[0]] + [
                e * (td_stds[0] / s) for e, s in zip(td_terms[1:], td_stds[1:])]
        if self.sg_td_focus > 0.0 and len(td_terms) > 1:
            # per-pixel dropout focus on the Sg (2nd) label: w has mean 1 by
            # construction, so the SSE scale — and thus any td_normalization
            # rescaling above — is preserved; sqrt(w) because SSE squares it
            sg_lab = jnp.reshape(labels[1], td_terms[1].shape)
            dev = jnp.abs(sg_lab - self.Sgi)
            rel = dev / jnp.maximum(jnp.mean(dev), 1e-12)
            w = (1.0 + self.sg_td_focus * rel) / (1.0 + self.sg_td_focus)
            td_terms[1] = td_terms[1] * jnp.sqrt(w)

        total = jnp.asarray(0.0, jnp.float32)
        aux: Dict[str, Dict[str, Array]] = {ph: {} for ph in phases}
        for pi, ph in enumerate(phases):
            for t in LOSS_TERMS:
                if t == "td":
                    err = td_terms[pi] if pi < len(td_terms) else jnp.zeros(())
                    w = self.weights[ph][t]
                    if not physics and w == 0.0:
                        # data-only mode must train on something: default the
                        # td weight to 1 when the physics-mode default (0)
                        # would zero the entire loss
                        w = 1.0
                    if mixed:
                        w = w * (1.0 - f)
                else:
                    err = res[ph][t]
                    w = self.weights[ph][t]
                    if mixed:
                        w = w * f
                sse = jnp.sum(jnp.square(err))
                count = jnp.asarray(np.prod(err.shape) if err.ndim else 1, jnp.float32)
                wsse = w * sse
                total = total + wsse
                aux[ph][t] = wsse / jnp.maximum(count, 1.0)
        aux["outputs"] = res["outputs"]
        return total, aux

    def pinn_batch_sse_grad(self, params, x: Array, y):
        """Returns ``(aux, grads_by_key, total)``:

        * ``aux`` — per-phase per-term weighted MSE dict plus ``outputs``
          (p_n0/p_n1/tstep/q/pwf fields), covering the reference 5-tuple's
          ``wmse``/``y_model`` roles (ref training.py:603-652);
        * ``grads_by_key`` — gradient of the total weighted loss w.r.t. each
          trainable model's params, keyed by optimizer key (the reference's
          ``wmse_grad`` as actually consumed at ref training.py:643-652);
        * ``total`` — the total weighted SSE (the reference's ``wsse``).

        The reference's separate ``error_count`` return is subsumed by the
        per-term counts already folded into ``aux``'s MSE normalization.
        """
        (total, aux), grads = jax.value_and_grad(self.loss_and_metrics, has_aux=True)(
            params, x, y)
        grads_by_key = {k: grads[self.logical_name(k)] for k in self.trainable_models_keys}
        return aux, grads_by_key, total

    def per_term_grad_norms(self, params, x: Array, y) -> Dict[str, Dict[str, float]]:
        """Per-loss-term gradient L2 norms for each trainable model.

        Observability parity with the reference, which returns 8 per-term
        gradients from its loss (ref physics_loss.py:849-859) even though
        training applies only their sum (ref training.py:643-652).  The
        per-term grad NORMS are the usable diagnostic — a dead head (e.g. the
        GC Sg saturation head under the softplus rectifier) shows up as a
        ~zero row immediately.  One backward pass per (phase, term) via
        ``jax.jacrev`` over the stacked term vector; debug-path only — do not
        put this inside the training step.

        Returns ``{"<phase>/<term>": {<model>: l2_norm}}``.
        """
        phases = ("gas",) if self.fluid_type == "DG" else ("gas", "oil")
        keys = [(ph, t) for ph in phases for t in LOSS_TERMS]

        def terms_vec(p):
            _, aux = self.loss_and_metrics(p, x, y)
            return jnp.stack([aux[ph][t] for ph, t in keys])

        jac = jax.jacrev(terms_vec)(params)
        model_names = sorted({self.logical_name(k) for k in self.trainable_models_keys})
        out: Dict[str, Dict[str, float]] = {}
        for i, (ph, t) in enumerate(keys):
            row = {}
            for name in model_names:
                leaves = jax.tree_util.tree_leaves(jac[name])
                sq = sum(jnp.sum(jnp.square(l[i])) for l in leaves) if leaves else 0.0
                row[name] = float(jnp.sqrt(sq))
            out[f"{ph}/{t}"] = row
        return out

    def logical_name(self, optimizer_key: str) -> str:
        mapping = {"pressure": "pressure", "time_step": "time_step",
                   "fluid_property": "pvt_model", "well_rate_bhp": "well_rate_bhp_model",
                   "saturation": "saturation_model"}
        return mapping[optimizer_key]
