"""Implicit finite-volume dry-gas reference simulator (on-device label generator).

NEW capability beyond the reference, which requires an EXTERNAL commercial
simulator run and only parses its output files
(``/root/reference/data_processing/srm_data_processing.py:454-514``). This
module generates PRESSURE labels for any KLE realization directly on device,
closing the simulator-label loop end-to-end: KLE fields → FV simulation →
labels → data-mode training / pressure-RMSE evaluation, with no external
binary.

Discretization — deliberately the SAME finite-volume scheme as the physics
loss (so a perfectly-trained surrogate zeroes the residual on these labels):

* 5/7-point stencil with harmonic-mean inter-block permeability and
  arithmetic face averages of ``invBg·invug`` (ref physics_loss.py:29-61,
  147-148; ``srm_tpu.ops.stencil``);
* accumulation ``(V/D)·Sgi·(φ·ΔinvBg/Δp + φ·cf·invBg)·Δp/Δt`` with the
  chord-slope ΔinvBg/Δp (mass-conservative at convergence, and exactly the
  loss's tank-MBC bookkeeping, ref :149-150,193);
* Peaceman wells with rate targets clipped by the min-BHP drawdown bound and
  shut-in windows (ref well_rate_bhp_Subclassed.py:613-724, the
  non-iterative path);
* backward-Euler in time, Picard-lagged coefficients, one dense
  ``jnp.linalg.solve`` per Picard sweep (the grids are ≤ a few thousand
  cells; a dense solve is a single fused MXU-friendly op, far faster under
  XLA than any sparse scatter-gather iteration at this size).

Everything is jit-compatible; realizations are ``vmap``-ed and time steps run
under ``lax.scan``.
"""

from __future__ import annotations

import logging
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray
log = logging.getLogger(__name__)


class FVProblem(NamedTuple):
    """Static problem description (shapes, geometry, wells) for the solver."""

    shape: Tuple[int, int, int]          # (Nz, Ny, Nx)
    face_pairs: np.ndarray               # (F, 2) flat cell indices per face
    face_geom: np.ndarray                # (F,) C * A/d geometric factor
    dv: float                            # cell volume dx*dy*dz
    phi: Any                             # porosity: float, or (N,) per-cell field
    Pi: float                            # initial pressure
    Sgi: float                           # initial gas saturation
    krgo: float                          # constant DG relperm at Sgi
    D: float                             # volume conversion constant
    well_cells: np.ndarray               # (W,) flat indices
    q_target: np.ndarray                 # (W,) signed control rates
    pwf_min: np.ndarray                  # (W,)
    well_ck_geom: np.ndarray             # (W,) 2π·cr·dz·C / ln(ro/rw), kx factored out
    shutin_windows: np.ndarray           # (W, S, 2)


def _build_faces(Nz: int, Ny: int, Nx: int, dx: float, dy: float, dz: float,
                 C: float, kv_kh: float = 1.0):
    """Static face index pairs + geometric transmissibility factors."""
    idx = np.arange(Nz * Ny * Nx).reshape(Nz, Ny, Nx)
    pairs, geom, kscale = [], [], []
    if Nx > 1:
        a, b = idx[:, :, :-1].reshape(-1), idx[:, :, 1:].reshape(-1)
        pairs.append(np.stack([a, b], 1))
        geom.append(np.full(a.size, C * dy * dz / dx))
        kscale.append(np.ones(a.size))
    if Ny > 1:
        a, b = idx[:, :-1, :].reshape(-1), idx[:, 1:, :].reshape(-1)
        pairs.append(np.stack([a, b], 1))
        geom.append(np.full(a.size, C * dx * dz / dy))
        kscale.append(np.ones(a.size))
    if Nz > 1:
        a, b = idx[:-1, :, :].reshape(-1), idx[1:, :, :].reshape(-1)
        pairs.append(np.stack([a, b], 1))
        geom.append(np.full(a.size, C * dx * dy / dz))
        kscale.append(np.full(a.size, kv_kh))   # vertical permeability scale
    return (np.concatenate(pairs, 0), np.concatenate(geom, 0),
            np.concatenate(kscale, 0))


def _phi_from_config(res: Dict):
    """Scalar porosity, or a flattened (N,) per-cell field if the config holds
    an array/nested-list (heterogeneous φ — matches the loss's ``phi_field``;
    the reference carries per-cell ``phi_0_ij``, ref physics_loss.py:21-27)."""
    poro = np.asarray(res["porosity"], np.float32)
    if poro.ndim == 0:
        return float(poro)
    n = res["Nz"] * res["Ny"] * res["Nx"]
    flat = poro.reshape(-1)
    if flat.size != n:
        raise ValueError(f"porosity field has {flat.size} cells, grid has {n}")
    return flat


def build_problem(reservoir_config: Dict, wells_config: Dict, scal_config: Dict,
                  general_config: Dict, relperm=None) -> Tuple[FVProblem, np.ndarray]:
    """FVProblem from the standard config bundle. Returns (problem, kscale)."""
    from srm_tpu.config import get_conversion_constants
    from srm_tpu.physics.relperm import RelativePermeability
    from srm_tpu.physics.wells import WellDataProcessor

    res = reservoir_config
    Nz, Ny, Nx = res["Nz"], res["Ny"], res["Nx"]
    dx = res["length"] / Nx
    dy = res["width"] / Ny
    dz = res["thickness"] / Nz
    units = get_conversion_constants(general_config["srm_units"])
    C, D = units["C"], units["D"]

    pairs, geom, kscale = _build_faces(Nz, Ny, Nx, dx, dy, dz, C,
                                       res.get("vertical_anisotropy", 1.0))

    relperm = relperm or RelativePermeability.from_config(
        scal_config["end_points"], scal_config["corey_exponents"])
    Swmin = scal_config["end_points"]["Swmin"]
    Sgi = 1.0 - Swmin
    krgo = float(relperm(jnp.asarray(Sgi))[1])

    wdp = WellDataProcessor(wells_config["connections"])
    wd = wdp.get_well_data()
    conn = np.asarray(wd["connection_index"], np.int64)       # (W, 3) (k, j, i)
    well_cells = conn[:, 0] * Ny * Nx + conn[:, 1] * Nx + conn[:, 2]

    # Peaceman geometric part of the well index (kx multiplies in later):
    # Ck = 2π·cr·kx·dz·C / ln(ro/rw), isotropic ro = 0.28·sqrt(dx²+dy²)/2
    kx_ky = res.get("horizontal_anisotropy", 1.0)
    ro = 0.28 * np.sqrt(np.sqrt(kx_ky) * dx**2 + np.sqrt(1.0 / kx_ky) * dy**2) / (
        kx_ky**0.25 + (1.0 / kx_ky) ** 0.25)
    rw = np.asarray(wd["wellbore_radius"], np.float64)
    cr = np.asarray(wd["completion_ratio"], np.float64)
    ck_geom = 2.0 * np.pi * cr * dz * C / np.log(ro / np.where(rw > 0, rw, 1.0))

    windows = np.asarray(wd["shutin_days"], np.float32)
    if windows.ndim == 2:
        windows = windows[:, None, :]

    prob = FVProblem(
        shape=(Nz, Ny, Nx), face_pairs=pairs, face_geom=geom,
        dv=dx * dy * dz, phi=_phi_from_config(res), Pi=res["initialization"]["Pi"],
        Sgi=Sgi, krgo=krgo, D=D,
        well_cells=well_cells,
        q_target=np.asarray(wd["control_mode_value"], np.float32),
        pwf_min=np.asarray(wd["minimum_bhp"], np.float32),
        well_ck_geom=ck_geom.astype(np.float32),
        shutin_windows=windows,
    )
    return prob, kscale


# grids at or below this cell count use the dense MXU solve; larger grids
# (3D: 39×39×10 = 15,210 cells → a 0.9 GB dense matrix per realization)
# switch to the matrix-free iterative path
_DENSE_MAX_CELLS = 4096


def _face_apply(x: Array, i1: Array, i2: Array, Tf: Array) -> Array:
    """Matrix-free application of the FV flux operator: (F x)_i = Σ_faces
    Tf·(x_i − x_j) — the off-diagonal scatter the dense path assembles."""
    d = Tf * (x[i1] - x[i2])
    return jnp.zeros_like(x).at[i1].add(d).at[i2].add(-d)


def _face_diag(n: int, i1: Array, i2: Array, Tf: Array) -> Array:
    """Diagonal of the flux operator (for the Jacobi preconditioner)."""
    return jnp.zeros((n,), Tf.dtype).at[i1].add(Tf).at[i2].add(Tf)


def _split_face_grids(Gflat: Array, shape: Tuple[int, int, int]):
    """Split the flat face array (x-, y-, z-face blocks in ``_build_faces``
    order) into per-axis grids ``Gx (Nz,Ny,Nx-1) / Gy (Nz,Ny-1,Nx) /
    Gz (Nz-1,Ny,Nx)`` (``None`` for absent axes).

    The structured form lets the iterative solver apply the flux operator as
    shifted slices + pads — dense vector ops the TPU executes at bandwidth —
    instead of gather/scatter over a face list (latency-bound: measured
    ~2 ms/CG-iteration scatter vs ~40 µs structured on one v5e chip)."""
    Nz, Ny, Nx = shape
    out = []
    off = 0
    for cnt, gshape in (((Nx - 1) * Ny * Nz, (Nz, Ny, Nx - 1)),
                        ((Ny - 1) * Nx * Nz, (Nz, Ny - 1, Nx)),
                        ((Nz - 1) * Ny * Nx, (Nz - 1, Ny, Nx))):
        if gshape[0] and gshape[1] and gshape[2]:
            out.append(Gflat[off:off + cnt].reshape(gshape))
            off += cnt
        else:
            out.append(None)
    return tuple(out)


def _axis_avg(m3: Array):
    """Arithmetic face averages of a cell field along x/y/z."""
    return (0.5 * (m3[:, :, :-1] + m3[:, :, 1:]) if m3.shape[2] > 1 else None,
            0.5 * (m3[:, :-1, :] + m3[:, 1:, :]) if m3.shape[1] > 1 else None,
            0.5 * (m3[:-1, :, :] + m3[1:, :, :]) if m3.shape[0] > 1 else None)


def _axis_upstream(v3: Array, p3: Array):
    """Per-axis upstream select of cell field ``v3`` by the pressure rise
    direction (matches the flat-face convention: take the higher-pressure
    side)."""
    vx = (jnp.where(p3[:, :, 1:] > p3[:, :, :-1], v3[:, :, 1:], v3[:, :, :-1])
          if v3.shape[2] > 1 else None)
    vy = (jnp.where(p3[:, 1:, :] > p3[:, :-1, :], v3[:, 1:, :], v3[:, :-1, :])
          if v3.shape[1] > 1 else None)
    vz = (jnp.where(p3[1:, :, :] > p3[:-1, :, :], v3[1:, :, :], v3[:-1, :, :])
          if v3.shape[0] > 1 else None)
    return vx, vy, vz


def _stencil_apply(x3: Array, Tx, Ty, Tz) -> Array:
    """(F x)(cell) = Σ_faces T·(x_cell − x_neighbor), structured form."""
    out = jnp.zeros_like(x3)
    if Tx is not None:
        d = Tx * (x3[:, :, :-1] - x3[:, :, 1:])
        out = out + jnp.pad(d, ((0, 0), (0, 0), (0, 1)))
        out = out - jnp.pad(d, ((0, 0), (0, 0), (1, 0)))
    if Ty is not None:
        d = Ty * (x3[:, :-1, :] - x3[:, 1:, :])
        out = out + jnp.pad(d, ((0, 0), (0, 1), (0, 0)))
        out = out - jnp.pad(d, ((0, 0), (1, 0), (0, 0)))
    if Tz is not None:
        d = Tz * (x3[:-1, :, :] - x3[1:, :, :])
        out = out + jnp.pad(d, ((0, 1), (0, 0), (0, 0)))
        out = out - jnp.pad(d, ((1, 0), (0, 0), (0, 0)))
    return out


def _stencil_diag(shape, Tx, Ty, Tz) -> Array:
    """Diagonal of the structured flux operator."""
    out = jnp.zeros(shape, Tx.dtype if Tx is not None else jnp.float32)
    if Tx is not None:
        out = out + jnp.pad(Tx, ((0, 0), (0, 0), (0, 1)))
        out = out + jnp.pad(Tx, ((0, 0), (0, 0), (1, 0)))
    if Ty is not None:
        out = out + jnp.pad(Ty, ((0, 0), (0, 1), (0, 0)))
        out = out + jnp.pad(Ty, ((0, 0), (1, 0), (0, 0)))
    if Tz is not None:
        out = out + jnp.pad(Tz, ((0, 1), (0, 0), (0, 0)))
        out = out + jnp.pad(Tz, ((1, 0), (0, 0), (0, 0)))
    return out


def _pcg_fixed(mv, b: Array, x0: Array, diag: Array, iters: int,
               tol: float) -> Array:
    """Jacobi-preconditioned CG with a FIXED trip count (``lax.fori_loop``).

    TPU-idiomatic replacement for ``jax.scipy.sparse.linalg.cg``: no dynamic
    ``while_loop`` (static control flow compiles to one unrolled-schedulable
    loop and keeps per-dispatch wall time bounded and batch-independent under
    ``vmap``). Convergence is handled by masking: once ``‖r‖ ≤ tol·‖b‖`` the
    step sizes are zeroed, so extra trips are no-ops.
    """
    bnorm2 = jnp.dot(b, b)
    thresh2 = (tol * tol) * bnorm2

    def body(_, state):
        x, r, z, p, rz = state
        done = jnp.dot(r, r) <= thresh2
        Ap = mv(p)
        denom = jnp.dot(p, Ap)
        alpha = jnp.where(done | (jnp.abs(denom) < 1e-30), 0.0, rz / denom)
        x = x + alpha * p
        r = r - alpha * Ap
        z = r / diag
        rz_new = jnp.dot(r, z)
        beta = jnp.where(jnp.abs(rz) < 1e-30, 0.0, rz_new / rz)
        p = z + beta * p
        return x, r, z, p, rz_new

    r0 = b - mv(x0)
    z0 = r0 / diag
    state = (x0, r0, z0, z0, jnp.dot(r0, z0))
    x, *_ = jax.lax.fori_loop(0, iters, body, state)
    return x


def _bicgstab_fixed(mv, b: Array, x0: Array, diag: Array, iters: int,
                    tol: float) -> Array:
    """Jacobi-preconditioned BiCGStab with a fixed trip count (masked
    convergence), for the nonsymmetric GC Schur complement. Same rationale
    as :func:`_pcg_fixed`."""
    bnorm2 = jnp.dot(b, b)
    thresh2 = (tol * tol) * bnorm2
    eps = 1e-30

    def prec(x):
        return x / diag

    def body(_, state):
        x, r, rhat, p, v, rho, alpha, omega = state
        done = jnp.dot(r, r) <= thresh2
        rho_new = jnp.dot(rhat, r)
        beta = jnp.where(jnp.abs(rho * omega) < eps, 0.0,
                         (rho_new / jnp.where(jnp.abs(rho) < eps, eps, rho))
                         * (alpha / jnp.where(jnp.abs(omega) < eps, eps, omega)))
        p = r + beta * (p - omega * v)
        phat = prec(p)
        v = mv(phat)
        denom = jnp.dot(rhat, v)
        alpha_new = jnp.where(done | (jnp.abs(denom) < eps), 0.0,
                              rho_new / denom)
        s = r - alpha_new * v
        shat = prec(s)
        t = mv(shat)
        tt = jnp.dot(t, t)
        omega_new = jnp.where(done | (tt < eps), 0.0, jnp.dot(t, s) / tt)
        x = x + alpha_new * phat + omega_new * shat
        r = s - omega_new * t
        return x, r, rhat, p, v, rho_new, alpha_new, omega_new

    r0 = b - mv(x0)
    state = (x0, r0, r0, jnp.zeros_like(b), jnp.zeros_like(b),
             jnp.asarray(1.0, b.dtype), jnp.asarray(1.0, b.dtype),
             jnp.asarray(1.0, b.dtype))
    x, *_ = jax.lax.fori_loop(0, iters, body, state)
    return x


def _resolve_solver(solver: str, n_cells: int) -> bool:
    """True → dense (one ``jnp.linalg.solve`` per sweep), False → matrix-free
    iterative (Jacobi-preconditioned CG / BiCGStab). ``'auto'`` picks dense
    for small grids — it is a single fused MXU op there — and iterative once
    the dense matrix would dominate HBM."""
    if solver == "dense":
        return True
    if solver in ("cg", "iterative", "bicgstab"):
        return False
    if solver != "auto":
        raise ValueError(f"unknown solver {solver!r}")
    return n_cells <= _DENSE_MAX_CELLS


def simulate_dry_gas(prob: FVProblem, kscale: np.ndarray, kx: Array, times: Array,
                     pvt_fn: Callable[[Array], Array], n_picard: int = 6,
                     solver: str = "auto", cg_tol: float = 1e-7,
                     cg_maxiter: int = 1000) -> Array:
    """Pressure snapshots (T, N) for one realization.

    ``kx`` — (N,) unnormalized permeability (flattened feature order z,y,x);
    ``times`` — (T,) days, strictly increasing, ``times[0]`` is the initial
    condition time (p = Pi); ``pvt_fn(p) → [2, P, ...]`` as the PVT layer.

    ``solver`` — ``'dense'`` | ``'cg'`` | ``'auto'``. The pressure system is
    symmetric positive definite (flux Laplacian + positive accumulation
    diagonal), so the iterative path is Jacobi-preconditioned conjugate
    gradients on the matrix-free face operator — O(F) memory instead of the
    dense path's O(N²), which is what makes reference-scale 3D grids
    (39×39×10) tractable on one chip.
    """
    N = kx.shape[0]
    i1 = jnp.asarray(prob.face_pairs[:, 0])
    i2 = jnp.asarray(prob.face_pairs[:, 1])
    # harmonic-mean face permeability × geometric factor (static per realization)
    kf = jnp.asarray(kscale) * 2.0 * kx[i1] * kx[i2] / (kx[i1] + kx[i2] + 1e-30)
    G = jnp.asarray(prob.face_geom) * kf                       # (F,)

    wc = jnp.asarray(prob.well_cells)
    q_t = jnp.asarray(prob.q_target)
    pwf_min = jnp.asarray(prob.pwf_min)
    ck = jnp.asarray(prob.well_ck_geom) * kx[wc]               # full Peaceman WI
    windows = jnp.asarray(prob.shutin_windows)                 # (W, S, 2)
    cf_const = 97.32e-6 / (1.0 + 55.8721 * prob.phi**1.428586)

    def pvt_props(p):
        out = pvt_fn(p)
        invBg, invug = out[0, 0], out[0, 1]
        dinvBg = out[1, 0]
        return invBg, invug, dinvBg

    dense = _resolve_solver(solver, N)
    eye = jnp.eye(N, dtype=jnp.float32) if dense else None
    if not dense:
        Gx, Gy, Gz = _split_face_grids(G, prob.shape)

    def step(p_n, t_pair):
        t0, t1 = t_pair
        dt = jnp.maximum(t1 - t0, 1e-6)
        open_mask = jnp.logical_not(
            jnp.any((t1 >= windows[:, :, 0]) & (t1 <= windows[:, :, 1]), axis=-1)
        ).astype(p_n.dtype)

        invBg_n, _, dinvBg_n = pvt_props(p_n)

        def picard(_, p):
            invBg, invug, _ = pvt_props(p)
            # face mobility: arithmetic average of invBg·invug (as the loss)
            if dense:
                lam = prob.krgo * 0.5 * ((invBg * invug)[i1]
                                         + (invBg * invug)[i2])
                Tf = G * lam                                    # (F,)
                A = (jnp.zeros((N, N), jnp.float32)
                     .at[i1, i1].add(Tf).at[i2, i2].add(Tf)
                     .at[i1, i2].add(-Tf).at[i2, i1].add(-Tf))
            else:
                # structured form: face grids, no gather/scatter on the hot path
                m3 = (invBg * invug).reshape(prob.shape)
                mx, my, mz = _axis_avg(m3)
                Tx = Gx * (prob.krgo * mx) if Gx is not None else None
                Ty = Gy * (prob.krgo * my) if Gy is not None else None
                Tz = Gz * (prob.krgo * mz) if Gz is not None else None
            # accumulation: chord-slope ΔinvBg/Δp + rock compressibility
            dp = p - p_n
            chord = jnp.where(jnp.abs(dp) > 1e-3, (invBg - invBg_n) / dp, dinvBg_n)
            acc = (prob.dv / prob.D) * prob.Sgi * prob.phi * (
                chord + cf_const * invBg_n) / dt                # (N,)
            # wells: rate target clipped by the min-BHP drawdown bound
            mg_w = prob.krgo * (invBg * invug)[wc]
            q_max = ck * mg_w * jnp.maximum(p[wc] - pwf_min, 0.0)
            q_w = open_mask * jnp.where(q_t >= 0.0, jnp.minimum(q_t, q_max), q_t)
            b = acc * p_n - jnp.zeros((N,), jnp.float32).at[wc].add(q_w)
            if dense:
                A = A + acc[:, None] * eye
                return jnp.linalg.solve(A, b)
            mv = lambda x: acc * x + _stencil_apply(             # noqa: E731
                x.reshape(prob.shape), Tx, Ty, Tz).reshape(-1)
            diag = acc + _stencil_diag(prob.shape, Tx, Ty, Tz).reshape(-1)
            return _pcg_fixed(mv, b, x0=p, diag=diag,
                              iters=cg_maxiter, tol=cg_tol)

        p1 = jax.lax.fori_loop(0, n_picard, picard, p_n)
        return p1, p1

    p0 = jnp.full((N,), prob.Pi, jnp.float32)
    t_pairs = jnp.stack([times[:-1], times[1:]], axis=1)
    _, ps = jax.lax.scan(step, p0, t_pairs)
    return jnp.concatenate([p0[None], ps], axis=0)             # (T, N)


def simulate_gas_condensate(prob: FVProblem, kscale: np.ndarray, kx: Array,
                            times: Array, pvt_fn: Callable[[Array], Array],
                            relperm, Swmin: float, n_newton: int = 8,
                            solver: str = "auto", cg_tol: float = 1e-7,
                            cg_maxiter: int = 1000) -> Array:
    """Two-phase (gas-condensate) snapshots ``(T, N, 2)`` — (p, Sg) — for one
    realization.

    NEW capability beyond the reference (which requires an external
    compositional simulator for GC labels, ref
    srm_data_processing.py:454-514). Per-cell unknowns are (p, Sg) with
    So = 1 − Swmin − Sg; surface-mass conservation uses exactly the loss's
    scheme (ref physics_loss.py:419-427, 563-621 / ``_residuals_gc``):

    * gas mass   φ·(invBg·Sg + Rs·invBo·So), flux  krgo·invBg·invug (free)
      + krog·Rs·invBo·invuo (dissolved in flowing oil);
    * oil mass   φ·(invBo·So + Rv·invBg·Sg), flux  krog·invBo·invuo (free)
      + krgo·Rv·invBg·invug (vaporized in flowing gas);
    * upstream relperm at faces, arithmetic face averages of the PVT
      products, harmonic-mean permeability;
    * Peaceman wells under total-surface-gas-rate control clipped by the
      min-BHP drawdown bound; the oil rate follows the phase-mobility ratio
      (the drawdown-consistent split, as the well solver's λ-scaling path).

    Solver: backward-Euler, full Newton on the accumulation terms with
    Picard-lagged flux transmissibilities; the saturation unknown is
    eliminated per cell via the diagonal Schur complement (∂R/∂Sg is purely
    local), so each iteration is ONE linear solve in δp. ``solver`` as in
    :func:`simulate_dry_gas`, except the Schur matrix is nonsymmetric (the
    row scaling ``r``), so the iterative path uses Jacobi-preconditioned
    BiCGStab on the matrix-free face operators instead of CG.
    """
    N = kx.shape[0]
    i1 = jnp.asarray(prob.face_pairs[:, 0])
    i2 = jnp.asarray(prob.face_pairs[:, 1])
    kf = jnp.asarray(kscale) * 2.0 * kx[i1] * kx[i2] / (kx[i1] + kx[i2] + 1e-30)
    G = jnp.asarray(prob.face_geom) * kf

    wc = jnp.asarray(prob.well_cells)
    q_t = jnp.asarray(prob.q_target)
    pwf_min = jnp.asarray(prob.pwf_min)
    ck = jnp.asarray(prob.well_ck_geom) * kx[wc]
    windows = jnp.asarray(prob.shutin_windows)
    cf_const = 97.32e-6 / (1.0 + 55.8721 * prob.phi**1.428586)
    phi0 = prob.phi
    Sgi = prob.Sgi

    def pvt_props(p):
        out = pvt_fn(p)                    # [2, 7, N]: values / dP derivatives
        return out[0], out[1]

    dense = _resolve_solver(solver, N)
    eye = jnp.eye(N, dtype=jnp.float32) if dense else None
    if not dense:
        Gx, Gy, Gz = _split_face_grids(G, prob.shape)

    def assemble(Tf):
        return (jnp.zeros((N, N), jnp.float32)
                .at[i1, i1].add(Tf).at[i2, i2].add(Tf)
                .at[i1, i2].add(-Tf).at[i2, i1].add(-Tf))

    def unit_masses(vals, Sg):
        invBg, invBo, Rs, Rv = vals[0], vals[1], vals[4], vals[5]
        So = 1.0 - Swmin - Sg
        ug = invBg * Sg + Rs * invBo * So
        uo = invBo * So + Rv * invBg * Sg
        return ug, uo

    def step(carry, t_pair):
        p_n, Sg_n = carry
        t0, t1 = t_pair
        dt = jnp.maximum(t1 - t0, 1e-6)
        open_mask = jnp.logical_not(
            jnp.any((t1 >= windows[:, :, 0]) & (t1 <= windows[:, :, 1]), axis=-1)
        ).astype(p_n.dtype)
        c = (prob.dv / prob.D) / dt

        vals_n, _ = pvt_props(p_n)
        ug_n, uo_n = unit_masses(vals_n, Sg_n)

        def newton(_, state):
            p, Sg = state
            vals, der = pvt_props(p)
            invBg, invBo, invug, invuo, Rs, Rv = (vals[i] for i in range(6))
            dinvBg, dinvBo, dRs, dRv = der[0], der[1], der[4], der[5]
            So = 1.0 - Swmin - Sg
            krog, krgo = relperm(Sg)
            bgug = invBg * invug
            bouo = invBo * invuo
            rsbouo = Rs * bouo
            rvbgug = Rv * bgug

            # upstream relperm on faces (i1 upstream unless p rises toward i2)
            if dense:
                up = (p[i2] - p[i1]) > 0
                krgo_f = jnp.where(up, krgo[i2], krgo[i1])
                krog_f = jnp.where(up, krog[i2], krog[i1])
                lam_g = (krgo_f * 0.5 * (bgug[i1] + bgug[i2])
                         + krog_f * 0.5 * (rsbouo[i1] + rsbouo[i2]))
                lam_o = (krog_f * 0.5 * (bouo[i1] + bouo[i2])
                         + krgo_f * 0.5 * (rvbgug[i1] + rvbgug[i2]))
                Tg, To = G * lam_g, G * lam_o
                Fg, Fo = assemble(Tg), assemble(To)
                fg_apply = lambda x: Fg @ x                      # noqa: E731
                fo_apply = lambda x: Fo @ x                      # noqa: E731
            else:
                # structured face grids (no gather/scatter on the hot path)
                p3 = p.reshape(prob.shape)
                kg_up = _axis_upstream(krgo.reshape(prob.shape), p3)
                ko_up = _axis_upstream(krog.reshape(prob.shape), p3)
                bgug_a = _axis_avg(bgug.reshape(prob.shape))
                bouo_a = _axis_avg(bouo.reshape(prob.shape))
                rsbouo_a = _axis_avg(rsbouo.reshape(prob.shape))
                rvbgug_a = _axis_avg(rvbgug.reshape(prob.shape))
                Tgs, Tos = [], []
                for Ga, kg, ko, bg, bo, rs, rv in zip(
                        (Gx, Gy, Gz), kg_up, ko_up, bgug_a, bouo_a,
                        rsbouo_a, rvbgug_a):
                    if Ga is None:
                        Tgs.append(None)
                        Tos.append(None)
                    else:
                        Tgs.append(Ga * (kg * bg + ko * rs))
                        Tos.append(Ga * (ko * bo + kg * rv))
                fg_apply = lambda x: _stencil_apply(             # noqa: E731
                    x.reshape(prob.shape), *Tgs).reshape(-1)
                fo_apply = lambda x: _stencil_apply(             # noqa: E731
                    x.reshape(prob.shape), *Tos).reshape(-1)

            # wells: surface-gas-rate control, min-BHP drawdown clip; the oil
            # rate follows the phase mobility ratio at the well cell
            mg_w = (krgo * bgug + krog * rsbouo)[wc]
            mo_w = (krog * bouo + krgo * rvbgug)[wc]
            qg_max = ck * mg_w * jnp.maximum(p[wc] - pwf_min, 0.0)
            qg_w = open_mask * jnp.where(q_t >= 0.0, jnp.minimum(q_t, qg_max), q_t)
            qo_w = qg_w * mo_w / (mg_w + 1e-30)
            qg_cell = jnp.zeros((N,), jnp.float32).at[wc].add(qg_w)
            qo_cell = jnp.zeros((N,), jnp.float32).at[wc].add(qo_w)

            # accumulations with rock compressibility φ(p) = φ0·(1+cf·(p−p_n))
            phi_p = phi0 * (1.0 + cf_const * (p - p_n))
            ug, uo = unit_masses(vals, Sg)
            Rg = c * (phi_p * ug - phi0 * ug_n) + fg_apply(p) + qg_cell
            Ro = c * (phi_p * uo - phi0 * uo_n) + fo_apply(p) + qo_cell

            dug_dp = dinvBg * Sg + (dRs * invBo + Rs * dinvBo) * So
            duo_dp = dinvBo * So + (dRv * invBg + Rv * dinvBg) * Sg
            dug_dS = invBg - Rs * invBo
            duo_dS = Rv * invBg - invBo                  # < 0 (invBo dominates)
            dAg_dp = c * (phi0 * cf_const * ug + phi_p * dug_dp)
            dAo_dp = c * (phi0 * cf_const * uo + phi_p * duo_dp)
            dAg_dS = c * phi_p * dug_dS
            dAo_dS = c * phi_p * duo_dS

            # Schur complement: eliminate the (diagonal) δSg block
            r = dAg_dS / jnp.where(jnp.abs(dAo_dS) > 1e-30, dAo_dS, -1e-30)
            jop_apply = lambda x: fo_apply(x) + dAo_dp * x       # noqa: E731
            rhs = -Rg + r * Ro
            if dense:
                S = (Fg + dAg_dp[:, None] * eye) - r[:, None] * (
                    Fo + dAo_dp[:, None] * eye)
                dp = jnp.linalg.solve(S, rhs)
            else:
                s_apply = lambda x: (fg_apply(x) + dAg_dp * x    # noqa: E731
                                     - r * jop_apply(x))
                s_diag = (_stencil_diag(prob.shape, *Tgs).reshape(-1)
                          + dAg_dp
                          - r * (_stencil_diag(prob.shape, *Tos).reshape(-1)
                                 + dAo_dp))
                dp = _bicgstab_fixed(s_apply, rhs,
                                     x0=jnp.zeros_like(rhs), diag=s_diag,
                                     iters=cg_maxiter, tol=cg_tol)
            dSg = (-Ro - jop_apply(dp)) / jnp.where(
                jnp.abs(dAo_dS) > 1e-30, dAo_dS, -1e-30)
            p_new = jnp.clip(p + dp, 14.7, 1e4)
            Sg_new = jnp.clip(Sg + dSg, 0.0, Sgi)
            return p_new, Sg_new

        p1, Sg1 = jax.lax.fori_loop(0, n_newton, newton, (p_n, Sg_n))
        return (p1, Sg1), jnp.stack([p1, Sg1], axis=-1)

    p0 = jnp.full((N,), prob.Pi, jnp.float32)
    Sg0 = jnp.full((N,), Sgi, jnp.float32)
    t_pairs = jnp.stack([times[:-1], times[1:]], axis=1)
    _, snaps = jax.lax.scan(step, (p0, Sg0), t_pairs)
    first = jnp.stack([p0, Sg0], axis=-1)[None]
    return jnp.concatenate([first, snaps], axis=0)             # (T, N, 2)


def simulate_realizations(prob: FVProblem, kscale: np.ndarray, kx_fields: Array,
                          times: Array, pvt_fn, n_picard: int = 6,
                          chunk: int = 16, solver: str = "auto",
                          cg_tol: float = 1e-7, cg_maxiter: int = 1000) -> Array:
    """vmap over realizations: (K, Nz, Ny, Nx) × (T,) → (K, T, Nz, Ny, Nx).

    Realizations run in chunks of ``chunk``: each dense Picard iteration
    holds a (chunk, N, N) system plus its LU workspace, so vmapping the
    whole batch at once scales HBM as K·N² and crashes one chip already at
    K=140, N=1521. (The iterative path is O(F) per realization and keeps
    the same chunking only to bound compile shapes.)
    """
    K = kx_fields.shape[0]
    flat = jnp.asarray(kx_fields.reshape(K, -1))
    sim = jax.jit(jax.vmap(
        lambda k: simulate_dry_gas(prob, kscale, k, times, pvt_fn, n_picard,
                                   solver=solver, cg_tol=cg_tol,
                                   cg_maxiter=cg_maxiter)))
    outs = []
    for s in range(0, K, chunk):
        block = flat[s:s + chunk]
        pad = 0
        if block.shape[0] < chunk and s > 0:
            # keep one compiled shape: pad the tail chunk and drop the extras
            pad = chunk - block.shape[0]
            block = jnp.concatenate([block, block[-1:].repeat(pad, axis=0)])
        ps = sim(block)                                         # (c, T, N)
        outs.append(np.asarray(ps[:ps.shape[0] - pad]))
    ps = np.concatenate(outs, axis=0)
    return ps.reshape((K, ps.shape[1]) + prob.shape)


def simulate_realizations_gc(prob: FVProblem, kscale: np.ndarray,
                             kx_fields: Array, times: Array, pvt_fn, relperm,
                             Swmin: float, n_newton: int = 8,
                             chunk: int = 8, solver: str = "auto",
                             cg_tol: float = 1e-7,
                             cg_maxiter: int = 1000) -> Tuple[np.ndarray, np.ndarray]:
    """GC vmap over realizations → (P, Sg), each ``(K, T, Nz, Ny, Nx)``.

    Chunked like :func:`simulate_realizations` (each Newton sweep holds two
    dense (chunk, N, N) flux matrices plus the Schur system, so the GC
    default chunk is half the DG one).
    """
    K = kx_fields.shape[0]
    flat = jnp.asarray(kx_fields.reshape(K, -1))
    sim = jax.jit(jax.vmap(
        lambda k: simulate_gas_condensate(prob, kscale, k, times, pvt_fn,
                                          relperm, Swmin, n_newton,
                                          solver=solver, cg_tol=cg_tol,
                                          cg_maxiter=cg_maxiter)))
    outs = []
    for s in range(0, K, chunk):
        block = flat[s:s + chunk]
        pad = 0
        if block.shape[0] < chunk and s > 0:
            pad = chunk - block.shape[0]
            block = jnp.concatenate([block, block[-1:].repeat(pad, axis=0)])
        ps = sim(block)                                         # (c, T, N, 2)
        outs.append(np.asarray(ps[:ps.shape[0] - pad]))
    ps = np.concatenate(outs, axis=0)
    grid = ps.reshape((K, ps.shape[1]) + prob.shape + (2,))
    return grid[..., 0], grid[..., 1]
