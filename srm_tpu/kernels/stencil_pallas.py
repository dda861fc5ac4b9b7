"""Pallas TPU kernel: fused dry-gas stencil residual.

Fuses the post-forward residual assembly of the DG physics loss — harmonic
transmissibilities, face-averaged 1/(Bg·μg), the 5-point divergence, the
accumulation term, the Richardson truncation error and the well IBC mask —
into one VMEM pass per batch sample (the jnp reference path is
``srm_tpu.losses.physics_loss.PhysicsLoss._residuals_dg`` built from
``srm_tpu.ops.stencil``; original math at
``/root/reference/physics_loss.py:131-206``).

The kernel grid runs over the batch; each program reads its sample's padded
(H+2, W+2) fields plus per-sample Δt scalars from SMEM and writes the three
residual fields. All intermediates live in registers/VMEM — zero HBM traffic
between the stencil stages.

Differentiability: the public entry :func:`dg_stencil_residual` carries a
``jax.custom_vjp`` whose backward pass is the VJP of the numerically
identical jnp implementation, so the kernel can sit inside the training loss
while gradients remain exact.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

EPSILON = 1e-7


class StencilConfig(NamedTuple):
    C: float
    D: float
    dx: float
    dy: float
    dz: float
    Sgi: float
    krgo: float          # constant DG relperm at Sgi
    phi: float           # constant porosity


def _center(f):
    return f[1:-1, 1:-1]


def _shifts(fp):
    """(ij, i1, i_1, j1, j_1) static slices of a padded (H+2, W+2) field."""
    return (fp[1:-1, 1:-1], fp[1:-1, 2:], fp[1:-1, :-2], fp[2:, 1:-1], fp[:-2, 1:-1])


def _residual_math(p0p, p1p, kxp, bgugp, invBg0, invBg1, dinvBg0, q, qwell,
                   t1, t2, cfg: StencilConfig):
    """Shared forward math on padded 2D fields (used by both the Pallas kernel
    body and the jnp reference/backward path)."""
    C, D = cfg.C, cfg.D
    dv = cfg.dx * cfg.dy * cfg.dz

    k_ij, k_i1, k_i_1, k_j1, k_j_1 = _shifts(kxp)
    kx_ih = 2.0 * k_i1 * k_ij / (k_i1 + k_ij)
    kx_i_h = 2.0 * k_ij * k_i_1 / (k_ij + k_i_1)
    ky_jh = 2.0 * k_j1 * k_ij / (k_j1 + k_ij)
    ky_j_h = 2.0 * k_ij * k_j_1 / (k_ij + k_j_1)

    b_ij, b_i1, b_i_1, b_j1, b_j_1 = _shifts(bgugp)
    b_ih = 0.5 * (b_i1 + b_ij)
    b_i_h = 0.5 * (b_ij + b_i_1)
    b_jh = 0.5 * (b_j1 + b_ij)
    b_j_h = 0.5 * (b_ij + b_j_1)

    p_ij, p_i1, p_i_1, p_j1, p_j_1 = _shifts(p1p)
    p0 = _center(p0p)

    cf = 97.32e-6 / (1.0 + 55.8721 * cfg.phi**1.428586)
    cr0 = cfg.phi * cf * invBg0
    cp1 = cfg.Sgi * (cfg.phi * dinvBg0 + cr0)

    inv_dxx = 1.0 / (cfg.dx * cfg.dx)
    inv_dyy = 1.0 / (cfg.dy * cfg.dy)
    a1 = C * kx_i_h * cfg.krgo * b_i_h * inv_dxx
    a2 = C * ky_j_h * cfg.krgo * b_j_h * inv_dyy
    a3 = C * kx_ih * cfg.krgo * b_ih * inv_dxx
    a4 = C * ky_jh * cfg.krgo * b_jh * inv_dyy
    a5 = (1.0 / D) * (cp1 / t1)

    p2 = (p_ij - p0) * (1.0 + t2 / jnp.maximum(t1, 1e-12)) + p0
    tde = (dv / D) * cp1 * (
        2.0 * EPSILON / t1
        + (t2 * p0 + t1 * p2 - (t1 + t2) * p_ij) / (t1 * t2 + t2 * t2))

    divq = dv * ((-a1 * p_i_1) + (-a2 * p_j_1)
                 + ((a1 + a2 + a3 + a4) * p_ij)
                 + (-a3 * p_i1) + (-a4 * p_j1) + q / dv)
    acc = dv * a5 * (p_ij - p0)
    dom = divq + acc
    ibc = qwell * divq
    mbc_cell = q + dv * cfg.Sgi * cfg.phi * (invBg1 - invBg0) / (D * t1)
    return dom, ibc, tde, mbc_cell


def _kernel(p0p_ref, p1p_ref, kxp_ref, bgugp_ref, invBg0_ref, invBg1_ref,
            dinvBg0_ref, q_ref, qwell_ref, t_ref,
            dom_ref, ibc_ref, tde_ref, mbc_ref, *, cfg: StencilConfig):
    b = pl.program_id(0)
    t1 = t_ref[b, 0]
    t2 = t_ref[b, 1]
    dom, ibc, tde, mbc_cell = _residual_math(
        p0p_ref[0], p1p_ref[0], kxp_ref[0], bgugp_ref[0],
        invBg0_ref[0], invBg1_ref[0], dinvBg0_ref[0], q_ref[0], qwell_ref[:],
        t1, t2, cfg)
    dom_ref[0] = dom
    ibc_ref[0] = ibc
    tde_ref[0] = tde
    mbc_ref[b, 0] = -jnp.sum(mbc_cell)


def _pallas_forward(p0p, p1p, kxp, bgugp, invBg0, invBg1, dinvBg0, q, qwell,
                    tsteps, cfg: StencilConfig):
    B, Hp, Wp = p0p.shape
    H, W = Hp - 2, Wp - 2
    padded = pl.BlockSpec((1, Hp, Wp), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    center = pl.BlockSpec((1, H, W), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    shared = pl.BlockSpec((H, W), lambda b: (0, 0), memory_space=pltpu.VMEM)
    # SMEM blocks must cover the full array; the kernel indexes by program_id
    scal = pl.BlockSpec((B, 2), lambda b: (0, 0), memory_space=pltpu.SMEM)

    out = pl.pallas_call(
        functools.partial(_kernel, cfg=cfg),
        grid=(B,),
        interpret=jax.default_backend() == "cpu",  # Mosaic needs real TPU
        in_specs=[padded, padded, padded, padded, center, center, center, center,
                  shared, scal],
        out_specs=[center, center, center,
                   pl.BlockSpec((B, 1), lambda b: (0, 0), memory_space=pltpu.SMEM)],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, W), jnp.float32),
            jax.ShapeDtypeStruct((B, H, W), jnp.float32),
            jax.ShapeDtypeStruct((B, H, W), jnp.float32),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
        ],
    )(p0p, p1p, kxp, bgugp, invBg0, invBg1, dinvBg0, q, qwell, tsteps)
    dom, ibc, tde, mbc = out
    return dom, ibc, tde, mbc[:, 0]


def _jnp_forward(p0p, p1p, kxp, bgugp, invBg0, invBg1, dinvBg0, q, qwell,
                 tsteps, cfg: StencilConfig):
    """Numerically identical jnp path (reference + backward)."""
    def per_sample(p0p_, p1p_, kxp_, bgugp_, invBg0_, invBg1_, dinvBg0_, q_, t_):
        return _residual_math(p0p_, p1p_, kxp_, bgugp_, invBg0_, invBg1_,
                              dinvBg0_, q_, qwell, t_[0], t_[1], cfg)

    dom, ibc, tde, mbc_cell = jax.vmap(per_sample)(
        p0p, p1p, kxp, bgugp, invBg0, invBg1, dinvBg0, q, tsteps)
    return dom, ibc, tde, -jnp.sum(mbc_cell, axis=(1, 2))


# --------------------------------------------------------------------------
# 3D DG fused residual (7-point stencil; the 3D capability is beyond the
# 2D-only reference)
# --------------------------------------------------------------------------
def _center3(f):
    return f[1:-1, 1:-1, 1:-1]


def _shifts3(fp):
    """(ij, i1, i_1, j1, j_1, k1, k_1) slices of a padded (D+2, H+2, W+2)."""
    c = fp[1:-1, 1:-1, 1:-1]
    return (c, fp[1:-1, 1:-1, 2:], fp[1:-1, 1:-1, :-2],
            fp[1:-1, 2:, 1:-1], fp[1:-1, :-2, 1:-1],
            fp[2:, 1:-1, 1:-1], fp[:-2, 1:-1, 1:-1])


def _residual_math_3d(p0p, p1p, kxp, kzp, bgugp, invBg0, invBg1, dinvBg0, q,
                      qwell, t1, t2, cfg: StencilConfig):
    """DG 7-point residual on one sample's padded 3D fields.

    ``kzp`` must arrive PRE-SCALED by the vertical anisotropy (kv/kh) — the
    kernel applies no further scaling."""
    C, D = cfg.C, cfg.D
    dv = cfg.dx * cfg.dy * cfg.dz

    k = _shifts3(kxp)
    kz = _shifts3(kzp)
    kx_ih = 2.0 * k[1] * k[0] / (k[1] + k[0])
    kx_i_h = 2.0 * k[0] * k[2] / (k[0] + k[2])
    ky_jh = 2.0 * k[3] * k[0] / (k[3] + k[0])
    ky_j_h = 2.0 * k[0] * k[4] / (k[0] + k[4])
    kz_kh = 2.0 * kz[5] * kz[0] / (kz[5] + kz[0])
    kz_k_h = 2.0 * kz[0] * kz[6] / (kz[0] + kz[6])

    b = _shifts3(bgugp)
    b_ih = 0.5 * (b[1] + b[0])
    b_i_h = 0.5 * (b[0] + b[2])
    b_jh = 0.5 * (b[3] + b[0])
    b_j_h = 0.5 * (b[0] + b[4])
    b_kh = 0.5 * (b[5] + b[0])
    b_k_h = 0.5 * (b[0] + b[6])

    p = _shifts3(p1p)
    p0 = _center3(p0p)

    cf = 97.32e-6 / (1.0 + 55.8721 * cfg.phi**1.428586)
    cr0 = cfg.phi * cf * invBg0
    cp1 = cfg.Sgi * (cfg.phi * dinvBg0 + cr0)

    inv_dxx = 1.0 / (cfg.dx * cfg.dx)
    inv_dyy = 1.0 / (cfg.dy * cfg.dy)
    inv_dzz = 1.0 / (cfg.dz * cfg.dz)
    a1 = C * kx_i_h * cfg.krgo * b_i_h * inv_dxx
    a2 = C * ky_j_h * cfg.krgo * b_j_h * inv_dyy
    a3 = C * kx_ih * cfg.krgo * b_ih * inv_dxx
    a4 = C * ky_jh * cfg.krgo * b_jh * inv_dyy
    a5 = C * kz_k_h * cfg.krgo * b_k_h * inv_dzz
    a6 = C * kz_kh * cfg.krgo * b_kh * inv_dzz
    a_acc = (1.0 / D) * (cp1 / t1)

    p2 = (p[0] - p0) * (1.0 + t2 / jnp.maximum(t1, 1e-12)) + p0
    tde = (dv / D) * cp1 * (
        2.0 * EPSILON / t1
        + (t2 * p0 + t1 * p2 - (t1 + t2) * p[0]) / (t1 * t2 + t2 * t2))

    divq = dv * ((-a1 * p[2]) + (-a2 * p[4]) + (-a5 * p[6])
                 + ((a1 + a2 + a3 + a4 + a5 + a6) * p[0])
                 + (-a3 * p[1]) + (-a4 * p[3]) + (-a6 * p[5]) + q / dv)
    acc = dv * a_acc * (p[0] - p0)
    dom = divq + acc
    ibc = qwell * divq
    mbc_cell = q + dv * cfg.Sgi * cfg.phi * (invBg1 - invBg0) / (D * t1)
    return dom, ibc, tde, mbc_cell


def _kernel_3d(p0p_ref, p1p_ref, kxp_ref, kzp_ref, bgugp_ref, invBg0_ref,
               invBg1_ref, dinvBg0_ref, q_ref, qwell_ref, t_ref,
               dom_ref, ibc_ref, tde_ref, mbc_ref, *, cfg: StencilConfig):
    b = pl.program_id(0)
    t1 = t_ref[b, 0]
    t2 = t_ref[b, 1]
    dom, ibc, tde, mbc_cell = _residual_math_3d(
        p0p_ref[0], p1p_ref[0], kxp_ref[0], kzp_ref[0], bgugp_ref[0],
        invBg0_ref[0], invBg1_ref[0], dinvBg0_ref[0], q_ref[0], qwell_ref[:],
        t1, t2, cfg)
    dom_ref[0] = dom
    ibc_ref[0] = ibc
    tde_ref[0] = tde
    mbc_ref[b, 0] = -jnp.sum(mbc_cell)


def _pallas_forward_3d(p0p, p1p, kxp, kzp, bgugp, invBg0, invBg1, dinvBg0, q,
                       qwell, tsteps, cfg: StencilConfig):
    B, Dp, Hp, Wp = p0p.shape
    Dd, H, W = Dp - 2, Hp - 2, Wp - 2
    padded = pl.BlockSpec((1, Dp, Hp, Wp), lambda b: (b, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    center = pl.BlockSpec((1, Dd, H, W), lambda b: (b, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    shared = pl.BlockSpec((Dd, H, W), lambda b: (0, 0, 0), memory_space=pltpu.VMEM)
    scal = pl.BlockSpec((B, 2), lambda b: (0, 0), memory_space=pltpu.SMEM)

    out = pl.pallas_call(
        functools.partial(_kernel_3d, cfg=cfg),
        grid=(B,),
        interpret=jax.default_backend() == "cpu",
        in_specs=[padded, padded, padded, padded, padded, center, center,
                  center, center, shared, scal],
        out_specs=[center, center, center,
                   pl.BlockSpec((B, 1), lambda b: (0, 0), memory_space=pltpu.SMEM)],
        out_shape=[
            jax.ShapeDtypeStruct((B, Dd, H, W), jnp.float32),
            jax.ShapeDtypeStruct((B, Dd, H, W), jnp.float32),
            jax.ShapeDtypeStruct((B, Dd, H, W), jnp.float32),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
        ],
    )(p0p, p1p, kxp, kzp, bgugp, invBg0, invBg1, dinvBg0, q, qwell, tsteps)
    dom, ibc, tde, mbc = out
    return dom, ibc, tde, mbc[:, 0]


def _jnp_forward_3d(p0p, p1p, kxp, kzp, bgugp, invBg0, invBg1, dinvBg0, q,
                    qwell, tsteps, cfg: StencilConfig):
    def per_sample(a, b_, c, d, e, f, g, h, i, t):
        return _residual_math_3d(a, b_, c, d, e, f, g, h, i, qwell,
                                 t[0], t[1], cfg)

    dom, ibc, tde, mbc_cell = jax.vmap(per_sample)(
        p0p, p1p, kxp, kzp, bgugp, invBg0, invBg1, dinvBg0, q, tsteps)
    return dom, ibc, tde, -jnp.sum(mbc_cell, axis=(1, 2, 3))


@functools.partial(jax.custom_vjp, nondiff_argnums=(11,))
def dg3d_stencil_residual(p0p, p1p, kxp, kzp, bgugp, invBg0, invBg1, dinvBg0,
                          q, qwell, tsteps, cfg: StencilConfig):
    """Fused 3D DG residual: (dom, ibc, tde, mbc) from padded (B, D+2, H+2,
    W+2) / centered (B, D, H, W) fields. ``kzp`` arrives pre-scaled by the
    vertical anisotropy (kv/kh); the kernel applies no further scaling."""
    return _pallas_forward_3d(p0p, p1p, kxp, kzp, bgugp, invBg0, invBg1,
                              dinvBg0, q, qwell, tsteps, cfg)


def _fwd_3d(p0p, p1p, kxp, kzp, bgugp, invBg0, invBg1, dinvBg0, q, qwell,
            tsteps, cfg):
    out = _pallas_forward_3d(p0p, p1p, kxp, kzp, bgugp, invBg0, invBg1,
                             dinvBg0, q, qwell, tsteps, cfg)
    return out, (p0p, p1p, kxp, kzp, bgugp, invBg0, invBg1, dinvBg0, q, qwell,
                 tsteps)


def _bwd_3d(cfg, residuals, cotangents):
    _, vjp = jax.vjp(lambda *a: _jnp_forward_3d(*a, cfg), *residuals)
    return vjp(cotangents)


dg3d_stencil_residual.defvjp(_fwd_3d, _bwd_3d)


# --------------------------------------------------------------------------
# GC two-phase fused residual (the heavy kernel: 4-flux upstream math,
# ref physics_loss.py:319-693)
# --------------------------------------------------------------------------
class GCStencilConfig(NamedTuple):
    C: float
    D: float
    dx: float
    dy: float
    dz: float
    Swmin: float
    phi: float


def _upstream(kr, p):
    """Upstream-weighted face relperm on padded 2D fields."""
    kr_ij, kr_i1, kr_i_1, kr_j1, kr_j_1 = _shifts(kr)
    p_ij, p_i1, p_i_1, p_j1, p_j_1 = _shifts(p)
    ih = jnp.where(p_i1 - p_ij <= 0.0, kr_ij, kr_i1)
    i_h = jnp.where(p_ij - p_i_1 <= 0.0, kr_ij, kr_i_1)
    jh = jnp.where(p_j1 - p_ij <= 0.0, kr_ij, kr_j1)
    j_h = jnp.where(p_ij - p_j_1 <= 0.0, kr_ij, kr_j_1)
    return ih, i_h, jh, j_h


def _favg(fp):
    f_ij, f_i1, f_i_1, f_j1, f_j_1 = _shifts(fp)
    return (0.5 * (f_i1 + f_ij), 0.5 * (f_ij + f_i_1),
            0.5 * (f_j1 + f_ij), 0.5 * (f_ij + f_j_1))


def _residual_math_gc(p0, p1p, kxp, Sg0, Sg1, krgo1p, krog1p,
                      invBg0, invBo0, Rs0, Rv0, dinvBg0, dinvBo0, dRs0, dRv0,
                      invBg1p, invBo1p, invug1p, invuo1p, Rs1p, Rv1p,
                      qfg, qdg, qfo, qvo, qwell, t1, t2, cfg: GCStencilConfig):
    """GC residual on one sample's padded/centered 2D fields
    (mirrors PhysicsLoss._residuals_gc; shared by kernel + jnp/backward)."""
    C, D = cfg.C, cfg.D
    dv = cfg.dx * cfg.dy * cfg.dz
    phi = cfg.phi

    k_ij, k_i1, k_i_1, k_j1, k_j_1 = _shifts(kxp)
    kx_ih = 2.0 * k_i1 * k_ij / (k_i1 + k_ij)
    kx_i_h = 2.0 * k_ij * k_i_1 / (k_ij + k_i_1)
    ky_jh = 2.0 * k_j1 * k_ij / (k_j1 + k_ij)
    ky_j_h = 2.0 * k_ij * k_j_1 / (k_ij + k_j_1)
    kfaces = (kx_ih, kx_i_h, ky_jh, ky_j_h)

    p1 = _center(p1p)
    invBg1 = _center(invBg1p)
    invBo1 = _center(invBo1p)
    Rs1 = _center(Rs1p)
    Rv1 = _center(Rv1p)
    So0 = 1.0 - cfg.Swmin - Sg0
    So1 = 1.0 - cfg.Swmin - Sg1

    RsinvBo0, RvinvBg0 = Rs0 * invBo0, Rv0 * invBg0
    RsinvBo1, RvinvBg1 = Rs1 * invBo1, Rv1 * invBg1
    mg0 = phi * (invBg0 * Sg0 + RsinvBo0 * So0)
    mo0 = phi * (invBo0 * So0 + RvinvBg0 * Sg0)
    mg1 = phi * (invBg1 * Sg1 + RsinvBo1 * So1)
    mo1 = phi * (invBo1 * So1 + RvinvBg1 * Sg1)
    ratio = 1.0 + t2 / jnp.maximum(t1, 1e-12)
    mg2 = (mg1 - mg0) * ratio + mg0
    mo2 = (mo1 - mo0) * ratio + mo0

    rte = EPSILON * 0.25
    denom_t = t1 * t2 + t2 * t2
    trn_g = (dv / D) * (rte / t1 + (t2 * mg0 + t1 * mg2 - (t1 + t2) * mg1) / denom_t)
    trn_o = (dv / D) * (rte / t1 + (t2 * mo0 + t1 * mo2 - (t1 + t2) * mo1) / denom_t)

    kgo = _upstream(krgo1p, p1p)
    kog = _upstream(krog1p, p1p)
    bgug = _favg(invBg1p * invug1p)
    bouo = _favg(invBo1p * invuo1p)
    rvbgug = _favg(Rv1p * invBg1p * invug1p)
    rsbouo = _favg(Rs1p * invBo1p * invuo1p)

    dp = p1 - p0
    safe_dp = jnp.where(jnp.abs(dp) > 0, dp, 1.0)
    d_Sg = jnp.where(jnp.abs(dp) > 0, (Sg1 - Sg0) / safe_dp, 0.0)
    d_So = jnp.where(jnp.abs(dp) > 0, (So1 - So0) / safe_dp, 0.0)

    d_RsinvBo = Rs0 * dinvBo0 + invBo0 * dRs0
    d_RvinvBg = Rv0 * dinvBg0 + invBg0 * dRv0

    cf = 97.32e-6 / (1.0 + 55.8721 * phi**1.428586)
    cprgg = phi * cf * invBg0
    cprgo = phi * cf * RsinvBo0
    cproo = phi * cf * invBo0
    cprog = phi * cf * RvinvBg0

    inv_dxx = 1.0 / (cfg.dx * cfg.dx)
    inv_dyy = 1.0 / (cfg.dy * cfg.dy)
    inv_d = (inv_dxx, inv_dxx, inv_dyy, inv_dyy)

    def trans(kr_faces, prop_faces):
        return tuple(C * kf * kr * pr * iv
                     for kf, kr, pr, iv in zip(kfaces, kr_faces, prop_faces, inv_d))

    agg = trans(kgo, bgug)
    ago = trans(kog, rsbouo)
    aoo = trans(kog, bouo)
    aog = trans(kgo, rvbgug)

    inv_Dt = 1.0 / (D * t1)
    cpgg = inv_Dt * (phi * invBg1 * d_Sg + Sg0 * (phi * dinvBg0 + cprgg)) * dp
    cpgo = inv_Dt * (phi * RsinvBo1 * d_So + So0 * (phi * d_RsinvBo + cprgo)) * dp
    cpoo = inv_Dt * (phi * invBo1 * d_So + So0 * (phi * dinvBo0 + cproo)) * dp
    cpog = inv_Dt * (phi * RvinvBg1 * d_Sg + Sg0 * (phi * d_RvinvBg + cprog)) * dp

    p_ij, p_i1, p_i_1, p_j1, p_j_1 = _shifts(p1p)

    def div(a, q):
        a_ih, a_i_h, a_jh, a_j_h = a
        return dv * ((-a_i_h * p_i_1) + (-a_j_h * p_j_1)
                     + ((a_i_h + a_j_h + a_ih + a_jh) * p_ij)
                     + (-a_ih * p_i1) + (-a_jh * p_j1) + q / dv)

    divq_gg = div(agg, qfg)
    divq_go = div(ago, qdg)
    divq_oo = div(aoo, qfo)
    divq_og = div(aog, qvo)

    dom_g = (divq_gg + dv * cpgg) + (divq_go + dv * cpgo)
    dom_o = (divq_oo + dv * cpoo) + (divq_og + dv * cpog)
    ibc = qwell * ((divq_gg + divq_go) + (divq_oo + divq_og))

    mbc_g_cell = (qfg + qdg) + dv * inv_Dt * phi * (
        (Sg1 * invBg1 - Sg0 * invBg0) + (So1 * RsinvBo1 - So0 * RsinvBo0))
    mbc_o_cell = (qfo + qvo) + dv * inv_Dt * phi * (
        (So1 * invBo1 - So0 * invBo0) + (Sg1 * RvinvBg1 - Sg0 * RvinvBg0))
    return dom_g, dom_o, ibc, trn_g, trn_o, mbc_g_cell, mbc_o_cell


_GC_ARGS =("p0", "p1p", "kxp", "Sg0", "Sg1", "krgo1p", "krog1p",
            "invBg0", "invBo0", "Rs0", "Rv0", "dinvBg0", "dinvBo0", "dRs0",
            "dRv0", "invBg1p", "invBo1p", "invug1p", "invuo1p", "Rs1p", "Rv1p",
            "qfg", "qdg", "qfo", "qvo")
_GC_PADDED_NAMES = {"p1p", "kxp", "krgo1p", "krog1p", "invBg1p", "invBo1p",
                    "invug1p", "invuo1p", "Rs1p", "Rv1p"}


def _gc_kernel(*refs, cfg: GCStencilConfig):
    field_refs = refs[:len(_GC_ARGS)]
    qwell_ref, t_ref = refs[len(_GC_ARGS)], refs[len(_GC_ARGS) + 1]
    (dom_g_ref, dom_o_ref, ibc_ref, trn_g_ref, trn_o_ref,
     mbc_g_ref, mbc_o_ref) = refs[len(_GC_ARGS) + 2:]
    b = pl.program_id(0)
    fields = [r[0] for r in field_refs]
    t1 = t_ref[b, 0]
    t2 = t_ref[b, 1]
    dom_g, dom_o, ibc, trn_g, trn_o, mbc_g_cell, mbc_o_cell = _residual_math_gc(
        *fields, qwell_ref[:], t1, t2, cfg)
    dom_g_ref[0] = dom_g
    dom_o_ref[0] = dom_o
    ibc_ref[0] = ibc
    trn_g_ref[0] = trn_g
    trn_o_ref[0] = trn_o
    mbc_g_ref[b, 0] = -jnp.sum(mbc_g_cell)
    mbc_o_ref[b, 0] = -jnp.sum(mbc_o_cell)


def _gc_pallas_forward(fields, qwell, tsteps, cfg: GCStencilConfig):
    B, Hp, Wp = fields[1].shape          # p1p is padded
    H, W = Hp - 2, Wp - 2
    padded = pl.BlockSpec((1, Hp, Wp), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    center = pl.BlockSpec((1, H, W), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    shared = pl.BlockSpec((H, W), lambda b: (0, 0), memory_space=pltpu.VMEM)
    scal = pl.BlockSpec((B, 2), lambda b: (0, 0), memory_space=pltpu.SMEM)
    mbc_spec = pl.BlockSpec((B, 1), lambda b: (0, 0), memory_space=pltpu.SMEM)

    in_specs = [padded if name in _GC_PADDED_NAMES else center
                for name in _GC_ARGS] + [shared, scal]
    out = pl.pallas_call(
        functools.partial(_gc_kernel, cfg=cfg),
        grid=(B,),
        interpret=jax.default_backend() == "cpu",
        in_specs=in_specs,
        out_specs=[center] * 5 + [mbc_spec, mbc_spec],
        out_shape=[jax.ShapeDtypeStruct((B, H, W), jnp.float32)] * 5
        + [jax.ShapeDtypeStruct((B, 1), jnp.float32)] * 2,
    )(*fields, qwell, tsteps)
    dom_g, dom_o, ibc, trn_g, trn_o, mbc_g, mbc_o = out
    return dom_g, dom_o, ibc, trn_g, trn_o, mbc_g[:, 0], mbc_o[:, 0]


def _gc_jnp_forward(fields, qwell, tsteps, cfg: GCStencilConfig):
    def per_sample(args, t):
        return _residual_math_gc(*args, qwell, t[0], t[1], cfg)

    out = jax.vmap(per_sample)(tuple(fields), tsteps)
    dom_g, dom_o, ibc, trn_g, trn_o, mbc_g_cell, mbc_o_cell = out
    return (dom_g, dom_o, ibc, trn_g, trn_o,
            -jnp.sum(mbc_g_cell, axis=(1, 2)), -jnp.sum(mbc_o_cell, axis=(1, 2)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def gc_stencil_residual(fields, qwell, tsteps, cfg: GCStencilConfig):
    """Fused GC two-phase residual.

    ``fields`` — tuple in ``_GC_ARGS`` order: padded (B, H+2, W+2) fields for
    names ending in ``p``, centered (B, H, W) otherwise. Returns
    (dom_g, dom_o, ibc, trn_g, trn_o, mbc_g, mbc_o).
    """
    return _gc_pallas_forward(fields, qwell, tsteps, cfg)


def _gc_fwd(fields, qwell, tsteps, cfg):
    return _gc_pallas_forward(fields, qwell, tsteps, cfg), (fields, qwell, tsteps)


def _gc_bwd(cfg, residuals, cotangents):
    fields, qwell, tsteps = residuals
    _, vjp = jax.vjp(lambda f, q, t: _gc_jnp_forward(f, q, t, cfg),
                     fields, qwell, tsteps)
    return vjp(cotangents)


gc_stencil_residual.defvjp(_gc_fwd, _gc_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(10,))
def dg_stencil_residual(p0p, p1p, kxp, bgugp, invBg0, invBg1, dinvBg0, q, qwell,
                        tsteps, cfg: StencilConfig):
    """Fused DG residual: (dom, ibc, tde, mbc) from padded/centered fields.

    Args (B = batch, H/W = grid):
      p0p, p1p      (B, H+2, W+2) symmetric-padded pressures at n0/n1
      kxp           (B, H+2, W+2) padded permeability (mD)
      bgugp         (B, H+2, W+2) padded invBg·invug at n1
      invBg0/1      (B, H, W)     center 1/Bg at n0/n1
      dinvBg0       (B, H, W)     d(1/Bg)/dP at n0
      q             (B, H, W)     well rates at n1
      qwell         (H, W)        well-cell indicator
      tsteps        (B, 2)        per-sample (Δt1, Δt2)
    """
    return _pallas_forward(p0p, p1p, kxp, bgugp, invBg0, invBg1, dinvBg0, q,
                           qwell, tsteps, cfg)


def _fwd(p0p, p1p, kxp, bgugp, invBg0, invBg1, dinvBg0, q, qwell, tsteps, cfg):
    out = _pallas_forward(p0p, p1p, kxp, bgugp, invBg0, invBg1, dinvBg0, q,
                          qwell, tsteps, cfg)
    return out, (p0p, p1p, kxp, bgugp, invBg0, invBg1, dinvBg0, q, qwell, tsteps)


def _bwd(cfg, residuals, cotangents):
    args = residuals
    _, vjp = jax.vjp(lambda *a: _jnp_forward(*a, cfg), *args)
    return vjp(cotangents)


dg_stencil_residual.defvjp(_fwd, _bwd)
