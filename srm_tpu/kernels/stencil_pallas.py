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
