"""Finite-volume stencil primitives for the reservoir PDE residual.

Vectorized (B, H, W) formulations of the index gymnastics in the reference's
physics loss (``/root/reference/physics_loss.py:18-61, 131-176``): symmetric
ghost-cell padding, harmonic-mean inter-block transmissibilities, arithmetic
face averages, upstream-weighted face values, and the 5-point
divergence+accumulation assembly.

These are pure jnp ops that XLA fuses into the surrounding loss program; the
``srm_tpu.kernels`` package provides a Pallas-fused version of the full
residual for the hot path.

Convention: i indexes the LAST axis (x / width), j the second-to-last
(y / height), matching the reference's ``[..., j, i, :]`` slicing.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax.numpy as jnp

Array = jnp.ndarray


def pad_symmetric(f: Array) -> Array:
    """Symmetric ghost cells on the last two axes (ref :18-21)."""
    pad = [(0, 0)] * (f.ndim - 2) + [(1, 1), (1, 1)]
    return jnp.pad(f, pad, mode="symmetric")


class Neighbors(NamedTuple):
    """Center and 4-neighborhood of a padded (.., H+2, W+2) field."""
    ij: Array
    i1: Array    # i+1 (east)
    i_1: Array   # i-1 (west)
    j1: Array    # j+1 (south in array terms)
    j_1: Array   # j-1


def neighbors(fp: Array) -> Neighbors:
    """Slice the 5-point neighborhood out of a padded field (ref :33-35)."""
    return Neighbors(
        ij=fp[..., 1:-1, 1:-1],
        i1=fp[..., 1:-1, 2:],
        i_1=fp[..., 1:-1, :-2],
        j1=fp[..., 2:, 1:-1],
        j_1=fp[..., :-2, 1:-1],
    )


def harmonic_faces(k: Neighbors) -> Tuple[Array, Array, Array, Array]:
    """Harmonic-mean inter-block permeability at the four faces
    (ref :59-60): (kx_ih, kx_i_h, ky_jh, ky_j_h)."""
    kx_ih = 2.0 * k.i1 * k.ij / (k.i1 + k.ij)
    kx_i_h = 2.0 * k.ij * k.i_1 / (k.ij + k.i_1)
    ky_jh = 2.0 * k.j1 * k.ij / (k.j1 + k.ij)
    ky_j_h = 2.0 * k.ij * k.j_1 / (k.ij + k.j_1)
    return kx_ih, kx_i_h, ky_jh, ky_j_h


def average_faces(f: Neighbors) -> Tuple[Array, Array, Array, Array]:
    """Arithmetic face averages (fluid-property weighting, ref :147-148)."""
    return (0.5 * (f.i1 + f.ij), 0.5 * (f.ij + f.i_1),
            0.5 * (f.j1 + f.ij), 0.5 * (f.ij + f.j_1))


def upstream_faces(kr: Neighbors, pot: Neighbors) -> Tuple[Array, Array, Array, Array]:
    """Upstream-weighted face relperm from potential differences
    (ref :537-551): a face takes the neighbor's value when flow is inward
    (neighbor potential higher)."""
    pot_i1 = pot.i1 - pot.ij
    pot_i_1 = pot.ij - pot.i_1
    pot_j1 = pot.j1 - pot.ij
    pot_j_1 = pot.ij - pot.j_1
    kr_ih = jnp.where(pot_i1 <= 0.0, kr.ij, kr.i1)
    kr_i_h = jnp.where(pot_i_1 <= 0.0, kr.ij, kr.i_1)
    kr_jh = jnp.where(pot_j1 <= 0.0, kr.ij, kr.j1)
    kr_j_h = jnp.where(pot_j_1 <= 0.0, kr.ij, kr.j_1)
    return kr_ih, kr_i_h, kr_jh, kr_j_h


def five_point_divergence(a_ih: Array, a_i_h: Array, a_jh: Array, a_j_h: Array,
                          p: Neighbors, q_over_dv: Array, dv: Array) -> Array:
    """dv · (−a_i_h·p_{i−1} − a_j_h·p_{j−1} + Σa·p_ij − a_ih·p_{i+1}
    − a_jh·p_{j+1} + q/dv) — the divergence residual (ref :174)."""
    return dv * ((-a_i_h * p.i_1) + (-a_j_h * p.j_1)
                 + ((a_i_h + a_j_h + a_ih + a_jh) * p.ij)
                 + (-a_ih * p.i1) + (-a_jh * p.j1) + q_over_dv)


# --------------------------------------------------------------------------
# 3D (7-point) extension — NEW capability beyond the reference, whose residual
# is 2D-only ("1D model adapted to 2D", physics_loss.py:10). Adds z-direction
# fluxes for Nz > 1 grids; k indexes the third-from-last axis (depth).
# --------------------------------------------------------------------------
class Neighbors3D(NamedTuple):
    ij: Array
    i1: Array
    i_1: Array
    j1: Array
    j_1: Array
    k1: Array    # k+1 (down)
    k_1: Array   # k-1 (up)


def pad_symmetric_3d(f: Array) -> Array:
    """Symmetric ghost cells on the last three axes."""
    pad = [(0, 0)] * (f.ndim - 3) + [(1, 1), (1, 1), (1, 1)]
    return jnp.pad(f, pad, mode="symmetric")


def neighbors_3d(fp: Array) -> Neighbors3D:
    c = fp[..., 1:-1, 1:-1, 1:-1]
    return Neighbors3D(
        ij=c,
        i1=fp[..., 1:-1, 1:-1, 2:],
        i_1=fp[..., 1:-1, 1:-1, :-2],
        j1=fp[..., 1:-1, 2:, 1:-1],
        j_1=fp[..., 1:-1, :-2, 1:-1],
        k1=fp[..., 2:, 1:-1, 1:-1],
        k_1=fp[..., :-2, 1:-1, 1:-1],
    )


def harmonic_faces_3d(k: Neighbors3D, kz: Neighbors3D):
    """Harmonic-mean permeability at the six faces; z faces use the vertical
    permeability field ``kz``."""
    kx_ih = 2.0 * k.i1 * k.ij / (k.i1 + k.ij)
    kx_i_h = 2.0 * k.ij * k.i_1 / (k.ij + k.i_1)
    ky_jh = 2.0 * k.j1 * k.ij / (k.j1 + k.ij)
    ky_j_h = 2.0 * k.ij * k.j_1 / (k.ij + k.j_1)
    kz_kh = 2.0 * kz.k1 * kz.ij / (kz.k1 + kz.ij)
    kz_k_h = 2.0 * kz.ij * kz.k_1 / (kz.ij + kz.k_1)
    return kx_ih, kx_i_h, ky_jh, ky_j_h, kz_kh, kz_k_h


def upstream_faces_3d(kr: Neighbors3D, pot: Neighbors3D):
    """Upstream-weighted face relperm from potential differences at the six
    faces (3D extension of ``upstream_faces``; ref :537-551)."""
    kr_ih = jnp.where(pot.i1 - pot.ij <= 0.0, kr.ij, kr.i1)
    kr_i_h = jnp.where(pot.ij - pot.i_1 <= 0.0, kr.ij, kr.i_1)
    kr_jh = jnp.where(pot.j1 - pot.ij <= 0.0, kr.ij, kr.j1)
    kr_j_h = jnp.where(pot.ij - pot.j_1 <= 0.0, kr.ij, kr.j_1)
    kr_kh = jnp.where(pot.k1 - pot.ij <= 0.0, kr.ij, kr.k1)
    kr_k_h = jnp.where(pot.ij - pot.k_1 <= 0.0, kr.ij, kr.k_1)
    return kr_ih, kr_i_h, kr_jh, kr_j_h, kr_kh, kr_k_h


def average_faces_3d(f: Neighbors3D):
    return (0.5 * (f.i1 + f.ij), 0.5 * (f.ij + f.i_1),
            0.5 * (f.j1 + f.ij), 0.5 * (f.ij + f.j_1),
            0.5 * (f.k1 + f.ij), 0.5 * (f.ij + f.k_1))


def seven_point_divergence(a_ih, a_i_h, a_jh, a_j_h, a_kh, a_k_h,
                           p: Neighbors3D, q_over_dv: Array, dv: Array) -> Array:
    return dv * ((-a_i_h * p.i_1) + (-a_j_h * p.j_1) + (-a_k_h * p.k_1)
                 + ((a_i_h + a_j_h + a_k_h + a_ih + a_jh + a_kh) * p.ij)
                 + (-a_ih * p.i1) + (-a_jh * p.j1) + (-a_kh * p.k1) + q_over_dv)
