"""Corey relative-permeability model (gas/oil SCAL).

TPU-native redesign of the reference ``RelativePermeability``
(``/root/reference/relative_permeability.py:12-126``): pure jittable
functions over a static parameter bundle. Forward curves with endpoint
scaling, max-liquid-dropout clamps and upstream-safe bounding; the inverse
(Sg from a krg/kro ratio) is a fixed-iteration bisection under
``lax.fori_loop`` (compiler-friendly: static trip count instead of the
reference's tolerance-driven ``tf.while_loop``; 60 iterations ≈ 2^-60
interval, far below float32 resolution).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray

_DEFAULT_END_POINTS = {
    "kro_Somax": 0.90, "krg_Sorg": 0.80, "krg_Swmin": 0.90,
    "Swmin": 0.22, "Sorg": 0.2, "Sgc": 0.05, "Socr": 0.2, "So_max": 0.28,
}
_DEFAULT_COREY = {"nog": 3.0, "ng": 6.0, "nw": 2.0}


@jax.tree_util.register_static
@dataclass(frozen=True)
class RelativePermeability:
    """Static Corey SCAL parameter bundle; methods are jit-safe."""

    kro_somax: float = _DEFAULT_END_POINTS["kro_Somax"]
    krg_sorg: float = _DEFAULT_END_POINTS["krg_Sorg"]
    krg_swmin: float = _DEFAULT_END_POINTS["krg_Swmin"]
    swmin: float = _DEFAULT_END_POINTS["Swmin"]
    sorg: float = _DEFAULT_END_POINTS["Sorg"]
    sgc: float = _DEFAULT_END_POINTS["Sgc"]
    socr: float = _DEFAULT_END_POINTS["Socr"]
    so_max_frac: float = _DEFAULT_END_POINTS["So_max"]
    nog: float = _DEFAULT_COREY["nog"]
    ng: float = _DEFAULT_COREY["ng"]
    nw: float = _DEFAULT_COREY["nw"]

    @classmethod
    def from_config(cls, end_points: Optional[Dict] = None,
                    corey_exponents: Optional[Dict] = None) -> "RelativePermeability":
        ep = {**_DEFAULT_END_POINTS, **(end_points or {})}
        ce = {**_DEFAULT_COREY, **(corey_exponents or {})}
        return cls(kro_somax=ep["kro_Somax"], krg_sorg=ep["krg_Sorg"],
                   krg_swmin=ep["krg_Swmin"], swmin=ep["Swmin"], sorg=ep["Sorg"],
                   sgc=ep["Sgc"], socr=ep["Socr"], so_max_frac=ep["So_max"],
                   nog=ce["nog"], ng=ce["ng"], nw=ce["nw"])

    @property
    def so_max(self) -> float:
        # reference scales So_max by movable range (relative_permeability.py:39)
        return self.so_max_frac * (1.0 - self.swmin)

    @property
    def sg_max(self) -> float:
        return 1.0 - self.swmin

    def compute_krog_krgo(self, sg: Array) -> Tuple[Array, Array]:
        """(krog, krgo) Corey curves (ref relative_permeability.py:48-75)."""
        so = 1.0 - sg - self.swmin
        denom = 1.0 - self.swmin - self.sorg
        krog = self.kro_somax * jnp.power(jnp.maximum((so - self.sorg) / denom, 0.0), self.nog)
        krgo = self.krg_sorg * jnp.power(
            jnp.maximum((sg - self.sgc) / (1.0 - self.sgc - self.swmin - self.sorg), 0.0), self.ng)

        sorg_eff = max(self.sorg, self.socr)
        krog = jnp.where(so <= (self.swmin + sorg_eff), jnp.zeros_like(krog), krog)
        krgo = jnp.where(sg > (1.0 - (self.swmin + self.sorg)),
                         jnp.full_like(krgo, self.krg_swmin), krgo)
        krog = jnp.clip(krog, 0.0, self.kro_somax)
        krgo = jnp.clip(krgo, 0.0, self.krg_swmin)
        return krog, krgo

    def __call__(self, sg: Array) -> Tuple[Array, Array]:
        return self.compute_krog_krgo(sg)

    def compute_sg(self, krg_kro: Array, n_iter: int = 60) -> Array:
        """Invert krgo/krog = target by bisection (ref :77-126).

        Fixed trip count under ``lax.fori_loop`` — no data-dependent control
        flow, so this composes with jit/vmap/grad and maps cleanly to TPU.
        """
        lo = jnp.full_like(krg_kro, self.sgc)
        hi = jnp.full_like(krg_kro, self.sg_max)

        def body(_, carry):
            lo, hi = carry
            mid = 0.5 * (lo + hi)
            krog, krgo = self.compute_krog_krgo(mid)
            ratio = krgo / jnp.where(krog > 0.0, krog, 1e-10)
            too_high = ratio > krg_kro
            return jnp.where(too_high, lo, mid), jnp.where(too_high, mid, hi)

        lo, hi = jax.lax.fori_loop(0, n_iter, body, (lo, hi))
        return jnp.clip(0.5 * (lo + hi), self.sgc, self.sg_max)
