"""Perturbation kinetic-energy budget (reference ``stability_energy_budget``,
core/postproc.f90:649-759, with ``compute_production`` :801-836 and
``compute_dissipation`` :761-799).

For a complex eigenmode u' = uRe + i uIm around a base flow U:

* production terms (9 fields, 3 per base-velocity component):
      P_ab = -1/2 Re(u'_a conj(u'_b)) dU_a/dx_b
  (the reference enumerates them component-by-component; we return the full
  (..., ndim, ndim) tensor plus its integrals),
* dissipation:
      D = 1/2 nu Re(conj(u') . Laplacian(u'))
  with the Laplacian evaluated as repeated C0-smoothed gradients, exactly the
  reference's ``compute_laplacian`` (gradm1 + dsavg twice).

The budget identity sigma ~ (sum P - |D|) / (2 E) is the growth-rate check the
reference prints per mode into ``PKE_*`` files."""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp

from .vortex import velocity_gradient


@dataclasses.dataclass
class EnergyBudget:
    production: jnp.ndarray  # (nelem, n, n, ndim, ndim) pointwise P_ab
    dissipation: jnp.ndarray  # (nelem, n, n) pointwise D
    production_integrals: jnp.ndarray  # (ndim, ndim)
    dissipation_integral: jnp.ndarray  # ()

    @property
    def total_production(self):
        return jnp.sum(self.production_integrals)

    @property
    def net(self):
        """sum of production integrals minus dissipation (the last two lines
        of the reference's PKE_* files)."""
        return self.total_production - self.dissipation_integral


def _laplacian(sem, f: jnp.ndarray) -> jnp.ndarray:
    """Repeated smoothed gradients (reference compute_laplacian)."""
    gx, gy = sem.grad(f)
    gx, gy = sem.dsavg(gx), sem.dsavg(gy)
    gxx, _ = sem.grad(gx)
    _, gyy = sem.grad(gy)
    return sem.dsavg(gxx) + sem.dsavg(gyy)


def energy_budget(
    sem,
    base_u: jnp.ndarray,
    mode_re: jnp.ndarray,
    mode_im: jnp.ndarray,
    viscosity: float,
    normalize: bool = True,
) -> EnergyBudget:
    """Production + dissipation of one complex mode (2-D or 3-D layout)."""
    if normalize:
        # unit energy-norm of the complex pair (reference :703-709)
        e = jnp.sqrt(
            sum(
                sem.inner(mode_re[..., d], mode_re[..., d])
                + sem.inner(mode_im[..., d], mode_im[..., d])
                for d in range(mode_re.shape[-1])
            )
        )
        mode_re = mode_re / e
        mode_im = mode_im / e

    ndim = base_u.shape[-1]
    GU = velocity_gradient(sem, base_u)  # dU_a/dx_b
    # Re(u'_a conj(u'_b))
    uu = jnp.einsum("...a,...b->...ab", mode_re, mode_re) + jnp.einsum(
        "...a,...b->...ab", mode_im, mode_im
    )
    prod = -0.5 * uu * GU

    diss = jnp.zeros(base_u.shape[:-1], dtype=base_u.dtype)
    for d in range(ndim):
        diss = diss + (
            mode_re[..., d] * _laplacian(sem, mode_re[..., d])
            + mode_im[..., d] * _laplacian(sem, mode_im[..., d])
        )
    diss = 0.5 * viscosity * diss

    pint = jnp.stack(
        [
            jnp.stack([sem.glsum(sem.bm * prod[..., a, b]) for b in range(ndim)])
            for a in range(ndim)
        ]
    )
    dint = sem.glsum(sem.bm * diss)
    return EnergyBudget(
        production=prod,
        dissipation=diss,
        production_integrals=pint,
        dissipation_integral=dint,
    )
