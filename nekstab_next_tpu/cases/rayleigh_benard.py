"""Rayleigh-Benard convection case — thermal (Boussinesq) instability.

Exercises the framework's temperature/passive-scalar capability (the
reference's heat solver + ``ifto`` machinery carried in its ``krylov_vector``
temperature block, core/krylov_subspace.f90:12-17, core/nek_vectors.f90:
209-362).  Nondimensionalization on the layer depth d and thermal diffusion
time d^2/kappa:

    du/dt + u.grad u = -grad p + Pr lap u + Ra Pr theta e_y
    dtheta/dt + u.grad theta = lap theta

Base state: u = 0, T = 1 - y (conduction).  With free-slip walls and
periodic x the linear problem is exactly solvable (Rayleigh 1916): normal
modes w ~ sin(pi y) exp(i k x + sigma t) obey

    (sigma + Pr q^2)(sigma + q^2) = Ra Pr k^2 / q^2,   q^2 = k^2 + pi^2,

with neutral curve Ra_c(k) = q^6/k^2, minimized at k_c = pi/sqrt(2):
Ra_c = 27 pi^4 / 4 ~ 657.51.  This gives a machine-checkable growth rate for
the coupled linearized operator (tests/test_scalars.py).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..config import SolverConfig
from ..mesh.box import box_mesh_2d
from ..mesh.mesh import BoundaryCondition as BC
from ..ops.core import SEM
from ..stepper.navier_stokes import NavierStokes


def growth_rate_freeslip(Ra: float, Pr: float, k: float) -> float:
    """Exact leading growth rate of the free-slip RB normal mode (n=1)."""
    q2 = k * k + np.pi**2
    # sigma^2 + (1+Pr) q^2 sigma + Pr (q^4 - Ra k^2 / q^2) = 0
    b = (1.0 + Pr) * q2
    c = Pr * (q2 * q2 - Ra * k * k / q2)
    disc = b * b - 4.0 * c
    return float((-b + np.sqrt(disc)) / 2.0)


RA_CRITICAL = 27.0 * np.pi**4 / 4.0  # ~657.511
K_CRITICAL = np.pi / np.sqrt(2.0)


@dataclasses.dataclass
class RayleighBenardCase:
    """Free-slip (stress-free) RB layer, one critical wavelength wide."""

    rayleigh: float = 2000.0
    prandtl: float = 1.0
    nx: int = 4
    ny: int = 2
    order: int = 6
    wavenumber: float = K_CRITICAL  # domain width = 2 pi / k
    dt: float = 2.5e-3
    solver: SolverConfig = SolverConfig()

    def __post_init__(self):
        width = 2.0 * np.pi / self.wavenumber
        self.mesh = box_mesh_2d(
            self.nx, self.ny, order=self.order,
            x0=0.0, x1=width, y0=0.0, y1=1.0,
            periodic_x=True,
            bc={"bottom": BC.SYMMETRY, "top": BC.SYMMETRY},
        )
        m = self.mesh
        self.sem = SEM(m)
        # temperature Dirichlet at the free-slip walls (the box builder only
        # zeroes tmask at WALL/DIRICHLET edges, mesh/mesh.py:202-203)
        wall = (np.abs(m.y) < 1e-12) | (np.abs(m.y - 1.0) < 1e-12)
        tmask = np.asarray(self.sem.tmask) * (~wall)
        self.sem.tmask = jnp.asarray(tmask, dtype=self.sem.dtype)

        # conduction base state and its Dirichlet data (hot bottom T=1)
        self.base_T = jnp.asarray((1.0 - m.y)[..., None], dtype=self.sem.dtype)
        self.t_bc = self.base_T
        self.base_u = jnp.zeros(m.x.shape + (2,), dtype=self.sem.dtype)

    def make_ns(self) -> NavierStokes:
        RaPr = self.rayleigh * self.prandtl

        def buoyancy(T):
            z = jnp.zeros_like(T[..., 0])
            return jnp.stack([z, RaPr * T[..., 0]], axis=-1)

        return NavierStokes(
            self.sem,
            viscosity=self.prandtl,
            dt=self.dt,
            solver=self.solver,
            scalar_diff=(1.0,),
            t_bc=self.t_bc,
            buoyancy=buoyancy,
        )

    def exact_growth_rate(self) -> float:
        return growth_rate_freeslip(self.rayleigh, self.prandtl, self.wavenumber)
