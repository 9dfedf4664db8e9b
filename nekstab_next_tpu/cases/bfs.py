"""Backward-facing-step case — the reference's quantitative regression
fixture (examples/back_fstep: Re=500 transient growth vs Barkley, Blackburn
& Sherwin 2008 fig. 5, digitized in barkley2008_fig5.ref).

Geometry (Barkley et al. 2008): step height h = 1, inflow channel height 1
(y in [0, 1], x < 0), downstream channel height 2 (y in [-1, 1]), expansion
ratio 2.  Parabolic inflow with peak velocity 1; Re = U_peak h / nu."""

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


@dataclasses.dataclass
class BackwardFacingStepCase:
    reynolds: float = 500.0
    inflow_length: float = 10.0
    outflow_length: float = 50.0
    order: int = 6
    elems_upstream: int = 8
    elems_downstream: int = 40
    elems_y: int = 8  # over the full height [-1, 1]
    dt: Optional[float] = None
    target_cfl: float = 0.5
    solver: SolverConfig = SolverConfig()

    def __post_init__(self):
        nx = self.elems_upstream + self.elems_downstream
        # x-breakpoints: uniform upstream, mildly stretched downstream
        bx = np.concatenate([
            np.linspace(-self.inflow_length, 0.0, self.elems_upstream + 1)[:-1],
            np.linspace(0.0, self.outflow_length, self.elems_downstream + 1),
        ])
        self.mesh = box_mesh_2d(
            nx,
            self.elems_y,
            order=self.order,
            x0=-self.inflow_length,
            x1=self.outflow_length,
            y0=-1.0,
            y1=1.0,
            bc={
                "left": BC.DIRICHLET,
                "right": BC.OUTFLOW,
                "bottom": BC.WALL,
                "top": BC.WALL,
            },
            grading_x=bx,
            mask=lambda xc, yc: xc < 0.0 and yc < 0.0,  # carve the step
            mask_bc=BC.WALL,
        )
        m = self.mesh
        self.sem = SEM(m)

        # parabolic inflow u(y) = 4 y (1-y) on the upper channel
        ubc = np.zeros(m.x.shape + (2,))
        inflow = m.dirichlet_nodes & np.isclose(m.x, -self.inflow_length)
        yv = m.y
        ubc[..., 0] = np.where(inflow, np.clip(4.0 * yv * (1.0 - yv), 0.0, None), 0.0)
        self.u_bc = jnp.asarray(ubc)

        if self.dt is None:
            self.dt = float(self.target_cfl * m.min_spacing() / 1.5)

    def make_ns(self) -> NavierStokes:
        return NavierStokes(
            self.sem,
            viscosity=1.0 / self.reynolds,
            dt=self.dt,
            u_bc=self.u_bc,
            solver=self.solver,
        )

    def initial_flow(self) -> jnp.ndarray:
        """Smooth initial condition: inflow profile extended downstream
        (upper-channel profile relaxing to the full-height parabola)."""
        m = self.mesh
        y = m.y
        up = np.clip(4.0 * y * (1.0 - y), 0.0, None)  # upstream profile
        dn = np.clip((1.0 + y) * (1.0 - y), 0.0, None)  # full-height profile
        w = 0.5 * (1.0 + np.tanh(2.0 * m.x))  # blend across the step
        u = (1.0 - w) * up + w * dn
        vel = np.stack([u, np.zeros_like(u)], axis=-1)
        return jnp.asarray(vel) * self.sem.vmask + self.u_bc
