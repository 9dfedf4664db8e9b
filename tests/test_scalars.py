"""Temperature / passive-scalar transport and Boussinesq coupling.

Validates the thermal capability against exact solutions:

* advection-diffusion of a Fourier mode in a uniform flow (exact decay +
  translation);
* coupled adjoint consistency <M q, w> = <q, M* w> in the energy product,
  machine precision by construction (jax.linear_transpose);
* Rayleigh-Benard free-slip growth rate vs the exact dispersion relation
  (sigma + Pr q^2)(sigma + q^2) = Ra Pr k^2/q^2 (Rayleigh 1916) — the
  classical thermal-instability benchmark for the coupled linearized
  operator (the reference carries temperature in its krylov_vector,
  core/krylov_subspace.f90:12-17, but ships no thermal example; this is the
  analytic acceptance test for that capability).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nekstab_next_tpu.cases.rayleigh_benard import RayleighBenardCase
from nekstab_next_tpu.mesh.box import box_mesh_2d
from nekstab_next_tpu.ops.core import SEM
from nekstab_next_tpu.stepper.linearized import LinearizedOperator
from nekstab_next_tpu.stepper.navier_stokes import NavierStokes
from nekstab_next_tpu.stepper.state import initial_state


def test_advection_diffusion_exact():
    """T advected by a uniform flow decays/translates like the exact mode."""
    mesh = box_mesh_2d(4, 4, order=7, x0=0.0, x1=2 * np.pi, y0=0.0,
                       y1=2 * np.pi, periodic_x=True, periodic_y=True)
    sem = SEM(mesh)
    alpha = 0.1
    dt = 2e-3
    ns = NavierStokes(sem, viscosity=0.05, dt=dt, scalar_diff=(alpha,))
    u0 = jnp.stack(
        [jnp.ones_like(sem.bm), jnp.zeros_like(sem.bm)], axis=-1
    ).astype(sem.dtype)
    T0 = jnp.asarray(np.sin(mesh.x)[..., None], dtype=sem.dtype)
    st = ns.make_state(u0, T=T0)
    nsteps = 50
    out = ns.advance(st, nsteps)
    t = nsteps * dt
    T_exact = np.exp(-alpha * t) * np.sin(mesh.x - t)
    err = float(sem.norm(out.T[..., 0] - jnp.asarray(T_exact))
                / sem.norm(jnp.asarray(T_exact)))
    # velocity must stay the uniform flow (exact NS solution)
    uerr = float(jnp.max(jnp.abs(out.u - u0)))
    assert err < 2e-5, f"scalar transport error {err}"
    assert uerr < 1e-8, f"uniform flow drift {uerr}"


@pytest.fixture(scope="module")
def rb_case():
    return RayleighBenardCase(rayleigh=2000.0, prandtl=1.0, nx=4, ny=2,
                              order=6, dt=2.5e-3)


def test_coupled_adjoint_consistency():
    """<M q, w>_B = <q, M* w>_B for the coupled (u, T) tangent operator.

    Machine precision requires (near-)exact inner solves — the transpose of
    ``custom_linear_solve`` re-solves the same SPD systems, so any CG
    tolerance slack shows up as adjoint asymmetry (same effect the velocity
    test pins down, tests/test_linearized.py)."""
    from nekstab_next_tpu.config import SolverConfig

    case = RayleighBenardCase(
        rayleigh=2000.0, prandtl=1.0, nx=4, ny=2, order=6, dt=2.5e-3,
        solver=SolverConfig(velocity_tol=1e-13, pressure_tol=1e-13,
                            scalar_tol=1e-13),
    )
    ns = case.make_ns()
    op = LinearizedOperator(ns, case.base_u, base_T=case.base_T, nsteps=5)
    s = case.sem
    rng = np.random.default_rng(7)
    mk = lambda shape: jnp.asarray(rng.standard_normal(shape), dtype=s.dtype)
    q = (s.vmask * mk(case.base_u.shape), s.tmask[..., None] * mk(case.base_T.shape))
    w = (s.vmask * mk(case.base_u.shape), s.tmask[..., None] * mk(case.base_T.shape))
    Mq = op.matvec(q)
    Mstw = op.rmatvec(w)
    ip = lambda a, b: float(s.inner(a[0], b[0], masked=False)
                            + s.inner(a[1], b[1], masked=False))
    lhs, rhs = ip(Mq, w), ip(q, Mstw)
    assert abs(lhs - rhs) <= 1e-11 * max(abs(lhs), abs(rhs))


def test_rayleigh_benard_growth_rate(rb_case):
    """Leading eigenvalue of the coupled propagator matches the exact
    free-slip RB dispersion relation to <1.5%."""
    from nekstab_next_tpu.algorithms.stability import linear_stability_analysis

    case = rb_case
    ns = case.make_ns()
    nsteps = 40  # horizon T = 0.1 thermal times
    res = linear_stability_analysis(
        ns, case.base_u, horizon=nsteps * case.dt, nsteps=nsteps,
        base_T=case.base_T, k_dim=24, nev=1, tol=1e-8, max_restarts=10,
    )
    sigma = float(np.real(res.lam[0]))
    sigma_exact = case.exact_growth_rate()
    assert abs(sigma - sigma_exact) < 0.015 * abs(sigma_exact), (
        f"sigma={sigma} vs exact {sigma_exact}"
    )
    # leading mode is stationary (real eigenvalue)
    assert abs(float(np.imag(res.lam[0]))) < 1e-3
