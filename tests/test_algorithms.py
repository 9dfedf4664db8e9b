import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nekstab_next_tpu.config import NewtonConfig
from nekstab_next_tpu.mesh import box_mesh_2d
from nekstab_next_tpu.mesh.mesh import BoundaryCondition as BC
from nekstab_next_tpu.ops import SEM
from nekstab_next_tpu.stepper import NavierStokes
from nekstab_next_tpu.algorithms import (
    linear_stability_analysis,
    newton_krylov,
    transient_growth_analysis,
)


@pytest.fixture(scope="module")
def periodic_stokes():
    mesh = box_mesh_2d(4, 4, order=6, x0=0, x1=2 * np.pi, y0=0, y1=2 * np.pi,
                       periodic_x=True, periodic_y=True)
    sem = SEM(mesh)
    ns = NavierStokes(sem, viscosity=0.1, dt=0.02)
    base = jnp.zeros(sem.bm.shape + (2,), dtype=sem.dtype)
    return mesh, sem, ns, base


def test_stokes_spectrum(periodic_stokes):
    # exp(T L) around u=0 in a periodic box: mu = 1 (two constant modes),
    # then mu = e^{-nu T} (|k|^2 = 1 shear modes)
    mesh, sem, ns, base = periodic_stokes
    nsteps = 25
    res = linear_stability_analysis(
        ns, base, horizon=ns.dt * nsteps, nsteps=nsteps,
        k_dim=30, nev=6, tol=1e-8, max_restarts=30,
    )
    mu = np.sort(np.abs(res.mu[:6]))[::-1]
    T = ns.dt * nsteps
    assert abs(mu[0] - 1.0) < 1e-6
    assert abs(mu[1] - 1.0) < 1e-6
    expected = np.exp(-0.1 * T)
    assert abs(mu[2] - expected) / expected < 1e-5
    # NS-plane rates: lambda ~ 0, 0, -nu...
    lam = np.sort(res.lam.real)[::-1]
    assert abs(lam[2] + 0.1) < 1e-4


def test_stokes_adjoint_spectrum_matches(periodic_stokes):
    # Stokes is self-adjoint: adjoint eigenvalues identical.  Degenerate
    # multiplicities are NOT asserted: a single-vector Krylov method only
    # resolves repeated eigenvalues through round-off noise, and the more
    # accurate the operator (e.g. warm-started solves), the longer the
    # second copy takes to emerge — so check the distinct values instead.
    mesh, sem, ns, base = periodic_stokes
    nsteps = 20
    res = linear_stability_analysis(
        ns, base, horizon=ns.dt * nsteps, nsteps=nsteps, mode="adjoint",
        k_dim=24, nev=3, tol=1e-8, max_restarts=30,
    )
    mu = np.abs(res.mu[:3])
    assert abs(mu.max() - 1.0) < 1e-6
    shear = np.exp(-0.1 * ns.dt * nsteps)  # |k|^2 = 1 diffusive pair
    assert np.min(np.abs(mu - shear)) < 1e-5


def test_transient_growth_stokes(periodic_stokes):
    # normal operator: G(T) = |mu_max|^2 = 1 (constant mode)
    mesh, sem, ns, base = periodic_stokes
    nsteps = 20
    res = transient_growth_analysis(
        ns, base, horizon=ns.dt * nsteps, nsteps=nsteps,
        nsv=1, k_dim=16, tol=1e-8,
    )
    assert abs(res.gains[0] - 1.0) < 1e-6


def kovasznay(x, y, Re):
    lam = Re / 2.0 - np.sqrt(Re**2 / 4.0 + 4.0 * np.pi**2)
    u = 1.0 - np.exp(lam * x) * np.cos(2 * np.pi * y)
    v = lam / (2 * np.pi) * np.exp(lam * x) * np.sin(2 * np.pi * y)
    return u, v


@pytest.mark.slow
def test_newton_kovasznay():
    # Newton-Krylov converges to the exact steady NS solution
    Re = 40.0
    mesh = box_mesh_2d(
        4, 4, order=7, x0=-0.5, x1=1.0, y0=-0.5, y1=1.5,
        bc={"left": BC.DIRICHLET, "right": BC.DIRICHLET,
            "bottom": BC.DIRICHLET, "top": BC.DIRICHLET},
    )
    sem = SEM(mesh)
    ue, ve = kovasznay(mesh.x, mesh.y, Re)
    u_exact = jnp.stack([jnp.asarray(ue), jnp.asarray(ve)], axis=-1)
    ns = NavierStokes(sem, viscosity=1.0 / Re, dt=0.01,
                      u_bc=u_exact)  # constructor keeps only Dirichlet nodes
    # start from a perturbed exact solution
    rng = np.random.default_rng(0)
    pert = 0.05 * jnp.asarray(rng.standard_normal(u_exact.shape))
    pert = jnp.asarray(np.asarray(sem.vmask)) * sem.dsavg(pert)
    u0 = u_exact + pert
    result = newton_krylov(
        ns, u0, horizon=0.25, nsteps=50,  # dt=0.005: CFL ~ 0.55, splitting
        cfg=NewtonConfig(tol=1e-9, max_iter=20), k_dim=40,  # error ~ 1e-5
    )
    assert result.converged, result.history
    err = float(sem.norm(result.u[..., 0] - u_exact[..., 0]) /
                sem.norm(u_exact[..., 0]))
    # spatial + splitting error floor at this resolution (measured ~1e-5)
    assert err < 5e-5, err
