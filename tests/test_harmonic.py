"""Floquet-preconditioned harmonic resolvent (algorithms/harmonic.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from nekstab_next_tpu.algorithms.harmonic import (
    SpectralPreconditioner,
    harmonic_resolvent_analysis,
    preconditioned_gmres,
)
from nekstab_next_tpu.algorithms.stability import velocity_space
from nekstab_next_tpu.mesh import box_mesh_2d
from nekstab_next_tpu.ops.core import SEM
from nekstab_next_tpu.utils.noise import velocity_noise


@pytest.fixture(scope="module")
def sem():
    return SEM(box_mesh_2d(2, 2, order=5))


def _orthonormal_fields(sem, space, k, seed=0):
    vs = []
    for i in range(k):
        v = velocity_noise(sem, seed=seed + 17 * i)
        for w in vs:
            v = v - space.dot(w, v) * w
        vs.append(v / jnp.sqrt(space.dot(v, v)))
    return vs


def test_spectral_preconditioner_near_singular_real_mode(sem):
    """(I-M) with a multiplier at 0.999: the spectral preconditioner makes
    GMRES converge in a handful of iterations and the solution matches the
    analytic inverse."""
    space = velocity_space(sem)
    e1, e2 = _orthonormal_fields(sem, space, 2, seed=5)
    mu1, mu2, rest = 0.999, 0.6, 0.1

    def M(x):
        c1, c2 = space.dot(e1, x), space.dot(e2, x)
        return mu1 * c1 * e1 + mu2 * c2 * e2 + rest * (x - c1 * e1 - c2 * e2)

    zero2 = jnp.zeros_like(e1)
    modes = [
        (mu1, (e1, zero2), (e1, zero2)),  # self-adjoint: adjoint = direct
        (mu2, (e2, zero2), (e2, zero2)),
    ]
    pc = SpectralPreconditioner(sem, modes)

    b = velocity_noise(sem, seed=99)
    b = b / jnp.sqrt(space.dot(b, b))
    A = lambda x: x - M(x)

    x, info = preconditioned_gmres(A, space, b, pc, k_dim=8, tol=1e-10)
    assert info["converged"]
    # analytic solution: expand b in {e1, e2, rest}
    c1, c2 = space.dot(e1, b), space.dot(e2, b)
    x_exact = (
        c1 / (1 - mu1) * e1 + c2 / (1 - mu2) * e2
        + (b - c1 * e1 - c2 * e2) / (1 - rest)
    )
    err = float(jnp.sqrt(space.dot(x - x_exact, x - x_exact)))
    assert err < 1e-8, err
    # P^-1 applies the inverse exactly on the deflated subspace, so the
    # preconditioned system is well-conditioned: few iterations suffice
    assert info["iterations"] <= 6, info


def test_spectral_preconditioner_complex_pair(sem):
    """Complex multiplier pair mu = rho e^{+-i th} acting as a scaled rotation
    on a 2-plane; one listed mode (factor 2) must capture both partners."""
    space = velocity_space(sem)
    e1, e2 = _orthonormal_fields(sem, space, 2, seed=11)
    rho, th = 0.995, 0.3
    mu = rho * np.exp(1j * th)

    def M(x):
        c1, c2 = space.dot(e1, x), space.dot(e2, x)
        r1 = rho * (np.cos(th) * c1 - np.sin(th) * c2)
        r2 = rho * (np.sin(th) * c1 + np.cos(th) * c2)
        return r1 * e1 + r2 * e2 + 0.2 * (x - c1 * e1 - c2 * e2)

    # eigenvector of the rotation block for mu = rho e^{i th}: v = (e1 - i e2)/sqrt(2)
    v_re, v_im = e1 / np.sqrt(2), -e2 / np.sqrt(2)
    modes = [(mu, (v_re, v_im), (v_re, v_im))]
    pc = SpectralPreconditioner(sem, modes)

    b = velocity_noise(sem, seed=123)
    A = lambda x: x - M(x)
    x, info = preconditioned_gmres(A, space, b, pc, k_dim=10, tol=1e-10)
    assert info["converged"]
    r = A(x) - b
    assert float(jnp.sqrt(space.dot(r, r))) < 1e-8 * float(
        jnp.sqrt(space.dot(b, b))
    )
    assert info["iterations"] <= 8, info


def test_harmonic_resolvent_end_to_end(sem):
    """Plumbing test on a Stokes-like cavity: the full pipeline (two
    eigensolves, biorthogonal pairing, preconditioned periodicity solve,
    quarter-period phase) runs and returns a finite gain."""
    from nekstab_next_tpu.stepper.navier_stokes import NavierStokes

    ns = NavierStokes(sem, viscosity=0.5, dt=None or (2 * np.pi / 1.0) / 8)
    base = jnp.zeros(sem.bm.shape + (2,))
    f = velocity_noise(sem, seed=7)
    res = harmonic_resolvent_analysis(
        ns, base, omega=1.0, f_re=f,
        n_precond_modes=1, eig_k_dim=6, eig_tol=1e-4,
        steps_per_period=8, gmres_k_dim=10, gmres_tol=1e-7,
    )
    assert np.isfinite(res.gain) and res.gain > 0
    assert res.precond_rank >= 1
    assert np.all(np.abs(res.floquet_multipliers) < 1.0)  # Stokes: stable
