"""Forced periodic orbits (reference uparam 2.2) and the trajectory-
linearized tangent propagator behind them.

The reference solves periodically-forced orbits with a fixed period and a
time-dependent linearization along the stored orbit
(core/main.f90:183-192, core/newton_krylov.f90:77,145, matvec.f90:189-231).
Here the monodromy comes from ``jax.jvp`` over the nonlinear trajectory
(stepper/linearized.make_orbit_tangent_propagator); these tests check it
against finite differences and converge a genuinely nonlinear forced orbit
with an analytic weakly-nonlinear limit."""

import jax
import jax.numpy as jnp
import numpy as np

from nekstab_next_tpu.algorithms import newton_krylov
from nekstab_next_tpu.config import NewtonConfig
from nekstab_next_tpu.mesh import box_mesh_2d
from nekstab_next_tpu.ops import SEM
from nekstab_next_tpu.stepper import NavierStokes
from nekstab_next_tpu.stepper.linearized import make_orbit_tangent_propagator
from nekstab_next_tpu.utils.noise import velocity_noise


def _tg_setup(nu=0.1):
    mesh = box_mesh_2d(4, 4, order=4, x0=0, x1=2 * np.pi, y0=0, y1=2 * np.pi,
                       periodic_x=True, periodic_y=True)
    sem = SEM(mesh)
    u0 = jnp.asarray(np.stack([-np.cos(mesh.x) * np.sin(mesh.y),
                               np.sin(mesh.x) * np.cos(mesh.y)], axis=-1))
    return mesh, sem, u0


def test_orbit_tangent_matches_finite_difference():
    """The trajectory-linearized tangent is the exact Jacobian of the
    nonlinear propagator — checked by central finite differences around a
    time-EVOLVING base (a decaying Taylor-Green vortex), where the
    frozen-base tangent would be wrong."""
    mesh, sem, u0 = _tg_setup()
    ns = NavierStokes(sem, viscosity=0.1, dt=0.02)
    nsteps = 5
    dt = jnp.asarray(0.02)
    q = velocity_noise(sem, seed=3)

    tangent = make_orbit_tangent_propagator(ns, nsteps)
    got = tangent(u0, jnp.zeros(ns.p_shape), q, dt, jnp.asarray(0.0))

    prop = jax.jit(lambda u: ns.propagator(u, nsteps, dt=0.02))
    eps = 1e-5
    fd = (prop(u0 + eps * q) - prop(u0 - eps * q)) / (2 * eps)
    err = float(jnp.max(jnp.abs(got - fd))) / float(jnp.max(jnp.abs(fd)))
    assert err < 1e-6, err


def test_forced_periodic_orbit_converges():
    """Newton for a periodically forced orbit with fixed period (uparam 2.2):
    two forced shear modes coupled by convection.  Gates: residual < 1e-9,
    and the leading Fourier amplitude matches the analytic linear response
    a(0) = A nu / (nu^2 + omega^2) to within the weakly-nonlinear + time-
    discretization error."""
    mesh, sem, _ = _tg_setup()
    nu, Tf = 0.1, 1.0
    om = 2 * np.pi / Tf
    A = 0.4
    f1 = jnp.asarray(np.stack([np.sin(mesh.y), np.zeros_like(mesh.y)], -1))
    f2 = jnp.asarray(np.stack([np.zeros_like(mesh.x), np.sin(mesh.x)], -1))

    def forcing(u, t):
        return A * jnp.cos(om * t) * f1 + A * jnp.sin(om * t) * f2

    nsteps = 80  # amplitude error converges at ~3rd order: 2.4e-3 at
    ns = NavierStokes(sem, viscosity=nu, dt=Tf / nsteps, forcing=forcing)
    # nsteps=40 -> 2.9e-4 at nsteps=80 (0.45% of the response amplitude)

    res = newton_krylov(
        ns, jnp.zeros_like(f1), horizon=Tf, nsteps=nsteps, forced=True,
        cfg=NewtonConfig(tol=1e-10, max_iter=12), k_dim=30,
    )
    assert res.converged, res.history
    assert res.residual < 1e-9, res.residual
    assert res.period == Tf  # fixed, not an unknown

    # the orbit really is T-periodic under the forced dynamics
    phi = jax.jit(lambda u: ns.propagator(u, nsteps, dt=Tf / nsteps))(res.u)
    drift = float(sem.norm(phi - res.u))
    assert drift < 1e-9, drift

    # weakly-nonlinear check: the continuous response of mode f1 is
    # a(t) = A (nu cos wt + w sin wt) / (nu^2 + w^2); at the quarter period
    # a(T/4) = A w / (nu^2 + w^2) is the (dominant) quadrature amplitude —
    # an O(amplitude) quantity, unlike a(0) which is ~1.6% of it and swamped
    # by discretization phase error.
    uq = jax.jit(lambda u: ns.propagator(u, nsteps // 4, dt=Tf / nsteps))(res.u)
    aq = float(sum(sem.inner(uq[..., d], f1[..., d]) for d in range(2))
               / sum(sem.inner(f1[..., d], f1[..., d]) for d in range(2)))
    aq_lin = A * om / (nu**2 + om**2)
    assert abs(aq - aq_lin) < 0.01 * abs(aq_lin), (aq, aq_lin)
