import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nekstab_next_tpu.krylov import VectorSpace
from nekstab_next_tpu.mesh import box_mesh_2d
from nekstab_next_tpu.mesh.mesh import BoundaryCondition as BC
from nekstab_next_tpu.ops import SEM
from nekstab_next_tpu.stepper import NavierStokes, initial_state
from nekstab_next_tpu.stepper.linearized import LinearizedOperator, FloquetOperator


@pytest.fixture(scope="module")
def cavity():
    # lid-driven-cavity-like box: walls all around (regularized lid off — we
    # only exercise the linearization machinery here, base flow need not be
    # a fixed point for these identities)
    mesh = box_mesh_2d(4, 4, order=5, x0=0, x1=1, y0=0, y1=1)
    sem = SEM(mesh)
    ns = NavierStokes(sem, viscosity=0.05, dt=0.01)
    rng = np.random.default_rng(0)
    vm = np.asarray(sem.vmask)
    base = jnp.asarray(vm * rng.standard_normal(vm.shape) * 0.1)
    base = jnp.stack([sem.dsavg(base[..., 0]), sem.dsavg(base[..., 1])], axis=-1)
    base = jnp.asarray(vm) * base
    return mesh, sem, ns, base


def rand_pert(sem, seed):
    rng = np.random.default_rng(seed)
    vm = np.asarray(sem.vmask)
    q = jnp.asarray(rng.standard_normal(vm.shape))
    q = jnp.stack([sem.dsavg(q[..., 0]), sem.dsavg(q[..., 1])], axis=-1)
    return jnp.asarray(vm) * q


def test_tangent_matches_finite_difference(cavity):
    # the frozen-base operator equals D(propagator) only at a fixed point of
    # the discrete map; u = 0 in a no-slip box is one exactly
    mesh, sem, ns, _ = cavity
    base = jnp.zeros(sem.bm.shape + (2,), dtype=sem.dtype)
    nsteps = 5
    op = LinearizedOperator(ns, base, nsteps=nsteps)
    q = rand_pert(sem, 1)
    Mq = op.matvec(q)
    # central finite difference of the nonlinear propagator (the reference's
    # forward_finite_difference_map, core/matvec.f90:246-379)
    eps = 1e-5
    up = ns.propagator(base + eps * q, nsteps)
    um = ns.propagator(base - eps * q, nsteps)
    fd = (up - um) / (2 * eps)
    err = float(sem.norm(Mq - fd) / sem.norm(Mq))
    assert err < 1e-7, err


def test_adjoint_identity_machine_precision(cavity):
    # <M q, w>_B == <q, M* w>_B down to the inner-solver tolerance — the
    # transpose of each custom_linear_solve re-solves the same SPD system, so
    # the only asymmetry left is the CG tolerance itself (vs the reference's
    # hand-derived adjoint solver, which has discretization-level mismatch)
    from nekstab_next_tpu.config import SolverConfig

    mesh, sem, ns0, base = cavity
    ns = NavierStokes(
        sem, viscosity=ns0.nu, dt=ns0.dt,
        solver=SolverConfig(velocity_tol=1e-13, pressure_tol=1e-13),
    )
    op = LinearizedOperator(ns, base, nsteps=4)
    q = rand_pert(sem, 2)
    w = rand_pert(sem, 3)
    a = float(sem.inner(op.matvec(q)[..., 0], w[..., 0], masked=False)
              + sem.inner(op.matvec(q)[..., 1], w[..., 1], masked=False))
    Mw = op.rmatvec(w)
    b = float(sem.inner(q[..., 0], Mw[..., 0], masked=False)
              + sem.inner(q[..., 1], Mw[..., 1], masked=False))
    assert abs(a - b) < 1e-12 * max(abs(a), 1.0), (a, b)


def test_linearity(cavity):
    mesh, sem, ns, base = cavity
    op = LinearizedOperator(ns, base, nsteps=3)
    q1, q2 = rand_pert(sem, 4), rand_pert(sem, 5)
    lhs = op.matvec(2.0 * q1 - 3.0 * q2)
    rhs = 2.0 * op.matvec(q1) - 3.0 * op.matvec(q2)
    # exact up to the inner CG tolerances (each input is solved to its own
    # relative tolerance, so superposition holds to ~tol)
    assert float(sem.norm(lhs - rhs)) < 1e-6 * float(sem.norm(rhs) + 1.0)


def test_floquet_matches_steady_for_constant_base(cavity):
    # with a steady base the Floquet (trajectory-linearized) operator equals
    # the frozen-base operator as dt errors of the base trajectory vanish;
    # here base is NOT a fixed point so we only compare against the jvp of
    # the full propagator (they must agree exactly by construction)
    mesh, sem, ns, base = cavity
    nsteps = 4
    flo = FloquetOperator(ns, base, nsteps=nsteps, remat=True)
    q = rand_pert(sem, 6)
    Mq = flo.matvec(q)
    _, jvp_q = jax.jvp(lambda u: ns.propagator(u, nsteps), (base,), (q,))
    # agreement up to inner-solver tolerance (remat recompute reorders the
    # CG reductions slightly)
    assert float(sem.norm(Mq - jvp_q)) < 1e-8 * max(float(sem.norm(jvp_q)), 1.0)
    # and its adjoint satisfies the identity too
    w = rand_pert(sem, 7)
    a = float(jnp.sum(Mq * w * sem.bm[..., None]))
    Mw = flo.rmatvec(w)
    b = float(jnp.sum(q * Mw * sem.bm[..., None]))
    assert abs(a - b) < 1e-8 * max(abs(a), 1.0)


def test_diffusion_decay_rate(cavity):
    # Stokes limit: leading decay of a sine perturbation in a periodic box
    mesh = box_mesh_2d(4, 4, order=6, x0=0, x1=2 * np.pi, y0=0, y1=2 * np.pi,
                       periodic_x=True, periodic_y=True)
    sem = SEM(mesh)
    nu = 0.1
    dt = 0.01
    ns = NavierStokes(sem, viscosity=nu, dt=dt)
    base = jnp.zeros(sem.bm.shape + (2,), dtype=sem.dtype)
    nsteps = 50
    op = LinearizedOperator(ns, base, nsteps=nsteps)
    x, y = jnp.asarray(mesh.x), jnp.asarray(mesh.y)
    q = jnp.stack([-jnp.cos(x) * jnp.sin(y), jnp.sin(x) * jnp.cos(y)], axis=-1)
    Mq = op.matvec(q)
    # exp(T L) q = e^{-2 nu T} q for this eigenfunction of the Stokes operator
    growth = float(sem.inner(Mq[..., 0], q[..., 0]) + sem.inner(Mq[..., 1], q[..., 1])) / float(
        sem.inner(q[..., 0], q[..., 0]) + sem.inner(q[..., 1], q[..., 1])
    )
    exact = np.exp(-2 * nu * dt * nsteps)
    assert abs(growth - exact) / exact < 1e-5, (growth, exact)


def test_finite_difference_operator(cavity):
    # the packaged FD Frechet operator (reference forward_finite_difference
    # _map orders 2 and 4, core/matvec.f90:246-379) agrees with the exact
    # tangent; 4th order is closer than 2nd
    from nekstab_next_tpu.stepper.linearized import FiniteDifferenceOperator

    mesh, sem, ns, _ = cavity
    base = jnp.zeros(sem.bm.shape + (2,), dtype=sem.dtype)
    nsteps = 4
    op = LinearizedOperator(ns, base, nsteps=nsteps)
    q = rand_pert(sem, 7)
    Mq = op.matvec(q)
    errs = {}
    for order in (2, 4):
        fd = FiniteDifferenceOperator(ns, base, nsteps=nsteps, order=order)
        errs[order] = float(sem.norm(fd.matvec(q) - Mq) / sem.norm(Mq))
    # both orders sit at the inner-solver noise floor (~1e-9) here; the
    # truncation-order separation only shows above it
    assert errs[2] < 1e-6, errs
    assert errs[4] < 1e-6, errs
