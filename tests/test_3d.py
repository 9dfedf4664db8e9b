import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nekstab_next_tpu.mesh import box_mesh_3d
from nekstab_next_tpu.ops import SEM3
from nekstab_next_tpu.stepper import NavierStokes, initial_state
from nekstab_next_tpu.stepper.linearized import LinearizedOperator


@pytest.fixture(scope="module")
def box3():
    mesh = box_mesh_3d(2, 2, 2, order=5, x0=-1, x1=1, y0=-1, y1=1, z0=-1, z1=1)
    return mesh, SEM3(mesh)


@pytest.fixture(scope="module")
def periodic3():
    L = 2 * np.pi
    mesh = box_mesh_3d(3, 3, 3, order=5, x1=L, y1=L, z1=L,
                       periodic_x=True, periodic_y=True, periodic_z=True)
    return mesh, SEM3(mesh)


def test_gradient_exact_polynomial(box3):
    mesh, sem = box3
    x, y, z = mesh.x, mesh.y, mesh.z
    f = jnp.asarray(x**3 * y + y**2 * z - 2 * z**3 * x)
    gx, gy, gz = sem.grad(f)
    assert float(jnp.max(jnp.abs(gx - (3 * x**2 * y - 2 * z**3)))) < 1e-10
    assert float(jnp.max(jnp.abs(gy - (x**3 + 2 * y * z)))) < 1e-10
    assert float(jnp.max(jnp.abs(gz - (y**2 - 6 * z**2 * x)))) < 1e-10


def test_mass_and_multiplicity(box3):
    mesh, sem = box3
    # volume of [-1,1]^3
    assert abs(float(sem.volume()) - 8.0) < 1e-12
    # dssum of ones = multiplicity; dsavg of any C0 field is idempotent
    ones = jnp.ones(mesh.x.shape)
    assert float(jnp.max(jnp.abs(sem.dssum(ones) - jnp.asarray(mesh.mult)))) < 1e-12
    f = jnp.asarray(mesh.x * mesh.y + mesh.z)
    assert float(jnp.max(jnp.abs(sem.dsavg(f) - f))) < 1e-12


def test_stiffness_symmetric_and_consistent(box3):
    mesh, sem = box3
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal(mesh.x.shape))
    b = jnp.asarray(rng.standard_normal(mesh.x.shape))
    # local weak form: <a, K b> == sum grad(a).grad(b) * quadrature
    kab = float(jnp.sum(a * sem.stiffness_local(b)))
    kba = float(jnp.sum(b * sem.stiffness_local(a)))
    assert abs(kab - kba) < 1e-10 * max(abs(kab), 1.0)
    ga = sem.grad(a)
    gb = sem.grad(b)
    direct = float(jnp.sum(sem.bm * sum(x * y for x, y in zip(ga, gb))))
    assert abs(kab - direct) < 1e-9 * max(abs(kab), 1.0)


def test_stokes_decay_3d(periodic3):
    """Fourier mode decays at nu |k|^2 under the (linear) Stokes dynamics:
    run the stepper with convection effectively zero (tiny amplitude)."""
    mesh, sem = periodic3
    nu, dt, nsteps = 0.05, 0.01, 30
    amp = 1e-8  # nonlinear term negligible -> Stokes
    # solenoidal mode: u = (sin y, 0, 0) has k^2 = 1
    u0 = amp * jnp.asarray(
        np.stack([np.sin(mesh.y), np.zeros_like(mesh.y), np.zeros_like(mesh.y)],
                 axis=-1)
    )
    ns = NavierStokes(sem, viscosity=nu, dt=dt)
    out = jax.jit(lambda s: ns.advance(s, nsteps))(ns.make_state(u0))
    ratio = float(sem.norm(out.u[..., 0], masked=False)
                  / sem.norm(u0[..., 0], masked=False))
    expected = np.exp(-nu * dt * nsteps)
    assert abs(ratio - expected) < 2e-4, (ratio, expected)


def test_taylor_green_embedded_3d(periodic3):
    """2-D Taylor-Green embedded in 3-D (w = 0, no z-dependence) stays an
    exact Navier-Stokes solution; checks the full nonlinear 3-D path."""
    mesh, sem = periodic3
    nu, dt, nsteps = 0.1, 0.01, 20
    u0 = jnp.asarray(np.stack([
        -np.cos(mesh.x) * np.sin(mesh.y),
        np.sin(mesh.x) * np.cos(mesh.y),
        np.zeros_like(mesh.x),
    ], axis=-1))
    ns = NavierStokes(sem, viscosity=nu, dt=dt)
    out = jax.jit(lambda s: ns.advance(s, nsteps))(ns.make_state(u0))
    t = nsteps * dt
    decay = np.exp(-2 * nu * t)
    ue = jnp.asarray(np.stack([
        -np.cos(mesh.x) * np.sin(mesh.y),
        np.sin(mesh.x) * np.cos(mesh.y),
        np.zeros_like(mesh.x),
    ], axis=-1)) * decay
    err = float(jnp.max(jnp.abs(out.u - ue)))
    # discretization-limited: the PnPn-2 P_{N-2} pressure space floors the
    # error around 1e-2 at order 5 on this coarse grid (order-7 runs are
    # spectral; the GLL-pressure scheme reaches 1e-3 here)
    assert err < 2e-2, err
    # w stays zero up to the inner CG solve tolerance
    assert float(jnp.max(jnp.abs(out.u[..., 2]))) < 1e-7


def test_adjoint_consistency_3d(periodic3):
    """<M q, w>_B = <q, M* w>_B to solver tolerance for the 3-D tangent
    propagator (the reference can only check this approximately)."""
    mesh, sem = periodic3
    ns = NavierStokes(sem, viscosity=0.05, dt=0.01)
    rng = np.random.default_rng(7)
    shape = mesh.x.shape + (3,)
    base = jnp.asarray(0.1 * rng.standard_normal(shape))
    q = jnp.asarray(rng.standard_normal(shape))
    w = jnp.asarray(rng.standard_normal(shape))
    op = LinearizedOperator(ns, base, nsteps=4)
    Mq = op.matvec(q)
    Mtw = op.rmatvec(w)
    bm = sem.bm[..., None]
    lhs = float(jnp.sum(bm * Mq * w))
    rhs = float(jnp.sum(bm * q * Mtw))
    assert abs(lhs - rhs) < 1e-6 * max(abs(lhs), 1e-3), (lhs, rhs)
