import jax.numpy as jnp
import numpy as np
import pytest

from nekstab_next_tpu.mesh import box_mesh_2d
from nekstab_next_tpu.ops import SEM
from nekstab_next_tpu.stepper import NavierStokes
from nekstab_next_tpu.algorithms.resolvent import ResolventOperator


@pytest.fixture(scope="module")
def setup():
    mesh = box_mesh_2d(4, 4, order=6, x0=0, x1=2 * np.pi, y0=0, y1=2 * np.pi,
                       periodic_x=True, periodic_y=True)
    sem = SEM(mesh)
    nu = 0.5
    ns = NavierStokes(sem, viscosity=nu, dt=0.01)  # dt overridden inside op
    base = jnp.zeros(sem.bm.shape + (2,), dtype=sem.dtype)
    return mesh, sem, ns, base, nu


def test_resolvent_matvec_analytic(setup):
    # Stokes resolvent of the k=(1,0) shear mode: uhat = fhat / (i w + nu)
    mesh, sem, ns, base, nu = setup
    omega = 0.7
    op = ResolventOperator(ns, base, omega, steps_per_period=64,
                           gmres_kdim=20, gmres_tol=1e-10)
    x = jnp.asarray(mesh.x)
    zero = jnp.zeros_like(x)
    f_re = jnp.stack([zero, jnp.cos(x)], axis=-1)
    f_im = jnp.stack([zero, jnp.sin(x)], axis=-1)
    u_re, u_im = op.matvec((f_re, f_im))
    denom = 1j * omega + nu
    uhat = 1.0 / denom  # complex amplitude of the response
    ue_re = jnp.stack([zero, uhat.real * jnp.cos(x) - uhat.imag * jnp.sin(x)], axis=-1)
    ue_im = jnp.stack([zero, uhat.real * jnp.sin(x) + uhat.imag * jnp.cos(x)], axis=-1)
    scale = float(sem.norm(ue_re[..., 1]))
    err_re = float(sem.norm(u_re[..., 1] - ue_re[..., 1])) / scale
    err_im = float(sem.norm(u_im[..., 1] - ue_im[..., 1])) / scale
    # measured convergence: real part ~3rd order in dt, imag part 2nd order
    # (the quarter-period propagation restarts the BDF ramp, as in the
    # reference's phase trick) — at 64 steps/period: 7.5e-4 / 2.9e-3
    assert err_re < 1.5e-3, (err_re, err_im)
    assert err_im < 5e-3, (err_re, err_im)


def test_resolvent_pure_matches_matvec(setup):
    mesh, sem, ns, base, nu = setup
    omega = 0.7
    op = ResolventOperator(ns, base, omega, steps_per_period=64,
                           gmres_kdim=20, gmres_tol=1e-10)
    x = jnp.asarray(mesh.x)
    zero = jnp.zeros_like(x)
    f_re = jnp.stack([zero, jnp.cos(x)], axis=-1)
    f_im = jnp.stack([zero, jnp.sin(x)], axis=-1)
    a_re, a_im = op.matvec((f_re, f_im))
    b_re, b_im = op.matvec_pure((f_re, f_im))
    assert float(sem.norm(a_re[..., 1] - b_re[..., 1])) < 1e-6
    assert float(sem.norm(a_im[..., 1] - b_im[..., 1])) < 1e-6


def test_floquet_resolvent_matches_steady_on_steady_base(setup):
    """uparam 3.41 consistency: around a constant 'orbit' the Floquet
    resolvent (trajectory-linearized, orbit store/replay) must reproduce the
    frozen-base steady resolvent."""
    from nekstab_next_tpu.algorithms.resolvent import FloquetResolventOperator

    mesh, sem, ns, base, nu = setup
    omega = 0.7
    x = jnp.asarray(mesh.x)
    zero = jnp.zeros_like(x)
    f_re = jnp.stack([zero, jnp.cos(x)], axis=-1)
    f_im = jnp.stack([zero, jnp.sin(x)], axis=-1)

    op_s = ResolventOperator(ns, base, omega, steps_per_period=32,
                             gmres_kdim=20, gmres_tol=1e-10)
    op_f = FloquetResolventOperator(ns, base, omega, steps_per_period=32,
                                    gmres_kdim=20, gmres_tol=1e-10)
    assert op_f.monodromy_drift < 1e-12  # steady base = drift-free orbit

    a_re, a_im = op_s.matvec((f_re, f_im))
    b_re, b_im = op_f.matvec((f_re, f_im))
    scale = float(sem.norm(a_re[..., 1]))
    assert float(sem.norm(a_re[..., 1] - b_re[..., 1])) < 1e-8 * scale
    assert float(sem.norm(a_im[..., 1] - b_im[..., 1])) < 1e-8 * scale

    # non-harmonic frequency is rejected
    import pytest as _pytest

    with _pytest.raises(ValueError):
        FloquetResolventOperator(ns, base, omega, base_period=10.0,
                                 steps_per_period=32)


def test_resolvent_adjoint_identity(setup):
    """<R f, u> = <f, R* u> in the energy product — the adjoint path had no
    coverage before round 5 (a scan-transpose JAX bug broke it silently;
    rmatvec now rides jax.vjp)."""
    from nekstab_next_tpu.algorithms.resolvent import _complex_space

    mesh, sem, ns, base, nu = setup
    op = ResolventOperator(ns, base, 0.7, steps_per_period=32, gmres_kdim=10)
    rng = np.random.default_rng(3)
    mk = lambda: (jnp.asarray(rng.standard_normal(sem.bm.shape + (2,))),
                  jnp.asarray(rng.standard_normal(sem.bm.shape + (2,))))
    x, y = mk(), mk()
    space = _complex_space(sem)
    a1 = float(space.dot(op.matvec_pure(x), y))
    a2 = float(space.dot(x, op.rmatvec(y)))
    # limited by the fixed-iteration device GMRES residual, not roundoff
    assert abs(a1 - a2) / abs(a1) < 1e-3, (a1, a2)
