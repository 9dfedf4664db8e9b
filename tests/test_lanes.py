"""Lanes-layout elliptic solves (ops/lanes.py) match the standard layout.

The lanes path is an orthogonal permutation of the same operators, so the
CG solves agree to solver tolerance and the individual operator applies
agree to roundoff.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nekstab_next_tpu.config import SolverConfig
from nekstab_next_tpu.mesh import box_mesh_2d
from nekstab_next_tpu.ops import SEM
from nekstab_next_tpu.ops.lanes import LanesOps
from nekstab_next_tpu.stepper import NavierStokes
from nekstab_next_tpu.stepper.linearized import LinearizedOperator


@pytest.fixture(scope="module")
def setup():
    # non-periodic box: Dirichlet walls, outflow-free (pure-Neumann pressure)
    mesh = box_mesh_2d(4, 3, order=6, x0=0.0, x1=2.0, y0=0.0, y1=1.5)
    sem = SEM(mesh)
    rng = np.random.default_rng(7)
    u = jnp.asarray(rng.standard_normal(sem.bm.shape + (2,)))
    q = jnp.asarray(rng.standard_normal(sem.p_shape))
    return mesh, sem, u, q


def test_layout_roundtrip(setup):
    _, sem, u, q = setup
    L = LanesOps(sem)
    assert jnp.array_equal(L.vel_from_l(L.vel_to_l(u)), u)
    assert jnp.array_equal(L.p_from_l(L.p_to_l(q)), q)


def test_helmholtz_and_projector_permute(setup):
    _, sem, u, _ = setup
    L = LanesOps(sem)
    h1, h2 = 0.03, 7.5
    ref = jnp.stack(
        [sem.helmholtz_local(u[..., d], h1, h2) for d in range(2)], axis=-1
    )
    got = L.vel_from_l(L.helm_v(L.vel_to_l(u), h1, h2))
    np.testing.assert_allclose(got, ref, rtol=1e-12, atol=1e-12)

    Pref = sem.vmask * sem.dsavg(sem.vmask * u)
    Pgot = L.vel_from_l(L.proj_v(L.vel_to_l(u)))
    np.testing.assert_allclose(Pgot, Pref, rtol=1e-12, atol=1e-12)

    Fref = jnp.stack(
        [sem.fdm_apply(u[..., d], h1, h2) for d in range(2)], axis=-1
    )
    Fgot = L.vel_from_l(L.fdm_v(L.vel_to_l(u), h1, h2))
    np.testing.assert_allclose(Fgot, Fref, rtol=1e-11, atol=1e-11)


def test_pressure_operator_and_precond_permute(setup):
    _, sem, u, q = setup
    L = LanesOps(sem)

    # E = D M^-1 D^T exactly as navier_stokes._core builds it
    def div_w(v):
        return sem.div_to_p(v)

    grad_wt = jax.linear_transpose(div_w, u)
    binv = sem.binv_assembled[..., None]

    def minv(g):
        return sem.vmask * (binv * sem.dssum(sem.vmask * g))

    E_ref = div_w(minv(grad_wt(q)[0]))
    to_l, from_l, E_l, M_l, _, _ = L.pressure_bundle(project_mean=True)
    E_got = from_l(E_l(to_l(q)))
    np.testing.assert_allclose(E_got, E_ref, rtol=1e-12, atol=1e-12)

    M_ref = sem.pressure_precond_pnpn2(q)
    M_got = from_l(M_l(to_l(q)))
    np.testing.assert_allclose(M_got, M_ref, rtol=1e-11, atol=1e-11)


def _advance(sem, u0, lanes: bool, nsteps=5):
    solver = SolverConfig(
        pressure_tol=1e-11, velocity_tol=1e-12, lanes_layout=lanes
    )
    ns = NavierStokes(sem, viscosity=0.05, dt=0.01, solver=solver)
    st = jax.jit(lambda s: ns.advance(s, nsteps))(ns.make_state(u0))
    return ns, st


def test_step_matches_standard(setup):
    mesh, sem, _, _ = setup
    # a smooth divergence-consistent-ish initial field; the projection step
    # handles the rest
    x, y = mesh.x, mesh.y
    u0 = jnp.stack(
        [jnp.asarray(np.sin(np.pi * x) * np.cos(np.pi * y)),
         jnp.asarray(-np.cos(np.pi * x) * np.sin(np.pi * y))], axis=-1
    )
    u0 = sem.vmask * u0
    ns, ref = _advance(sem, u0, lanes=False)
    ns2, got = _advance(sem, u0, lanes=True)
    assert ns2.lanes is not None
    err = float(jnp.max(jnp.abs(got.u - ref.u)))
    assert err < 1e-8, err


def test_linearized_matvec_matches_standard(setup):
    mesh, sem, u, _ = setup
    x, y = mesh.x, mesh.y
    base = sem.vmask * jnp.stack(
        [jnp.asarray(np.sin(np.pi * x) * np.cos(np.pi * y)),
         jnp.asarray(-np.cos(np.pi * x) * np.sin(np.pi * y))], axis=-1
    )
    pert = sem.vmask * u

    def op(lanes):
        solver = SolverConfig(
            pressure_tol=1e-11, velocity_tol=1e-12, lanes_layout=lanes
        )
        ns = NavierStokes(sem, viscosity=0.05, dt=0.01, solver=solver)
        return LinearizedOperator(ns, base, nsteps=4)

    ref = op(False).matvec(pert)
    got = op(True).matvec(pert)
    err = float(jnp.max(jnp.abs(got - ref))) / float(jnp.max(jnp.abs(ref)))
    assert err < 1e-7, err
