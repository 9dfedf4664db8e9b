import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nekstab_next_tpu.config import SolverConfig
from nekstab_next_tpu.mesh import box_mesh_2d
from nekstab_next_tpu.ops import SEM
from nekstab_next_tpu.stepper import NavierStokes, initial_state


def taylor_green(x, y, t, nu):
    f = np.exp(-2.0 * nu * t)
    u = -np.cos(x) * np.sin(y) * f
    v = np.sin(x) * np.cos(y) * f
    p = -0.25 * (np.cos(2 * x) + np.cos(2 * y)) * f * f
    return u, v, p


@pytest.fixture(scope="module")
def tg_setup():
    mesh = box_mesh_2d(6, 6, order=6, x0=0, x1=2 * np.pi, y0=0, y1=2 * np.pi,
                       periodic_x=True, periodic_y=True)
    sem = SEM(mesh)
    return mesh, sem


def run_tg(mesh, sem, nu, dt, nsteps, scheme="pnpn2"):
    u0, v0, p0 = taylor_green(mesh.x, mesh.y, 0.0, nu)
    u = jnp.stack([jnp.asarray(u0), jnp.asarray(v0)], axis=-1)
    ns = NavierStokes(sem, viscosity=nu, dt=dt,
                      solver=SolverConfig(pressure_operator=scheme))
    p = (sem.p_from_gll(jnp.asarray(p0)) if ns.p_shape != sem.bm.shape
         else jnp.asarray(p0))
    st = ns.make_state(u, p=p)
    st = jax.jit(lambda s: ns.advance(s, nsteps))(st)
    return ns, st


def test_taylor_green_decay_pnpn2(tg_setup):
    # PnPn-2 (default): velocity error floored by the P_{N-2} pressure-space
    # spatial accuracy at this resolution (~8e-5 relative, dt-independent)
    mesh, sem = tg_setup
    nu, dt, nsteps = 0.1, 0.01, 100
    _, st = run_tg(mesh, sem, nu, dt, nsteps)
    t = dt * nsteps
    ue, ve, _ = taylor_green(mesh.x, mesh.y, t, nu)
    uerr = float(sem.norm(st.u[..., 0] - jnp.asarray(ue)))
    unorm = float(sem.norm(jnp.asarray(ue)))
    assert uerr / unorm < 3e-4, uerr / unorm


def test_taylor_green_decay_laplacian(tg_setup):
    # the GLL-pressure approximate projection is sharper on affine periodic
    # meshes (full P_N pressure) — keep the tight gate there
    mesh, sem = tg_setup
    nu, dt, nsteps = 0.1, 0.01, 100
    _, st = run_tg(mesh, sem, nu, dt, nsteps, scheme="laplacian")
    t = dt * nsteps
    ue, ve, _ = taylor_green(mesh.x, mesh.y, t, nu)
    uerr = float(sem.norm(st.u[..., 0] - jnp.asarray(ue)))
    unorm = float(sem.norm(jnp.asarray(ue)))
    assert uerr / unorm < 2e-5, uerr / unorm


def test_taylor_green_temporal_order(tg_setup):
    # halving dt should cut the error by ~4x (2nd-order splitting at least);
    # measured on the laplacian scheme where the spatial floor (~1e-6) sits
    # far below the temporal error
    mesh, sem = tg_setup
    nu, T = 0.1, 0.5
    errs = []
    for dt in (0.02, 0.01):
        _, st = run_tg(mesh, sem, nu, dt, int(round(T / dt)), scheme="laplacian")
        ue, _, _ = taylor_green(mesh.x, mesh.y, T, nu)
        errs.append(float(sem.norm(st.u[..., 0] - jnp.asarray(ue))))
    rate = np.log2(errs[0] / errs[1])
    assert rate > 1.7, (errs, rate)


def test_divergence_free(tg_setup):
    mesh, sem = tg_setup
    # PnPn-2 guarantee: WEAK (P_{N-2}-tested) divergence vanishes to solver
    # tolerance; the strong GLL divergence only saturates at the pressure-
    # space spatial error
    ns, st = run_tg(mesh, sem, 0.1, 0.01, 20)
    dw = float(jnp.linalg.norm(sem.div_to_p(st.u)))
    assert dw < 1e-7, dw
    d = sem.div(st.u[..., 0], st.u[..., 1])
    assert float(sem.norm(d)) < 1e-2
    # laplacian scheme: small strong divergence via the B-weighted projection
    ns, st = run_tg(mesh, sem, 0.1, 0.01, 20, scheme="laplacian")
    d = sem.div(st.u[..., 0], st.u[..., 1])
    assert float(sem.norm(d)) < 1e-4
