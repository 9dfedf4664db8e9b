import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


def run_tg(mesh, sem, nu, dt, nsteps):
    u0, v0, p0 = taylor_green(mesh.x, mesh.y, 0.0, nu)
    u = jnp.stack([jnp.asarray(u0), jnp.asarray(v0)], axis=-1)
    ns = NavierStokes(sem, viscosity=nu, dt=dt)
    st = initial_state(u, p=jnp.asarray(p0))
    st = jax.jit(lambda s: ns.advance(s, nsteps))(st)
    return st


def test_taylor_green_decay(tg_setup):
    mesh, sem = tg_setup
    nu, dt, nsteps = 0.1, 0.01, 100
    st = run_tg(mesh, sem, nu, dt, nsteps)
    t = dt * nsteps
    ue, ve, _ = taylor_green(mesh.x, mesh.y, t, nu)
    uerr = float(sem.norm(st.u[..., 0] - jnp.asarray(ue)))
    unorm = float(sem.norm(jnp.asarray(ue)))
    assert uerr / unorm < 2e-5, uerr / unorm


def test_taylor_green_temporal_order(tg_setup):
    # halving dt should cut the error by ~4x (2nd-order splitting at least)
    mesh, sem = tg_setup
    nu, T = 0.1, 0.5
    errs = []
    for dt in (0.02, 0.01):
        st = run_tg(mesh, sem, nu, dt, int(round(T / dt)))
        ue, _, _ = taylor_green(mesh.x, mesh.y, T, nu)
        errs.append(float(sem.norm(st.u[..., 0] - jnp.asarray(ue))))
    rate = np.log2(errs[0] / errs[1])
    assert rate > 1.7, (errs, rate)


def test_divergence_free(tg_setup):
    mesh, sem = tg_setup
    st = run_tg(mesh, sem, 0.1, 0.01, 20)
    d = sem.div(st.u[..., 0], st.u[..., 1])
    assert float(sem.norm(d)) < 1e-4
