"""Krylov seed options — the reference's ``prepare_seed`` / seed dispatch
(core/eigensolvers.f90:190-230, utils.f90:361-406)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from nekstab_next_tpu.io import save_field
from nekstab_next_tpu.mesh import box_mesh_2d
from nekstab_next_tpu.mesh.mesh import BoundaryCondition as BC
from nekstab_next_tpu.ops import SEM
from nekstab_next_tpu.utils.noise import make_seed, symmetric_seed


@pytest.fixture(scope="module")
def sem():
    mesh = box_mesh_2d(4, 4, order=5, x0=0, x1=2.0, y0=-1.0, y1=1.0,
                       bc={"left": BC.DIRICHLET, "right": BC.OUTFLOW,
                           "bottom": BC.WALL, "top": BC.WALL})
    return SEM(mesh)


def _c0_defect(sem, q):
    """Max jump across element interfaces: dsavg must be a no-op on C0."""
    return float(jnp.max(jnp.abs(sem.dsavg(q) - q)))


def test_symmetric_seed(sem):
    q = symmetric_seed(sem)
    assert q.shape == np.asarray(sem.bm).shape + (2,)
    # unit energy, masked, C0
    e = sum(float(sem.inner(q[..., d], q[..., d], masked=False))
            for d in range(2))
    assert abs(e - 1.0) < 1e-12
    assert float(jnp.max(jnp.abs((1.0 - sem.vmask[..., 0]) * q[..., 0]))) == 0.0
    assert _c0_defect(sem, q) < 1e-14
    # u_x antisymmetric about the y midline (the vortex-shedding symmetry):
    # sample interior points mirrored in y
    x = np.asarray(sem.mesh.x).ravel()
    y = np.asarray(sem.mesh.y).ravel()
    u = np.asarray(q[..., 0]).ravel()
    i = np.argmin(np.abs(x - 1.0) + np.abs(y - 0.5))
    j = np.argmin(np.abs(x - x[i]) + np.abs(y + y[i]))
    assert abs(u[i] + u[j]) < 1e-10 * (abs(u[i]) + 1e-30)


def test_load_seed_roundtrip(sem, tmp_path):
    rng = np.random.default_rng(5)
    u = jnp.asarray(rng.standard_normal(np.asarray(sem.bm).shape + (2,)))
    path = os.path.join(tmp_path, "mode.npz")
    save_field(path, u, time=0.0)
    q = make_seed(sem, mode="load", path=path)
    np.testing.assert_allclose(np.asarray(q), np.asarray(sem.vmask * u))
    with pytest.raises(ValueError):
        make_seed(sem, mode="load")  # no path


def test_baseflow_seed(sem):
    base = jnp.asarray(np.stack([np.ones_like(sem.mesh.x),
                                 np.zeros_like(sem.mesh.x)], axis=-1))
    q = make_seed(sem, mode="baseflow", base_u=base)
    np.testing.assert_allclose(np.asarray(q), np.asarray(sem.vmask * base))
    with pytest.raises(ValueError):
        make_seed(sem, mode="baseflow")  # no base
    with pytest.raises(ValueError):
        make_seed(sem, mode="bogus")


def test_seed_mode_threads_through_stability_api(sem):
    """linear_stability_analysis accepts seed_mode and runs a (tiny) solve."""
    from nekstab_next_tpu.algorithms import linear_stability_analysis
    from nekstab_next_tpu.stepper import NavierStokes

    ns = NavierStokes(sem, viscosity=0.5, dt=0.02)
    base = jnp.zeros(np.asarray(sem.bm).shape + (2,))
    res = linear_stability_analysis(
        ns, base, horizon=0.1, nsteps=5, k_dim=6, nev=1, tol=1e-3,
        max_restarts=1, seed_mode="symmetric", nmodes_out=1,
    )
    assert np.isfinite(res.mu[0])
