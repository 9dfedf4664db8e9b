import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nekstab_next_tpu.mesh import box_mesh_2d
from nekstab_next_tpu.ops import SEM
from nekstab_next_tpu.postproc import (
    RunningStats,
    bf_sensitivity,
    biorthogonalize,
    delta_forcing,
    energy_budget,
    forced_tangent_response,
    lambda2_criterion,
    omega_criterion,
    q_criterion,
    steady_force_sensitivity,
    swirling_strength,
    velocity_gradient,
    vorticity,
)
from nekstab_next_tpu.stepper import NavierStokes


@pytest.fixture(scope="module")
def box():
    mesh = box_mesh_2d(4, 4, order=5, x0=-1, x1=1, y0=-1, y1=1)
    return mesh, SEM(mesh)


@pytest.fixture(scope="module")
def periodic_box():
    mesh = box_mesh_2d(6, 6, order=5, x0=0, x1=2 * np.pi, y0=0, y1=2 * np.pi,
                       periodic_x=True, periodic_y=True)
    return mesh, SEM(mesh)


def test_vortex_criteria_solid_body_rotation(box):
    mesh, sem = box
    om = 0.7
    u = jnp.asarray(np.stack([-om * mesh.y, om * mesh.x], axis=-1))
    G = velocity_gradient(sem, u)
    # interior values (polynomial field -> exact everywhere)
    assert float(jnp.max(jnp.abs(q_criterion(G) - om**2))) < 1e-10
    assert float(jnp.max(jnp.abs(lambda2_criterion(G) + om**2))) < 1e-10
    assert float(jnp.max(jnp.abs(swirling_strength(G) - om))) < 1e-10
    assert float(jnp.min(omega_criterion(G))) > 0.99
    assert float(jnp.max(jnp.abs(vorticity(sem, u) - 2 * om))) < 1e-10


def test_vortex_criteria_pure_shear(box):
    mesh, sem = box
    u = jnp.asarray(np.stack([0.5 * mesh.y, np.zeros_like(mesh.x)], axis=-1))
    G = velocity_gradient(sem, u)
    assert float(jnp.max(jnp.abs(q_criterion(G)))) < 1e-10
    assert float(jnp.max(swirling_strength(G))) < 1e-10
    assert float(jnp.max(omega_criterion(G))) < 0.51  # = 0.5 at eps->0


def test_running_stats(box):
    mesh, sem = box
    shape = mesh.x.shape
    st = RunningStats.zeros(shape, nc=2)
    u1 = jnp.ones(shape + (2,))
    st = st.update(u1, 0.5)
    assert float(jnp.max(jnp.abs(st.avg - 1.0))) < 1e-14
    u2 = 3.0 * u1
    st = st.update(u2, 0.5)
    assert float(jnp.max(jnp.abs(st.avg - 2.0))) < 1e-14
    assert float(jnp.max(jnp.abs(st.rms - 5.0))) < 1e-14  # (1 + 9)/2
    assert float(jnp.max(jnp.abs(st.variance() - 1.0))) < 1e-13
    assert float(jnp.max(jnp.abs(st.rm2 - 5.0))) < 1e-13  # uv = u*u here


def test_energy_budget_production(box):
    mesh, sem = box
    alpha = 0.3
    base = jnp.asarray(np.stack([alpha * mesh.x, -alpha * mesh.y], axis=-1))
    mode_re = jnp.asarray(np.stack([np.ones_like(mesh.x), np.zeros_like(mesh.x)], axis=-1))
    mode_im = jnp.zeros_like(mode_re)
    eb = energy_budget(sem, base, mode_re, mode_im, viscosity=0.0)
    # normalized mode: u = (1,0)/sqrt(V); P_11 = -1/2 u1^2 dU/dx = -alpha/(2V)
    tot = float(eb.total_production)
    assert abs(tot - (-alpha / 2.0)) < 1e-10


def test_energy_budget_dissipation(periodic_box):
    mesh, sem = periodic_box
    mode_re = jnp.asarray(np.stack([np.sin(mesh.x), np.zeros_like(mesh.x)], axis=-1))
    mode_im = jnp.zeros_like(mode_re)
    base = jnp.zeros_like(mode_re)
    nu = 0.02
    eb = energy_budget(sem, base, mode_re, mode_im, viscosity=nu)
    # D = nu/2 * <u, Lap u> / ||u||^2 = -nu/2 for a Fourier mode
    assert abs(float(eb.dissipation_integral) + nu / 2.0) < 1e-6


def test_biorthogonalize(box):
    mesh, sem = box
    rng = np.random.default_rng(3)
    shape = mesh.x.shape + (2,)
    d_re, d_im, a_re, a_im = (jnp.asarray(rng.standard_normal(shape)) for _ in range(4))
    d_re, d_im, a_re, a_im = biorthogonalize(sem, d_re, d_im, a_re, a_im)
    # direct pair has unit energy norm
    from nekstab_next_tpu.postproc.sensitivity import _cdot, _cnorm

    assert abs(float(_cnorm(sem, d_re, d_im)) - 1.0) < 1e-12
    re, im = _cdot(sem, a_re, a_im, d_re, d_im)
    assert abs(float(re) - 1.0) < 1e-12
    assert abs(float(im)) < 1e-12


def test_bf_sensitivity_real_mode(box):
    mesh, sem = box
    rng = np.random.default_rng(4)
    shape = mesh.x.shape + (2,)
    d_re = jnp.asarray(rng.standard_normal(shape))
    a_re = jnp.asarray(rng.standard_normal(shape))
    zero = jnp.zeros(shape)
    out = bf_sensitivity(sem, d_re, zero, a_re, zero)
    assert set(out) == {"tr", "ti", "pr", "pi", "sr", "si"}
    # real modes -> imaginary parts vanish
    scale = float(jnp.max(jnp.abs(out["sr"]))) + 1.0
    assert float(jnp.max(jnp.abs(out["ti"]))) < 1e-12 * scale
    assert float(jnp.max(jnp.abs(out["pi"]))) < 1e-12 * scale
    assert float(jnp.max(jnp.abs(out["sr"] - out["tr"] - out["pr"]))) < 1e-12 * scale


def test_delta_forcing(box):
    mesh, sem = box
    base = jnp.asarray(np.stack([np.ones_like(mesh.x), np.zeros_like(mesh.x)], axis=-1))
    fs_re = 2.0 * base
    fs_im = -1.0 * base
    dl, dw = delta_forcing(sem, base, fs_re, fs_im)
    assert float(jnp.max(jnp.abs(dl + 2.0))) < 1e-12
    assert float(jnp.max(jnp.abs(dw + 1.0))) < 1e-12


def test_forced_response_transpose_consistency(periodic_box):
    """<G f, w>_B = <f, G^T_B w>_B for the forced tangent response."""
    mesh, sem = periodic_box
    ns = NavierStokes(sem, viscosity=0.05, dt=0.01)
    rng = np.random.default_rng(5)
    shape = mesh.x.shape + (2,)
    base = jnp.zeros(shape)
    f = jnp.asarray(rng.standard_normal(shape))
    w = jnp.asarray(rng.standard_normal(shape))
    nsteps = 4

    gf, prop = forced_tangent_response(ns, base, f, nsteps)
    bm = sem.bm[..., None]
    gtw = jax.vjp(prop, f)[1](w * bm)[0] / bm

    lhs = float(jnp.sum(bm * gf * w))
    rhs = float(jnp.sum(bm * f * gtw))
    # agreement is bounded by the inner CG tolerances (custom_linear_solve
    # re-solves iteratively in the transpose), not machine precision
    assert abs(lhs - rhs) < 1e-6 * max(abs(lhs), 1e-3)
    assert float(jnp.max(jnp.abs(gf))) > 0.0


def test_steady_force_sensitivity_solves_system(box):
    # wall-bounded box: I - exp(T L) is invertible (on the periodic box the
    # constant fields are a nullspace and GMRES stagnates)
    mesh, sem = box
    ns = NavierStokes(sem, viscosity=0.05, dt=0.01)
    rng = np.random.default_rng(6)
    shape = mesh.x.shape + (2,)
    base = jnp.zeros(shape)
    f = jnp.asarray(rng.standard_normal(shape))
    nsteps = 4

    x, info = steady_force_sensitivity(ns, base, f, nsteps, k_dim=30, tol=1e-9)
    assert info["converged"], info

    # residual check: (I - M^+) x == b
    from nekstab_next_tpu.stepper.linearized import LinearizedOperator

    _, prop = forced_tangent_response(ns, base, f, nsteps)
    bm = sem.bm[..., None]
    b = jax.vjp(prop, f)[1](f * bm)[0] / bm
    op = LinearizedOperator(ns, base, nsteps=nsteps)
    res = x - op.rmatvec(x) - b
    rel = float(jnp.linalg.norm(res) / jnp.linalg.norm(b))
    assert rel < 1e-7, rel


def test_symmetric_antisymmetric_criteria():
    """Solid-body rotation: |S| = 0, |Omega| = om*sqrt(2) (reference
    'symmetric'/'antisym' vortex outputs, postproc.f90:106-144)."""
    from nekstab_next_tpu.postproc import (
        antisymmetric_criterion,
        symmetric_criterion,
    )

    om = 0.7
    G = jnp.zeros((4, 3, 3, 2, 2))
    G = G.at[..., 0, 1].set(-om).at[..., 1, 0].set(om)
    assert float(jnp.max(jnp.abs(symmetric_criterion(G)))) < 1e-14
    expect = om * np.sqrt(2.0)
    assert float(jnp.max(jnp.abs(antisymmetric_criterion(G) - expect))) < 1e-12
    # pure shear G = [[0, g], [0, 0]]: |S| = |Omega| = g/sqrt(2)
    g = 1.3
    G2 = jnp.zeros((1, 2, 2, 2, 2)).at[..., 0, 1].set(g)
    assert abs(float(symmetric_criterion(G2)[0, 0, 0]) - g / np.sqrt(2)) < 1e-12
    assert abs(float(antisymmetric_criterion(G2)[0, 0, 0]) - g / np.sqrt(2)) < 1e-12
