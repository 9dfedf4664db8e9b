import jax.numpy as jnp
import numpy as np
import pytest

from nekstab_next_tpu.mesh import box_mesh_2d, cylinder_mesh
from nekstab_next_tpu.mesh.mesh import BoundaryCondition as BC
from nekstab_next_tpu.ops import SEM, cg_solve


@pytest.fixture(scope="module")
def box():
    return box_mesh_2d(4, 3, order=6, x0=0.0, x1=2.0, y0=0.0, y1=1.5)


@pytest.fixture(scope="module")
def sem(box):
    return SEM(box)


def test_global_numbering_counts(box):
    # 4x3 elements of order 6: (4*6+1)*(3*6+1) global nodes
    assert box.nglobal == (4 * 6 + 1) * (3 * 6 + 1)


def test_mass_integrates_area(box):
    assert abs(box.integrate(np.ones_like(box.x)) - 2.0 * 1.5) < 1e-12


def test_gradient_exact_on_polynomials(sem, box):
    x = jnp.asarray(box.x)
    y = jnp.asarray(box.y)
    u = x**3 * y + 2.0 * y**2
    ux, uy = sem.grad(u)
    assert float(jnp.max(jnp.abs(ux - 3 * x**2 * y))) < 1e-10
    assert float(jnp.max(jnp.abs(uy - (x**3 + 4 * y)))) < 1e-10


def test_dssum_multiplicity(sem, box):
    ones = jnp.ones_like(jnp.asarray(box.x))
    m = sem.dssum(ones)
    assert np.allclose(np.asarray(m), box.mult)
    # dsavg leaves a continuous field unchanged
    u = jnp.asarray(box.x + 2 * box.y)
    assert float(jnp.max(jnp.abs(sem.dsavg(u) - u))) < 1e-12


def test_dsavg_idempotent_on_random(sem, box):
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal(box.x.shape))
    v = sem.dsavg(u)
    assert float(jnp.max(jnp.abs(sem.dsavg(v) - v))) < 1e-12


def test_inner_product_is_integral(sem, box):
    x = jnp.asarray(box.x)
    # integral of x^2 over [0,2]x[0,1.5] = (8/3)*1.5 = 4
    assert abs(float(sem.inner(x, x)) - 4.0) < 1e-12


def test_stiffness_symmetric(sem, box):
    rng = np.random.default_rng(1)
    u = sem.dsavg(jnp.asarray(rng.standard_normal(box.x.shape)))
    v = sem.dsavg(jnp.asarray(rng.standard_normal(box.x.shape)))
    # bilinear form a(v,u) = sum_local v . K_local u for continuous v,u
    a = float(jnp.sum(v * sem.stiffness_local(u)))
    b = float(jnp.sum(u * sem.stiffness_local(v)))
    assert abs(a - b) < 1e-10 * max(abs(a), 1.0)


def test_stiffness_matches_gradient_integral(sem, box):
    # <v, K u> == integral grad(v).grad(u) for continuous fields
    x, y = jnp.asarray(box.x), jnp.asarray(box.y)
    u = x**2 + y**2
    v = x * y
    lhs = float(jnp.sum(v * sem.stiffness_local(u)))
    ux, uy = sem.grad(u)
    vx, vy = sem.grad(v)
    rhs = float(sem.inner(vx, ux) + sem.inner(vy, uy))
    assert abs(lhs - rhs) < 1e-10


def test_poisson_manufactured_solution(box):
    # -Laplacian(u) = f on [0,2]x[0,1.5], u = sin(pi x/2) sin(pi y/1.5), u=0 on boundary
    sem = SEM(box)
    x, y = jnp.asarray(box.x), jnp.asarray(box.y)
    kx, ky = np.pi / 2.0, np.pi / 1.5
    u_exact = jnp.sin(kx * x) * jnp.sin(ky * y)
    f = (kx**2 + ky**2) * u_exact
    mask = jnp.asarray(box.tmask)

    def A(p):
        return mask * sem.dssum(sem.stiffness_local(p)) + (1 - mask) * p

    rhs = mask * sem.dssum(sem.bm * f)
    u = cg_solve(A, rhs, tol=1e-12, maxiter=2000, dot=sem.cgdot)
    err = float(sem.norm(u - u_exact) / sem.norm(u_exact))
    assert err < 5e-9  # spatial discretization error at order 6 on 4x3 elements


def test_convection_dealiased_matches_exact(sem, box):
    # For polynomial c and u the weak convection should equal the exact
    # integral computed with the collocated form on low-degree data.
    x, y = jnp.asarray(box.x), jnp.asarray(box.y)
    cx_f, cy_f = y, -x
    u = x * y
    w = sem.convect_weak(cx_f, cy_f, u)
    # compare global integral against analytic: integral of (c.grad u) over domain
    # c.grad u = y*y + (-x)*x = y^2 - x^2 ; over [0,2]x[0,1.5]: 2*1.125 - 1.5*8/3 = -1.75
    got = float(jnp.sum(w))
    assert abs(got - (-1.75)) < 1e-10


def test_cylinder_mesh_sane():
    m = cylinder_mesh(nr=4, ntheta=12, order=4, outer_radius=10.0, grading=8.0)
    assert m.nelem == 48
    # area = pi (R^2 - r^2)
    area = m.integrate(np.ones_like(m.x))
    assert abs(area - np.pi * (10.0**2 - 0.5**2)) < 1e-6 * area
    # wall nodes masked, some outflow nodes exist
    assert m.dirichlet_nodes.any() and m.outflow_nodes.any()
    assert m.has_pressure_dirichlet


def test_periodic_box_connectivity():
    m = box_mesh_2d(3, 3, order=4, x0=0, x1=2 * np.pi, y0=0, y1=2 * np.pi,
                    periodic_x=True, periodic_y=True)
    # periodic in both directions: nodes = (3*4)*(3*4)
    assert m.nglobal == 12 * 12
    sem = SEM(m)
    x = jnp.asarray(m.x)
    # sin(x) is continuous across the periodic seam: dsavg must preserve it
    u = jnp.sin(x)
    assert float(jnp.max(jnp.abs(sem.dsavg(u) - u))) < 1e-12
    # and no node should be masked (no Dirichlet boundaries at all)
    assert float(jnp.min(jnp.asarray(m.vmask))) == 1.0
