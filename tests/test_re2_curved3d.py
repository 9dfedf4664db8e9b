"""3-D curved .re2 geometry: 'C'/'m' edge records and 's' sphere faces,
blended by 3-D Gordon-Hall transfinite interpolation (the equivalent of
Nek5000's genxyz.f arcsrf/sphsrf that the reference inherits), plus the
.re2 writer round-trip."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nekstab_next_tpu.mesh.mesh import BoundaryCondition as BC
from nekstab_next_tpu.mesh.re2 import Re2Data, mesh3_from_re2, read_re2, write_re2
from nekstab_next_tpu.ops import SEM3


def _ring_re2(path, ntheta=12, r1=1.0, r2=2.0, h=1.0):
    """Extruded annulus: ntheta hexes around a full circle, circular 'C'
    edges on the inner/outer surfaces at both z-levels, wall BCs on the
    curved surfaces and z-ends."""
    th = np.linspace(0.0, 2 * np.pi, ntheta + 1)
    corners = np.zeros((ntheta, 8, 3))
    curves = {}
    bcs = {}
    for e in range(ntheta):
        t0, t1 = th[e], th[e + 1]
        # corner order (xi = radial, eta = angular, zeta = z) keeps the
        # Jacobian positive: r^ x theta^ = +z^
        ring = [
            (r1 * np.cos(t0), r1 * np.sin(t0)),
            (r2 * np.cos(t0), r2 * np.sin(t0)),
            (r2 * np.cos(t1), r2 * np.sin(t1)),
            (r1 * np.cos(t1), r1 * np.sin(t1)),
        ]
        for k, (x, y) in enumerate(ring):
            corners[e, k] = (x, y, 0.0)
            corners[e, k + 4] = (x, y, h)
        # outer arcs (edges c1->c2, c5->c6) run CCW: center left -> +r2;
        # inner arcs (c3->c0, c7->c4) run CW: center right -> -r1
        for edge, rad in ((1, r2), (3, -r1), (5, r2), (7, -r1)):
            curves[(e, edge)] = ("C", np.array([rad, 0, 0, 0, 0.0]))
        # preprocessor faces: 4 (sd=3) = xi- inner, 2 (sd=1) = xi+ outer,
        # 5/6 = zeta-/zeta+ z ends; eta faces are the interior seam
        bcs[(e, 3)] = ("W", np.zeros(5))
        bcs[(e, 1)] = ("W", np.zeros(5))
        bcs[(e, 4)] = ("W", np.zeros(5))
        bcs[(e, 5)] = ("W", np.zeros(5))
    data = Re2Data(nelem=ntheta, ndim=3, corners=corners, curves=curves,
                   bcs=bcs)
    write_re2(path, data)
    return data


def _shell_re2(path, r1=1.0, r2=2.0, nt=2):
    """Spherical-shell patch: nt x nt hexes of a cubed-sphere +z panel,
    radial extent [r1, r2], 's' records on the inner and outer faces."""
    a = np.linspace(-0.4, 0.4, nt + 1)
    nelem = nt * nt
    corners = np.zeros((nelem, 8, 3))
    curves = {}
    bcs = {}
    e = 0
    for i in range(nt):
        for j in range(nt):
            quad = [
                (a[i], a[j]), (a[i + 1], a[j]),
                (a[i + 1], a[j + 1]), (a[i], a[j + 1]),
            ]
            for k, (x, y) in enumerate(quad):
                d = np.array([x, y, 1.0])
                d /= np.linalg.norm(d)
                corners[e, k] = r1 * d
                corners[e, k + 4] = r2 * d
            # preprocessor face 5 (index 4) = zeta- (inner sphere),
            # face 6 (index 5) = zeta+ (outer sphere)
            curves[(e, 4)] = ("s", np.array([r1, 0.0, 0.0, 0.0, 0.0]))
            curves[(e, 5)] = ("s", np.array([r2, 0.0, 0.0, 0.0, 0.0]))
            for f in range(6):
                bcs[(e, f)] = ("W", np.zeros(5))
            e += 1
    data = Re2Data(nelem=nelem, ndim=3, corners=corners, curves=curves,
                   bcs=bcs)
    write_re2(path, data)
    return data


def test_write_read_roundtrip(tmp_path):
    path = os.path.join(tmp_path, "ring.re2")
    data = _ring_re2(path)
    back = read_re2(path)
    assert back.nelem == data.nelem and back.ndim == 3
    np.testing.assert_allclose(back.corners, data.corners, atol=1e-14)
    assert set(back.curves) == set(data.curves)
    ct, p = back.curves[(0, 1)]
    assert ct == "C" and abs(p[0] - 2.0) < 1e-14
    assert back.bcs[(0, 3)][0] == "W"


def test_curved_ring_geometry(tmp_path):
    path = os.path.join(tmp_path, "ring.re2")
    _ring_re2(path)
    order = 6
    mesh = mesh3_from_re2(path, order=order)
    r = np.sqrt(mesh.x**2 + mesh.y**2)
    # every GLL point of the exact extruded annulus lies in [r1, r2], and
    # the curved surfaces are exact circles
    assert r.min() > 1.0 - 1e-10 and r.max() < 2.0 + 1e-10
    assert abs(r[:, 0, :, :].min() - 1.0) < 1e-12  # xi- = inner surface
    assert abs(r[:, 0, :, :].max() - 1.0) < 1e-12
    assert abs(r[:, -1, :, :].min() - 2.0) < 1e-12
    # positive Jacobians everywhere + spectral-accurate annulus volume
    sem = SEM3(mesh)
    assert float(np.min(np.asarray(mesh.jac))) > 0.0
    vol = float(sem.volume())
    exact = np.pi * (4.0 - 1.0) * 1.0
    assert abs(vol - exact) < 1e-6 * exact
    # the O-seam merged: the mesh is C0 (dsavg is a no-op on coordinates)
    xj = jnp.asarray(mesh.x)
    assert float(jnp.max(jnp.abs(sem.dsavg(xj) - xj))) < 1e-12


def test_sphere_shell_geometry(tmp_path):
    path = os.path.join(tmp_path, "shell.re2")
    _shell_re2(path)
    mesh = mesh3_from_re2(path, order=5)
    r = np.sqrt(mesh.x**2 + mesh.y**2 + mesh.z**2)
    # inner/outer faces land exactly on the spheres; interior in between
    assert np.abs(r[:, :, :, 0] - 1.0).max() < 1e-12
    assert np.abs(r[:, :, :, -1] - 2.0).max() < 1e-12
    assert r.min() > 1.0 - 1e-10 and r.max() < 2.0 + 1e-10
    assert float(np.min(np.asarray(mesh.jac))) > 0.0
    # neighboring panels share projected edges -> assembled mesh is C0
    sem = SEM3(mesh)
    xj = jnp.asarray(mesh.x)
    assert float(jnp.max(jnp.abs(sem.dsavg(xj) - xj))) < 1e-12


def test_curved_ring_dns_step(tmp_path):
    """VERDICT gate: a curved 3-D fixture loads, assembles, and DNS steps."""
    from nekstab_next_tpu.stepper import NavierStokes

    path = os.path.join(tmp_path, "ring.re2")
    _ring_re2(path, ntheta=8)
    mesh = mesh3_from_re2(path, order=4)
    sem = SEM3(mesh)
    ns = NavierStokes(sem, viscosity=0.05, dt=5e-3)
    # swirling initial condition, masked to the homogeneous BC space
    th = np.arctan2(mesh.y, mesh.x)
    u0 = np.stack([-np.sin(th), np.cos(th), np.zeros_like(th)], axis=-1)
    u0 = sem.vmask * jnp.asarray(u0)
    e0 = float(sum(sem.inner(u0[..., d], u0[..., d]) for d in range(3)))
    st = ns.make_state(u0)
    st = jax.jit(lambda s: ns.advance(s, 3))(st)
    assert bool(jnp.isfinite(st.u).all())
    # no-slip walls + viscosity: energy must not grow
    e1 = float(sum(sem.inner(st.u[..., d], st.u[..., d]) for d in range(3)))
    assert e1 < e0
    # strong divergence sits at the P_{N-2} spatial floor (~1e-2 at this
    # coarse curved resolution; the WEAK divergence is what the scheme
    # controls — see examples/taylor_green.py expectations)
    div = sem.divv(st.u)
    assert float(jnp.sqrt(sem.inner(div, div))) < 0.1
