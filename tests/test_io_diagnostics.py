import os

import jax.numpy as jnp
import numpy as np
import pytest

from nekstab_next_tpu.io import (
    ArnoldiCheckpoint,
    load_field,
    read_nek_field,
    save_field,
)
from nekstab_next_tpu.mesh import box_mesh_2d
from nekstab_next_tpu.mesh.cylinder import cylinder_mesh
from nekstab_next_tpu.mesh.mesh import BoundaryCondition as BC
from nekstab_next_tpu.ops import SEM
from nekstab_next_tpu.utils.diagnostics import (
    boundary_quadrature,
    periods_from_signal,
    surface_force_and_torque,
    total_energy,
    total_enstrophy,
    zero_crossings,
)

REF_BF = "/root/reference/examples/cylinder/BF_1cyl0.f00001"


def test_field_roundtrip(tmp_path):
    u = np.random.default_rng(0).standard_normal((4, 5, 5, 2))
    p = np.random.default_rng(1).standard_normal((4, 5, 5))
    path = save_field(str(tmp_path / "BF_test.npz"), u, p=p, time=3.25,
                      reynolds=60.0, mode="newton")
    f = load_field(path)
    assert np.allclose(f.u, u)
    assert np.allclose(f.p, p)
    assert f.time == 3.25
    assert f.meta["reynolds"] == 60.0
    assert f.meta["mode"] == "newton"


def test_arnoldi_checkpoint_roundtrip(tmp_path):
    ck = ArnoldiCheckpoint(str(tmp_path), session="t")
    Q = np.random.default_rng(2).standard_normal((6, 4, 5, 5, 2))
    H = np.random.default_rng(3).standard_normal((6, 5))
    ck.save([Q], H, ncols=3, restart=2)
    leaves, H2, ncols, meta = ck.load()
    assert np.allclose(leaves[0], Q)
    assert np.allclose(H2, H)
    assert ncols == 3
    assert int(meta["restart"]) == 2
    ck.clear()
    assert ck.load() is None


@pytest.mark.skipif(not os.path.exists(REF_BF), reason="reference fixture absent")
def test_read_reference_base_flow():
    f = read_nek_field(REF_BF)
    assert f.nx == f.ny == 6 and f.nz == 1
    assert f.nelem == 1996
    assert f.rdcode.upper().startswith("XUP")
    assert f.time == pytest.approx(1.0)
    r = np.sqrt(f.x**2 + f.y**2)
    # cylinder of diameter 1 at the origin inside a larger domain
    assert r.min() == pytest.approx(0.5, rel=1e-6)
    assert r.max() > 10.0
    assert np.all(np.isfinite(f.u))
    speed = np.sqrt((f.u**2).sum(-1))
    assert 0.9 < speed.max() < 3.0  # freestream ~1, some acceleration
    # no-slip on the cylinder surface
    on_wall = r < 0.5 + 1e-10
    assert speed[on_wall].max() < 1e-8


def test_energy_enstrophy_taylor_green():
    mesh = box_mesh_2d(8, 8, order=5, x0=0, x1=2 * np.pi, y0=0, y1=2 * np.pi,
                       periodic_x=True, periodic_y=True)
    sem = SEM(mesh)
    u = jnp.asarray(np.stack([-np.cos(mesh.x) * np.sin(mesh.y),
                              np.sin(mesh.x) * np.cos(mesh.y)], axis=-1))
    E = float(total_energy(sem, u))
    Z = float(total_enstrophy(sem, u))
    assert abs(E - np.pi**2) < 1e-8
    assert abs(Z - 2 * np.pi**2) < 1e-6


def test_surface_force_shear_flow():
    mesh = box_mesh_2d(4, 4, order=5, bc={
        "bottom": BC.WALL, "top": BC.DIRICHLET,
        "left": BC.DIRICHLET, "right": BC.DIRICHLET,
    })
    sem = SEM(mesh)
    nu = 0.07
    u = jnp.asarray(np.stack([mesh.y, np.zeros_like(mesh.y)], axis=-1))
    p = jnp.zeros(mesh.x.shape)
    bq = boundary_quadrature(mesh, tags=(BC.WALL,))
    fx, fy, mz = surface_force_and_torque(sem, bq, u, p, viscosity=nu)
    # traction on the bottom wall from the fluid above: t = (nu, 0), L = 1
    assert abs(float(fx) - nu) < 1e-10
    assert abs(float(fy)) < 1e-10


def test_surface_force_pressure_on_cylinder():
    mesh = cylinder_mesh(nr=8, ntheta=24, order=5, outer_radius=5.0)
    sem = SEM(mesh)
    u = jnp.zeros(mesh.x.shape + (2,))
    p = jnp.asarray(-mesh.x)
    bq = boundary_quadrature(mesh, tags=(BC.WALL,))
    fx, fy, mz = surface_force_and_torque(sem, bq, u, p, viscosity=0.0)
    # F = -closed-integral p n ds = area of body for p = -x: pi r^2, r = 0.5
    assert abs(float(fx) - np.pi * 0.25) < 1e-6
    assert abs(float(fy)) < 1e-10
    assert abs(float(mz)) < 1e-10


def test_zero_crossings_period():
    t = np.linspace(0, 20, 4001)
    s = np.sin(2 * np.pi * t / 3.0 + 0.3)
    zc = zero_crossings(t, s)
    periods = np.diff(zc)
    assert np.allclose(periods, 3.0, atol=1e-4)
    p2 = periods_from_signal(t, s + 5.0)  # mean-shifted
    assert np.allclose(p2, 3.0, atol=1e-4)


def test_nek_field_writer_roundtrip(tmp_path):
    """write_nek_field emits a '#std' file our own reader (and Nek's
    toolchain) can ingest — the reference's outpost analog."""
    import os

    from nekstab_next_tpu.io.nek import nek_to_layout, write_nek_field
    from nekstab_next_tpu.mesh import box_mesh_2d

    mesh = box_mesh_2d(3, 2, order=4, x0=0, x1=3, y0=0, y1=2)
    rng = np.random.default_rng(3)
    u = rng.standard_normal(mesh.x.shape + (2,))
    p = rng.standard_normal(mesh.x.shape)
    path = os.path.join(tmp_path, "BF_test0.f00001")
    write_nek_field(path, u=u, p=p, x=mesh.x, y=mesh.y, time=2.5, istep=7)

    f = read_nek_field(path)
    assert f.ndim == 2 and f.nelem == mesh.nelem
    assert abs(f.time - 2.5) < 1e-12 and f.istep == 7
    assert f.rdcode.upper().startswith("XUP")
    np.testing.assert_allclose(nek_to_layout(f.x), mesh.x, atol=1e-13)
    np.testing.assert_allclose(nek_to_layout(f.u), u, atol=1e-13)
    np.testing.assert_allclose(nek_to_layout(f.p), p, atol=1e-13)


def test_probe_locator():
    """locate_probes = the reference's pointcheck (utils.f90:5-27)."""
    from nekstab_next_tpu.mesh import box_mesh_2d
    from nekstab_next_tpu.utils.diagnostics import locate_probes, probe_values

    mesh = box_mesh_2d(4, 4, order=5, x0=0, x1=1, y0=0, y1=1)
    locs = locate_probes(mesh, [(0.51, 0.52), (0.0, 0.0)])
    # sampled coordinates must be the nearest grid nodes
    xs = probe_values(mesh.x, locs)
    ys = probe_values(mesh.y, locs)
    assert abs(xs[0] - 0.51) < 0.55 / 4 and abs(ys[0] - 0.52) < 0.55 / 4
    assert xs[1] == 0.0 and ys[1] == 0.0 and locs[1][2] == 0.0
    # consistency: distance equals |(x,y) - p|
    d = np.hypot(xs[0] - 0.51, ys[0] - 0.52)
    assert abs(d - locs[0][2]) < 1e-14
    # vector sampling keeps components
    u = np.stack([mesh.x, mesh.y], axis=-1)
    uv = probe_values(u, locs, vector=True)
    assert uv.shape == (2, 2) and uv[1, 0] == 0.0


def test_define_objects_two_bodies():
    """Multi-object torque machinery (reference nekStab_define_obj +
    per-object drgtrq, core/utils.f90:718-895): two immersed blocks in a
    channel partition into two objects whose forces sum to the
    whole-boundary force."""
    import numpy as np

    from nekstab_next_tpu.mesh import box_mesh_2d
    from nekstab_next_tpu.ops.core import SEM
    from nekstab_next_tpu.utils import define_objects

    mesh = box_mesh_2d(
        8, 4, order=4, x0=0.0, x1=8.0, y0=0.0, y1=4.0,
        bc={"left": BC.DIRICHLET, "right": BC.OUTFLOW,
            "bottom": BC.DIRICHLET, "top": BC.DIRICHLET},
        mask=lambda xc, yc: (1.0 < xc < 2.0 or 5.0 < xc < 6.0)
        and 1.0 < yc < 2.0,
        mask_bc=BC.WALL,
    )
    sem = SEM(mesh)
    objs = define_objects(mesh, tags=(BC.WALL,))
    assert len(objs) == 2
    # objects are spatially separated at x ~ 1.5 and x ~ 5.5
    mids = sorted(
        float(np.mean(mesh.x[o.elems[:, None], o.ii, o.jj])) for o in objs
    )
    assert mids[0] < 3.0 < mids[1]

    # per-object forces sum to the whole-boundary force for any fields
    rng = np.random.default_rng(5)
    u = jnp.asarray(rng.standard_normal(mesh.x.shape + (2,)))
    p = jnp.asarray(rng.standard_normal(sem.p_shape))
    bq_all = boundary_quadrature(mesh, tags=(BC.WALL,))
    tot = surface_force_and_torque(sem, bq_all, u, p, viscosity=0.01)
    per = [surface_force_and_torque(sem, o, u, p, viscosity=0.01)
           for o in objs]
    for c in range(3):
        assert abs(sum(float(f[c]) for f in per) - float(tot[c])) < 1e-12
