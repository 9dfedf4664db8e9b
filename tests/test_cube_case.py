import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.sharding import PartitionSpec as P

from nekstab_next_tpu.algorithms import transient_growth_analysis
from nekstab_next_tpu.cases.cube import CubeRoughnessCase
from nekstab_next_tpu.mesh import box_mesh_3d
from nekstab_next_tpu.parallel import ShardedContext
from nekstab_next_tpu.stepper import NavierStokes, initial_state


@pytest.fixture(scope="module")
def cube():
    # tiny instance: 6x2x2 lattice minus the cube element
    return CubeRoughnessCase(
        reynolds=200.0, h=1.0, lx=6.0, ly=2.0, lz=2.0, cube_x=2.5, cube_z=0.5,
        nx=6, ny=2, nz=2, order=4, delta=1.0,
    )


def test_cube_mesh_carved(cube):
    m = cube.mesh
    assert m.nelem == 6 * 2 * 2 - 1
    # carved faces became walls: no-slip nodes exist above the floor
    wall = m.dirichlet_nodes
    assert wall.any()
    # initial flow respects BCs and is finite
    u0 = cube.initial_flow()
    assert bool(jnp.all(jnp.isfinite(u0)))
    floor = np.isclose(m.y, 0.0)
    assert float(jnp.max(jnp.abs(u0[floor]))) < 1e-12


def test_cube_dns_steps(cube):
    ns = cube.make_ns()
    st = ns.make_state(cube.initial_flow())
    out = jax.jit(lambda s: ns.advance(s, 5))(st)
    assert bool(jnp.all(jnp.isfinite(out.u)))
    cfl = float(cube.sem.cfl(out.u, ns.dt))
    assert cfl < 2.0


def test_cube_transient_growth_smoke(cube):
    """3-D transient growth through the full svds path (BASELINE config 5)."""
    ns = cube.make_ns()
    base = cube.initial_flow()
    res = transient_growth_analysis(
        ns, base, horizon=5 * ns.dt, nsteps=5, nsv=1, k_dim=6, tol=1e-8,
    )
    assert res.gains.shape[0] >= 1
    assert np.isfinite(res.gains[0])
    assert res.gains[0] > 0.0


def test_sharded_3d_step_matches_single_device():
    assert len(jax.devices()) == 8
    L = 2 * np.pi
    mesh = box_mesh_3d(4, 2, 1, order=3, x1=L, y1=L, z1=L,
                       periodic_x=True, periodic_y=True, periodic_z=True)
    u0 = jnp.asarray(np.stack([
        -np.cos(mesh.x) * np.sin(mesh.y),
        np.sin(mesh.x) * np.cos(mesh.y),
        np.zeros_like(mesh.x),
    ], axis=-1))
    nu, dt, nsteps = 0.1, 0.01, 4

    from nekstab_next_tpu.ops import SEM3

    sem = SEM3(mesh)
    ns = NavierStokes(sem, viscosity=nu, dt=dt)
    ref = jax.jit(lambda s: ns.advance(s, nsteps))(ns.make_state(u0))

    ctx = ShardedContext(mesh, viscosity=nu, dt=dt)
    adv = ctx.compile(
        lambda ns_l, st: ns_l.advance(st, nsteps),
        in_specs=(ctx.state_spec(),),
        out_specs=ctx.state_spec(),
    )
    out = adv(ctx.shard_state(ns.make_state(u0)))
    assert float(jnp.max(jnp.abs(out.u - ref.u))) < 1e-10
