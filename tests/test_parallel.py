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
