"""Fused Pallas whole-solve CG kernels (ops/fused_cg.py, ops/exchange.py).

Runs through the Pallas interpreter on the CPU mesh; the same code path is
the TPU production hot loop (round-5 flagship: 3.2e7 dof-steps/s).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nekstab_next_tpu.config import SolverConfig
from nekstab_next_tpu.mesh import box_mesh_2d, cylinder_mesh
from nekstab_next_tpu.ops import SEM
from nekstab_next_tpu.ops.cg import pcg
from nekstab_next_tpu.ops.elliptic import make_projector
from nekstab_next_tpu.ops.exchange import build_shift_exchange
from nekstab_next_tpu.stepper import NavierStokes


# ----------------------------------------------------------------------
# shift-decomposed exchange
# ----------------------------------------------------------------------
@pytest.mark.parametrize("mesh_fn", [
    lambda: box_mesh_2d(4, 5, order=6),
    lambda: box_mesh_2d(6, 6, order=6, periodic_x=True, periodic_y=True),
    lambda: cylinder_mesh(nr=6, ntheta=12, order=6),
])
def test_exchange_matches_dssum(mesh_fn):
    # build_shift_exchange verifies itself against a bincount dssum and
    # returns None on mismatch — non-None IS the assertion; re-check here
    # on an independent random field anyway
    mesh = mesh_fn()
    n = int(np.asarray(mesh.gid).size ** 0.5)  # unused; mesh.n not stored
    sem = SEM(mesh)
    ex = build_shift_exchange(np.asarray(mesh.gid), sem.n)
    assert ex is not None
    rng = np.random.default_rng(7)
    u = rng.standard_normal((sem.nelem, sem.n, sem.n))
    x = np.zeros((ex.n2p, ex.nep))
    x[: sem.n * sem.n, : sem.nelem] = u.reshape(sem.nelem, -1).T
    got = ex.apply_np(x)[: sem.n * sem.n, : sem.nelem].T.reshape(u.shape)
    ref = np.asarray(sem.dssum(jnp.asarray(u)))
    assert np.allclose(got, ref, rtol=1e-10, atol=1e-9)


def test_exchange_masked_bfs_mesh():
    # the BFS case carves elements out of the box; its renumbered exchange
    # must still decompose (round-5: 26 shift groups)
    from nekstab_next_tpu.cases.bfs import BackwardFacingStepCase

    case = BackwardFacingStepCase()
    ex = build_shift_exchange(np.asarray(case.mesh.gid), case.sem.n)
    assert ex is not None


# ----------------------------------------------------------------------
# kernel families (interpret mode)
# ----------------------------------------------------------------------
@pytest.fixture(scope="module")
def cylsem():
    mesh = cylinder_mesh(nr=4, ntheta=8, order=6)
    return SEM(mesh, dtype=jnp.float32)


def test_fused_helmholtz_cg_matches_pcg(cylsem):
    from nekstab_next_tpu.ops.fused_cg import FusedHelmholtzCG

    sem = cylsem
    h1, h2 = 0.0167, 100.0
    rng = np.random.default_rng(0)
    rhs = jnp.asarray(rng.standard_normal(sem.bm.shape + (2,)), jnp.float32)
    P = make_projector(sem, sem.vmask)
    rhsP = P(rhs)

    def helm(w):
        return jnp.stack(
            [sem.helmholtz_local(w[..., d], h1, h2) for d in range(2)],
            axis=-1,
        )

    A_sub = lambda x: P(helm(x))
    M_sub = lambda r: P(sem.fdm_apply(r, h1, h2))
    dot = lambda a, b: jnp.sum(a * b)
    x_ref = pcg(A_sub, rhsP, precond=M_sub, tol=1e-6, maxiter=10, dot=dot)

    fused = FusedHelmholtzCG(sem, sem.vmask, maxiter=10, tol=1e-6)
    x_f = fused.solve(rhsP, h1, h2)
    rel = float(jnp.linalg.norm(x_f - x_ref) / jnp.linalg.norm(x_ref))
    assert rel < 1e-5, rel


def test_fused_pressure_cg_converged_solution(cylsem):
    from nekstab_next_tpu.ops.fused_cg import FusedPressureCG

    sem = cylsem
    sem.setup_pressure_blocks()
    rng = np.random.default_rng(0)
    u_ex = jax.ShapeDtypeStruct(sem.bm.shape + (2,), sem.dtype)
    div_w = lambda u: sem.div_to_p(u)
    grad_wt = jax.linear_transpose(div_w, u_ex)

    def E_op(q):
        g = grad_wt(q)[0]
        m = sem.vmask * (
            sem.binv_assembled[..., None] * sem.dssum(sem.vmask * g)
        )
        return div_w(m)

    rhs = jnp.asarray(rng.standard_normal(sem.p_shape), jnp.float32)
    dot = lambda a, b: jnp.sum(a * b)
    x_ref = pcg(E_op, rhs, precond=sem.pressure_precond_block, tol=1e-6,
                maxiter=300, dot=dot)
    fused = FusedPressureCG(sem, maxiter=300, tol=1e-6)
    x_f = fused.solve(rhs)
    # converged solutions must agree regardless of preconditioner-path
    # differences (the kernel's coarse level runs its 0/1 scatters in bf16)
    rel = float(jnp.linalg.norm(x_f - x_ref) / jnp.linalg.norm(x_ref))
    assert rel < 1e-4, rel


# ----------------------------------------------------------------------
# stepper integration
# ----------------------------------------------------------------------
def test_stepper_fused_matches_standard():
    mesh = cylinder_mesh(nr=4, ntheta=8, order=6)
    outs = {}
    for fused in (False, True):
        sem = SEM(mesh, dtype=jnp.float32)
        solver = SolverConfig(
            pressure_tol=1e-6, velocity_tol=1e-7,
            pressure_maxiter=80, velocity_maxiter=40,
            pressure_precond="block", fused_solves=fused,
        )
        ns = NavierStokes(sem, viscosity=1.0 / 40.0, dt=0.01, solver=solver)
        if fused:
            assert ns._fused_v is not None and ns._fused_p is not None
        rng = np.random.default_rng(3)
        u = sem.vmask * jnp.asarray(
            rng.standard_normal(sem.bm.shape + (2,)), jnp.float32
        )
        st = ns.make_state(0.05 * u)
        st = jax.jit(lambda s: ns.advance(s, 3))(st)
        outs[fused] = np.asarray(st.u)
    rel = (np.linalg.norm(outs[True] - outs[False])
           / np.linalg.norm(outs[False]))
    # near-converged inner solves: both paths land on the same step output
    # to f32 accumulation accuracy
    assert rel < 5e-5, rel


def test_stepper_fused_tangent_matches_standard():
    # the tangent (jvp) of the step re-solves through the SAME fused solve
    # callback — linearized propagators must agree between paths
    from nekstab_next_tpu.stepper.linearized import LinearizedOperator

    mesh = cylinder_mesh(nr=4, ntheta=8, order=6)
    outs = {}
    for fused in (False, True):
        sem = SEM(mesh, dtype=jnp.float32)
        solver = SolverConfig(
            pressure_tol=1e-6, velocity_tol=1e-7,
            pressure_maxiter=80, velocity_maxiter=40,
            pressure_precond="block", fused_solves=fused,
        )
        ns = NavierStokes(sem, viscosity=1.0 / 40.0, dt=0.01, solver=solver)
        base = jnp.zeros(sem.bm.shape + (2,), jnp.float32)
        base = base.at[..., 0].set(1.0 - sem.vmask[..., 0] * 0.0)
        op = LinearizedOperator(ns, sem.vmask * base, nsteps=3)
        rng = np.random.default_rng(5)
        q = sem.vmask * jnp.asarray(
            rng.standard_normal(sem.bm.shape + (2,)), jnp.float32
        )
        outs[fused] = np.asarray(op.matvec(q))
    rel = (np.linalg.norm(outs[True] - outs[False])
           / np.linalg.norm(outs[False]))
    assert rel < 1e-4, rel
