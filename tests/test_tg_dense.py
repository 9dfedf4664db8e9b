"""Ground-truth check of the full transient-growth stack.

Builds the DENSE propagator matrix of a tiny sponged BFS case with
``jax.jacfwd``, solves the generalized eigenproblem
M^T W M q = G W q (W = sponge-masked mass) restricted to the measured
subspace, and requires the matrix-free svds path to reproduce G.  This
is the end-to-end guard the Barkley comparison rests on: it exercises the
tangent propagator, the W^+-weighted adjoint, the masked seed projection,
and the Golub-Kahan svds together (round-4 diagnosis: an unmasked-adjoint
inconsistency scattered sponged TG gains by tens of percent)."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.linalg as sla

from nekstab_next_tpu.algorithms import transient_growth_analysis
from nekstab_next_tpu.cases.bfs import BackwardFacingStepCase
from nekstab_next_tpu.config import SolverConfig
from nekstab_next_tpu.stepper.linearized import LinearizedOperator


def test_tg_matches_dense_ground_truth():
    case = BackwardFacingStepCase(
        reynolds=500.0, order=3, elems_upstream=2, elems_downstream=6,
        elems_y=4, inflow_length=3.0, outflow_length=9.0,
        solver=SolverConfig(pressure_precond="schwarz"),
        sponge=True, sponge_left=1.5, sponge_right=2.5,
        sponge_strength=2.0,
    )
    ns0 = case.make_ns()
    T = 0.5
    nsteps = max(int(round(T / case.dt)), 1)
    st = ns0.make_state(case.initial_flow())
    st = jax.jit(lambda s: ns0.advance(s, 400))(st)
    base = st.u
    ns = case.make_ns(sponge_ref=base)
    op = LinearizedOperator(ns, base, nsteps=nsteps)

    M = np.asarray(
        jax.jacfwd(op._apply)(jnp.zeros_like(base))
    ).reshape(base.size, base.size)
    W = np.stack([np.asarray(case.sem.bms)] * 2, axis=-1).reshape(-1)
    free = (np.asarray(case.sem.vmask).reshape(-1) > 0) & (W > 0)
    Mff = M[np.ix_(free, free)]
    Wf = W[free]
    A = Mff.T @ (Wf[:, None] * Mff)
    G_dense = sla.eigh(0.5 * (A + A.T), np.diag(Wf), eigvals_only=True)[-1]

    res = transient_growth_analysis(
        ns, base, horizon=T, nsteps=nsteps, nsv=1, k_dim=20, tol=1e-8,
    )
    G_svds = float(res.gains[0])
    assert abs(G_svds / G_dense - 1.0) < 1e-3, (G_svds, G_dense)
