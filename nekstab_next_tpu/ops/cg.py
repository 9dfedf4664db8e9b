"""Matrix-free preconditioned conjugate gradient + implicit-solve wrapper.

The inner elliptic solves (pressure Poisson, velocity Helmholtz — the
reference gets these from Nek5000 inside ``nek_advance``) are wrapped in
``lax.custom_linear_solve`` so that:

* ``jax.jvp`` of a time step re-solves the *same* SPD system for the tangent
  (exact linearized step, no differentiation through CG iterations), and
* ``jax.linear_transpose`` of a step re-solves the same symmetric system —
  giving the exact discrete adjoint of the propagator.

This is the TPU-native replacement for the reference's hand-written
linearized/adjoint solvers (Nek ``ifpert/ifadj``, SURVEY.md section 2.2).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def pcg(
    operator: Callable,
    b,
    precond: Optional[Callable] = None,
    tol: float = 1e-8,
    maxiter: int = 500,
    dot: Optional[Callable] = None,
    x0=None,
    return_iters: bool = False,
):
    """Preconditioned CG on an SPD operator over an arbitrary pytree.

    ``dot`` must be the *global* inner product (psum under SPMD).  Returns the
    solution pytree (or ``(x, niter)`` when ``return_iters``).  Fixed-shape
    ``lax.while_loop`` with early exit on ||r|| <= tol * ||b||.
    """
    if precond is None:
        precond = lambda r: r
    if dot is None:
        dot = lambda a, c: sum(
            jnp.vdot(x, y) for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(c))
        )
    add = lambda a, c, s: jax.tree.map(lambda x, y: x + s * y, a, c)

    bnorm = jnp.sqrt(dot(b, b))
    atol2 = (tol * jnp.maximum(bnorm, 1e-300)) ** 2

    if x0 is None:
        x = jax.tree.map(jnp.zeros_like, b)
        r = b
    else:
        x = x0
        r = add(b, operator(x0), -1.0)
    z = precond(r)
    rz = dot(r, z)
    p = z

    def cond(carry):
        _, r, _, _, k = carry
        return jnp.logical_and(k < maxiter, dot(r, r) > atol2)

    def body(carry):
        x, r, p, rz, k = carry
        Ap = operator(p)
        alpha = rz / dot(p, Ap)
        x = add(x, p, alpha)
        r = add(r, Ap, -alpha)
        z = precond(r)
        rz_new = dot(r, z)
        beta = rz_new / rz
        p = add(z, p, beta)
        return (x, r, p, rz_new, k + 1)

    x, r, p, rz, k = jax.lax.while_loop(cond, body, (x, r, p, rz, jnp.array(0)))
    if return_iters:
        return x, k
    return x


def cg_solve(
    operator: Callable,
    b,
    precond: Optional[Callable] = None,
    tol: float = 1e-8,
    maxiter: int = 500,
    dot: Optional[Callable] = None,
    project: Optional[Callable] = None,
    inner_op: Optional[Callable] = None,
):
    """Solve the SPD system A x = b via ``lax.custom_linear_solve``.

    ``project`` (optional) is an idempotent symmetric projection applied to
    both RHS and solution — used to remove the nullspace of the pure-Neumann
    pressure Poisson operator (constant mode).

    ``inner_op`` (optional) is ``(A_sub, P, M_sub)``: a cheaper operator
    equal to ``operator`` on ``range(P)`` (an invariant subspace on whose
    complement ``operator`` is the identity), the idempotent symmetric
    projector itself, and a preconditioner mapping ``range(P)`` into itself.
    The CG iteration then runs entirely in ``range(P)`` with ``A_sub``/
    ``M_sub``, and the complement part of the RHS passes through unchanged —
    this drops redundant gather-scatter projections (the dominant
    per-iteration cost on TPU) from every iteration.  ``operator`` remains
    what JAX differentiates/transposes (the correctness anchor); the solve
    handles arbitrary RHS (tangent and cotangent solves included) by
    splitting it across the subspace first."""

    def solve(mv, rhs):
        if inner_op is not None:
            A_sub, P, M_sub = inner_op
            rP = P(rhs)
            comp = jax.tree.map(jnp.subtract, rhs, rP)
            if project is not None:
                rP = project(rP)
            x = pcg(A_sub, rP, precond=M_sub, tol=tol, maxiter=maxiter,
                    dot=dot)
            if project is not None:
                x = project(x)
            return jax.tree.map(jnp.add, x, comp)
        if project is not None:
            rhs = project(rhs)
        x = pcg(mv, rhs, precond=precond, tol=tol, maxiter=maxiter, dot=dot)
        if project is not None:
            x = project(x)
        return x

    return jax.lax.custom_linear_solve(operator, b, solve, symmetric=True)
