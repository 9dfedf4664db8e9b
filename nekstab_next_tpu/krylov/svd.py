"""Singular triplets of a matrix-free operator via the normal-equation
eigenproblem A'A v = sigma^2 v.

This is exactly the reference's transient-growth construction: the composite
map adjoint(direct(.)) (core/matvec.f90:478-495 ``transient_growth_map``) fed
to a symmetric Krylov solve — LightKrylov ``svds`` in the new API
(core/linear_stab.f90:82-119), with sigma^2 = the optimal gain G(T)."""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional

import numpy as np

from .krylov_schur import eigs
from .vector import VectorSpace


@dataclasses.dataclass
class SVDResult:
    sigma: np.ndarray  # singular values (descending)
    residuals: np.ndarray
    right: List  # right singular vectors v_i (pytrees)
    left: List  # left singular vectors u_i = A v_i / sigma_i
    n_matvecs: int


def svds(
    direct: Callable,
    adjoint: Callable,
    space: VectorSpace,
    x0,
    nsv: int = 2,
    k_dim: int = 64,
    tol: float = 1e-6,
    max_restarts: int = 30,
) -> SVDResult:
    """Leading singular triplets of A given ``direct`` (A) and ``adjoint`` (A')."""

    def normal_op(v):
        return adjoint(direct(v))

    res = eigs(
        normal_op, space, x0, k_dim=k_dim, nev=nsv, tol=tol,
        max_restarts=max_restarts,
    )
    lam = np.real(res.eigenvalues[:nsv])
    sigma = np.sqrt(np.maximum(lam, 0.0))
    right, left = [], []
    for i in range(nsv):
        re, _ = res.mode(i)  # symmetric operator: real eigenvectors
        v, _ = space.normalize(re)
        u = direct(v)
        u = space.scale(1.0 / max(sigma[i], 1e-300), u)
        right.append(v)
        left.append(u)
    return SVDResult(
        sigma=sigma,
        residuals=res.residuals[:nsv],
        right=right,
        left=left,
        n_matvecs=res.n_matvecs * 2 + 2 * nsv,
    )
