"""Library-style stability analyses (the reference's new LightKrylov API).

Rebuilds core/linear_stab.f90:

* ``linear_stability_analysis(mode='direct'|'adjoint', floquet=...)`` —
  Krylov-Schur on the exponential propagator (:12-80), eigenvalues reported
  both in the propagator plane (mu) and log-mapped to the NS plane
  lambda = log(mu)/T (the reference's ``log_transform``,
  core/eigensolvers.f90:860-869);
* ``transient_growth_analysis`` — optimal gain G(T) = sigma^2 via singular
  triplets of the propagator (:82-119), the composite adjoint(direct(.))
  being the reference's ``transient_growth_map`` (core/matvec.f90:478-495);
* ``resolvent_analysis`` — forced-response gains (see resolvent.py).

The orthogonalization inner product is the sponge-masked energy product
<u,v>_{bm1s} exactly as the reference's ``k_dot`` (core/krylov_subspace.f90:
26-60 with the bm1s weight zeroed in the sponge, core/forcing.f90:100-104).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..krylov.krylov_schur import EigenResult, eigs
from ..krylov.svd import SVDResult, svds
from ..krylov.vector import VectorSpace
from ..stepper.linearized import FloquetOperator, LinearizedOperator
from ..stepper.navier_stokes import NavierStokes
from ..utils.noise import velocity_noise


def velocity_space(sem, masked: bool = True) -> VectorSpace:
    """Energy inner product over velocity fields (the reference's k_dot)."""

    def dot(a, b):
        return sum(
            sem.inner(a[..., d], b[..., d], masked=masked)
            for d in range(a.shape[-1])
        )

    return VectorSpace(dot)


def coupled_space(sem, masked: bool = True) -> VectorSpace:
    """Energy inner product over coupled (velocity, scalars) tuples — the
    reference's k_dot with its temperature/passive-scalar contributions
    (core/krylov_subspace.f90:26-60 sums glsc3 over u,v,w and t(:,1..nof))."""

    def dot(a, b):
        au, aT = a
        bu, bT = b
        return sem.inner(au, bu, masked=masked) + sem.inner(aT, bT, masked=masked)

    return VectorSpace(dot)


def gradient_energy_norm(sem, u) -> float:
    """Energy norm of the velocity gradient of a (unit-norm) mode — the
    reference's spurious-eigenvector detector ``norm_grad``
    (core/utils.f90:446-486; modes with gradient norm > 1.1 x typical are
    rejected in ``outpost_ks``, eigensolvers.f90:587-595).  Spurious Arnoldi
    vectors are rough (noise-dominated), so their H1 content is anomalously
    high relative to physical modes."""
    total = 0.0
    for d in range(u.shape[-1]):
        g = sem.gradv(u[..., d])
        total += float(sem.inner(g, g))
    return float(np.sqrt(total))


@dataclasses.dataclass
class StabilityResult:
    mu: np.ndarray  # propagator-plane eigenvalues (complex)
    lam: np.ndarray  # NS-plane rates lambda = log(mu)/T
    residuals: np.ndarray
    modes: List[Tuple[jnp.ndarray, jnp.ndarray]]  # (re, im) velocity fields
    horizon: float
    n_matvecs: int
    eigresult: EigenResult
    mode_gradient_norms: Optional[np.ndarray] = None  # H1 spurious detector
    spurious: Optional[np.ndarray] = None  # bool mask (gradient-norm filter)

    def leading(self, i: int = 0) -> complex:
        return complex(self.lam[i])


def _make_operator(ns, base_u, base_p, nsteps, floquet, base_T=None):
    if floquet:
        return FloquetOperator(ns, base_u, base_p=base_p, nsteps=nsteps,
                               base_T=base_T)
    if ns.solver.finite_difference:
        # Frechet-by-FD cross-check path (reference matvec.f90:246-379);
        # direct matvec only — FD has no adjoint
        from ..stepper.linearized import FiniteDifferenceOperator

        return FiniteDifferenceOperator(
            ns, base_u, nsteps=nsteps, order=ns.solver.fd_order,
        )
    return LinearizedOperator(ns, base_u, base_p=base_p, nsteps=nsteps,
                              base_T=base_T)


def linear_stability_analysis(
    ns: NavierStokes,
    base_u: jnp.ndarray,
    horizon: float,
    nsteps: int,
    base_p: Optional[jnp.ndarray] = None,
    mode: str = "direct",
    floquet: bool = False,
    k_dim: int = 100,
    nev: int = 2,
    tol: float = 1e-6,
    schur_del: float = 0.10,
    max_restarts: int = 50,
    seed: int = 1234,
    seed_mode: str = "noise",
    seed_path: Optional[str] = None,
    x0: Optional[jnp.ndarray] = None,
    nmodes_out: Optional[int] = None,
    base_T: Optional[jnp.ndarray] = None,
    spurious_factor: Optional[float] = 3.0,
    checkpoint=None,
    checkpoint_steps: bool = False,
) -> StabilityResult:
    """Leading direct/adjoint eigenmodes of the linearized flow.

    ``mode='adjoint'`` runs Krylov-Schur on the adjoint propagator (the
    reference's transpose flag to ``eigs``, core/linear_stab.f90:66).

    With a thermal stepper (``ns.nscal > 0``) the Krylov vectors are coupled
    ``(velocity, scalars)`` tuples and ``base_T`` supplies the base scalar
    field; modes come back as tuples too.

    ``seed_mode``: 'noise' | 'symmetric' | 'load' | 'baseflow' — the
    reference's ``prepare_seed`` options (core/eigensolvers.f90:190-230);
    'load' reads the field at ``seed_path``.  Scalars always seed with
    noise."""
    op = _make_operator(ns, base_u, base_p, nsteps, floquet, base_T=base_T)
    coupled = ns.nscal > 0
    matvec = op.matvec if mode == "direct" else op.rmatvec
    space = coupled_space(ns.sem) if coupled else velocity_space(ns.sem)
    if x0 is None:
        from ..utils.noise import make_seed

        x0 = make_seed(ns.sem, mode=seed_mode, seed=seed, path=seed_path,
                       base_u=base_u)
        if coupled:
            xT = velocity_noise(ns.sem, seed=seed + 1)[..., :1]
            xT = jnp.concatenate([xT] * ns.nscal, axis=-1) * ns.sem.tmask[..., None]
            x0 = (x0, xT)
    res = eigs(
        matvec, space, x0, k_dim=k_dim, nev=nev, tol=tol,
        schur_del=schur_del, max_restarts=max_restarts, checkpoint=checkpoint,
        checkpoint_steps=checkpoint_steps,
    )
    T = op.T
    lam = np.log(res.eigenvalues.astype(np.complex128)) / T
    nout = min(nmodes_out if nmodes_out is not None else nev, res.k)
    modes = []
    gnorms = []
    for i in range(nout):
        re, im = res.mode(i)
        nrm = float(np.sqrt(space.dot(re, re) + space.dot(im, im)))
        re = space.scale(1.0 / nrm, re)
        im = space.scale(1.0 / nrm, im)
        modes.append((re, im))
        if spurious_factor is not None and not coupled:
            gnorms.append(
                np.hypot(gradient_energy_norm(ns.sem, re),
                         gradient_energy_norm(ns.sem, im))
            )
    gnorms = np.asarray(gnorms) if gnorms else None
    spurious = None
    if gnorms is not None and len(gnorms) > 1:
        # anomalously rough relative to the smoothest retained mode
        # (mesh-independent version of the reference's absolute 1.1 gate,
        # eigensolvers.f90:587-595)
        spurious = gnorms > spurious_factor * gnorms.min()
    return StabilityResult(
        mu=res.eigenvalues,
        lam=lam,
        residuals=res.residuals,
        modes=modes,
        horizon=T,
        n_matvecs=res.n_matvecs,
        eigresult=res,
        mode_gradient_norms=gnorms,
        spurious=spurious,
    )


@dataclasses.dataclass
class TransientGrowthResult:
    gains: np.ndarray  # G(T) = sigma^2
    sigma: np.ndarray
    optimal_inputs: List[jnp.ndarray]  # right singular vectors
    optimal_responses: List[jnp.ndarray]  # left singular vectors
    horizon: float
    n_matvecs: int
    residuals: Optional[np.ndarray] = None  # svds triplet residuals


def transient_growth_analysis(
    ns: NavierStokes,
    base_u: jnp.ndarray,
    horizon: float,
    nsteps: int,
    base_p: Optional[jnp.ndarray] = None,
    floquet: bool = False,
    nsv: int = 2,
    k_dim: int = 64,
    tol: float = 1e-6,
    seed: int = 1234,
    x0: Optional[jnp.ndarray] = None,
) -> TransientGrowthResult:
    """Optimal energy growth over ``horizon``: G = sigma(exp(T L))^2
    (reference core/linear_stab.f90:82-119; Barkley et al. 2008 benchmark)."""
    op = _make_operator(ns, base_u, base_p, nsteps, floquet)
    space = velocity_space(ns.sem)
    if x0 is None:
        x0 = velocity_noise(ns.sem, seed=seed)
    # the energy norm is the sponge-MASKED semi-norm (bm1s): seed
    # components inside the mask have zero norm but would still feed the
    # first matvec — constrain the optimization to the measured subspace
    # (every later Lanczos vector stays there via the W^+-weighted adjoint)
    x0 = x0 * (ns.sem.bms > 0)[..., None].astype(x0.dtype)
    x0nrm = float(space.norm(x0))
    if not np.isfinite(x0nrm) or x0nrm == 0.0:
        raise ValueError(
            "transient-growth seed has zero energy in the sponge-masked "
            "norm (supported entirely inside the sponge?) — supply a seed "
            "with support in the measured region or use the default noise"
        )
    res = svds(
        op.matvec, op.rmatvec, space, x0, nsv=nsv, k_dim=k_dim, tol=tol,
    )
    return TransientGrowthResult(
        gains=res.sigma**2,
        sigma=res.sigma,
        optimal_inputs=res.right,
        optimal_responses=res.left,
        horizon=op.T,
        n_matvecs=res.n_matvecs,
        residuals=res.residuals,
    )


def resolvent_analysis(*args, **kwargs):
    from .resolvent import resolvent_analysis as _ra

    return _ra(*args, **kwargs)
