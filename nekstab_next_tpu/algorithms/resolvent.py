"""Resolvent (forced-response) analysis via the time-stepper formulation.

Rebuild of the reference's ``resolvent_solver`` + ``resolvent_analysis``
(core/linear_operators.f90:312-431, core/linear_stab.f90:121-163):

For forcing  f(t) = Re(fhat e^{i omega t})  around a steady base flow, the
periodic response  u(t) = Re(uhat e^{i omega t})  with  uhat = R(omega) fhat
is obtained matrix-free over one period T = 2 pi / omega:

1. particular solution  b = integral_0^T exp((T-s) L) f(s) ds  — integrate
   the *forced* linearized equations from zero over one period;
2. periodicity solve  (I - exp(T L)) x = b  by GMRES  ->  x = Re(uhat);
3. quarter-period propagation of the periodic response gives the imaginary
   part:  u_p(T/4) = Re(uhat i) = -Im(uhat)  (the reference's phase trick,
   linear_operators.f90:418-423).

Complex fields are (re, im) velocity pairs (the reference's
``cmplx_nek_vector``, core/nek_vectors.f90:33-42).  The adjoint resolvent —
which the reference assembles from its hand-written adjoint solver — is here
the ``jax.vjp`` of the entire real-linear map (= its transpose), wrapped
with mass weights."""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..krylov.gmres import gmres
from ..krylov.svd import svds
from ..krylov.vector import VectorSpace
from ..stepper.navier_stokes import NavierStokes
from ..utils.noise import velocity_noise


def _complex_space(sem) -> VectorSpace:
    def dot(a, b):
        (ar, ai), (br, bi) = a, b
        return sum(
            sem.inner(ar[..., d], br[..., d]) + sem.inner(ai[..., d], bi[..., d])
            for d in range(ar.shape[-1])
        )

    return VectorSpace(dot)


@dataclasses.dataclass
class ResolventResult:
    omega: float
    sigma: np.ndarray  # resolvent gains
    forcing_modes: List  # (re, im) pairs
    response_modes: List
    n_matvecs: int


class ResolventOperator:
    """Matrix-free R(omega) on (re, im) velocity pairs around a steady base."""

    def __init__(
        self,
        ns: NavierStokes,
        base_u: jnp.ndarray,
        omega: float,
        base_p: Optional[jnp.ndarray] = None,
        steps_per_period: int = 128,
        gmres_kdim: int = 64,
        gmres_tol: float = 1e-8,
        gmres_restarts: int = 8,
    ):
        assert steps_per_period % 4 == 0, "need T/4 to land on a step"
        self.ns = ns
        self.sem = ns.sem
        self.omega = float(omega)
        self.T = 2.0 * np.pi / self.omega
        self.nsteps = int(steps_per_period)
        self.dt = self.T / self.nsteps
        self.gmres_kdim = gmres_kdim
        self.gmres_tol = gmres_tol
        self.gmres_restarts = int(gmres_restarts)
        s = ns.sem

        base_u = base_u.astype(s.dtype)
        base_p = (
            jnp.zeros(ns.p_shape, dtype=s.dtype) if base_p is None
            else base_p.astype(s.dtype)
        )
        E0 = ns._explicit_weak(base_u, jnp.asarray(0.0, s.dtype))
        base_fields = (base_u, base_p, jnp.stack([base_u, base_u]), jnp.stack([E0, E0]))
        zero_fc = jnp.zeros_like(base_u)

        # linearize each ramp stage jointly in (state, forcing)
        self._lin = [
            jax.linearize(
                partial(self._core_fc, k=k), base_fields, zero_fc
            )[1]
            for k in range(3)
        ]
        self._zero_tail = (
            jnp.zeros_like(base_fields[1]),
            jnp.zeros_like(base_fields[2]),
            jnp.zeros_like(base_fields[3]),
        )
        self._matvec_c = jax.jit(self._apply)
        self._rmatvec_c = None
        self.n_matvecs = 0
        # The periodicity operator I - M is singular on neutral modes of the
        # propagator (e.g. the constant mode of a fully periodic box, mu=1).
        # Deflate them so both GMRES paths pick the same representative.
        self._deflate_mean = not ns.sem.has_pressure_dirichlet and not bool(
            np.any(np.asarray(ns.sem.vmask) == 0.0)
        )

    def _deflate(self, u):
        if not self._deflate_mean:
            return u
        s = self.sem
        vol = s.volume()
        mean = jnp.stack(
            [s.glsum(u[..., d] * s.bm) / vol for d in range(u.shape[-1])],
            axis=-1,
        )
        return u - mean  # (ndim,) broadcasts over the trailing component axis

    def _core_fc(self, fields, fc, k):
        return self.ns._core(fields, jnp.asarray(0.0, self.sem.dtype), k, fc=fc, dt=self.dt)

    # -- forced tangent integration ------------------------------------
    def _integrate(self, q0, f_re, f_im, nsteps):
        """Integrate the forced linearized equations for ``nsteps`` steps
        from initial perturbation q0 with forcing Re(fhat e^{i omega t})."""
        dtype = self.sem.dtype
        df = (q0,) + self._zero_tail
        zero_fc = jnp.zeros_like(q0)

        def fc_at(n):
            ph = self.omega * self.dt * n
            return f_re * jnp.cos(ph) - f_im * jnp.sin(ph)

        if nsteps >= 1:
            df = self._lin[0](df, fc_at(0))
        if nsteps >= 2:
            df = self._lin[1](df, fc_at(1))
        if nsteps > 2:
            # the forcing enters the scan as an EXPLICIT xs sequence (one
            # phase-modulated field per step): scan transposes xs inputs
            # natively, while closure-captured linear values trip a JAX
            # accumulator bug on this version ("ValAccum ... is not a
            # valid JAX type"; round-5 fix — the adjoint resolvent path
            # had no earlier test coverage).  Memory: (nsteps, field) —
            # ~0.5 GB at the f32 sweep scale, well inside HBM.
            ph = self.omega * self.dt * jnp.arange(2, nsteps)
            cshape = (-1,) + (1,) * f_re.ndim
            F = (jnp.cos(ph).reshape(cshape) * f_re[None]
                 - jnp.sin(ph).reshape(cshape) * f_im[None])

            def body(c, fcn):
                return self._lin[2](c, fcn), None

            df, _ = jax.lax.scan(body, df, F)
        return df[0]

    # -- R(omega) --------------------------------------------------------
    def _apply(self, fpair):
        f_re, f_im = fpair
        zero = jnp.zeros_like(f_re)
        # particular solution over one period from rest
        b = self._integrate(zero, f_re, f_im, self.nsteps)
        return b

    def _homogeneous(self, q):
        zero = jnp.zeros_like(q)
        return self._integrate(q, zero, zero, self.nsteps)

    def matvec(self, fpair) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """uhat = R(omega) fhat  as an (re, im) pair."""
        s = self.sem
        b = self._matvec_c(fpair)
        space = VectorSpace(
            lambda a, c: sum(
                s.inner(a[..., d], c[..., d]) for d in range(a.shape[-1])
            )
        )
        if not hasattr(self, "_hom_jit"):
            self._hom_jit = jax.jit(self._homogeneous)

        def A(x):
            return self._deflate(x - self._hom_jit(x))

        b = self._deflate(b)
        x, info = gmres(
            A, space, b, k_dim=self.gmres_kdim, tol=self.gmres_tol,
            max_restarts=20,
        )
        x = self._deflate(x)
        self.n_matvecs += info["iterations"] + 1
        # quarter-period forced propagation for the imaginary part
        f_re, f_im = fpair
        if not hasattr(self, "_quarter_jit"):
            self._quarter_jit = jax.jit(
                lambda q, fr, fi: self._integrate(q, fr, fi, self.nsteps // 4)
            )
        x4 = self._quarter_jit(x, f_re, f_im)
        return (x, -x4)

    def rmatvec(self, upair):
        """Adjoint resolvent in the energy product: transpose of the whole
        (re, im) -> (re, im) map wrapped with mass weights.

        Uses ``jax.vjp`` of ``matvec_pure`` (at a zero primal — the map is
        linear, so the vjp IS the transpose) rather than
        ``jax.linear_transpose``: transposing the forcing fan-out through
        custom_linear_solve + scan trips a JAX accumulator bug on this
        version ("ValAccum ... is not a valid JAX type") on every
        formulation tried — single transpose, stage-by-stage composition,
        carry- and xs-threaded forcing — while the vjp path is solid
        (found round 5 by the resolvent sweep; no earlier test exercised
        the adjoint).  Costs one wasted primal evaluation per apply."""
        if self._rmatvec_c is None:
            bm = self.sem.bm[..., None]
            zero_pair = (jnp.zeros_like(upair[0]), jnp.zeros_like(upair[1]))
            _, vjp_fn = jax.vjp(self.matvec_pure, zero_pair)

            def rmv(up):
                ur, ui = up
                (ct,) = vjp_fn((ur * bm, ui * bm))
                return (ct[0] / bm, ct[1] / bm)

            # jit: the eager vjp replay re-traces the transposed nested
            # solves on every apply (measured: dominated the CPU sweep)
            self._rmatvec_c = jax.jit(rmv)
        return self._rmatvec_c(upair)

    def matvec_pure(self, fpair):
        """Purely functional version of matvec (for transposition): GMRES is
        replaced by a fixed-iteration linear solve via the Neumann-free
        formulation — we instead expose the same computation through
        lax.custom_linear_solve so transpose re-solves (I - M)^T."""
        f_re, f_im = fpair
        b = self._deflate(self._apply(fpair))
        s = self.sem

        def A(x):
            return self._deflate(x - self._homogeneous(x))

        from ..ops.cg import pcg

        def solve(mv, rhs):
            # (I - M) is nonsymmetric: use GMRES-in-jit via simple Richardson
            # -> replaced by pcg on normal equations would square cond.; use
            # fixed-restart classical GMRES implemented with lax primitives.
            return _gmres_device(mv, rhs, s, k_dim=self.gmres_kdim,
                                 restarts=self.gmres_restarts)

        def tsolve(mv, rhs):
            return _gmres_device(mv, rhs, s, k_dim=self.gmres_kdim,
                                 restarts=self.gmres_restarts)

        x = jax.lax.custom_linear_solve(
            A, b, solve, transpose_solve=tsolve
        )
        x4 = self._integrate(x, f_re, f_im, self.nsteps // 4)
        return (x, -x4)


class FloquetResolventOperator(ResolventOperator):
    """R(omega) around a *T_b-periodic base orbit* — the reference's
    Floquet-resolvent mode (uparam 3.41, RELEASE.md; ``setupLinearSolver``
    with the orbit stored/replayed, core/linear_operators.f90:133-146).

    The forced linearized equations integrate *along the orbit* launched
    from ``base_u`` (phase t=0), with the forcing phase locked to the orbit:
    ``omega`` must be a harmonic of the orbit, omega = 2 pi m / base_period,
    so that the composite system is base_period-periodic and the
    periodicity solve (I - M) x = b is well posed over one orbit period.
    The linearization point is built once by ``jax.linearize`` over the
    nonlinear trajectory (the stored residuals are the reference's orbit
    arrays uor/vor/wor), so each matvec costs only linear steps.

    Caveat shared with the reference's resolvent_solver: the T/4 phase
    trick recovers Im(uhat) exactly only for a monochromatic response; on a
    periodic base the response carries Floquet sidebands, for which the
    harmonic-resolvent module (algorithms/harmonic.py) is the complete
    treatment."""

    def __init__(
        self,
        ns: NavierStokes,
        base_u: jnp.ndarray,
        omega: float,
        base_p: Optional[jnp.ndarray] = None,
        base_period: Optional[float] = None,
        steps_per_period: int = 128,
        gmres_kdim: int = 64,
        gmres_tol: float = 1e-8,
        gmres_restarts: int = 8,
        remat: bool = True,
    ):
        assert steps_per_period % 4 == 0, "need T/4 to land on a step"
        self.ns = ns
        self.sem = ns.sem
        self.omega = float(omega)
        self.T = (
            float(base_period) if base_period is not None
            else 2.0 * np.pi / self.omega
        )
        harmonic = self.omega * self.T / (2.0 * np.pi)
        if abs(harmonic - round(harmonic)) > 1e-8:
            raise ValueError(
                f"omega={omega} is not a harmonic of the base period "
                f"{self.T} (omega T / 2 pi = {harmonic:.6f})"
            )
        self.nsteps = int(steps_per_period)
        self.dt = self.T / self.nsteps
        self.gmres_kdim = gmres_kdim
        self.gmres_tol = gmres_tol
        self.gmres_restarts = int(gmres_restarts)
        s = ns.sem

        base_u = base_u.astype(s.dtype)
        base_p = (
            jnp.zeros(ns.p_shape, dtype=s.dtype) if base_p is None
            else base_p.astype(s.dtype)
        )
        stepf = lambda c, fc: ns.step(c, fc=fc, dt=self.dt)
        if remat:
            stepf = jax.checkpoint(stepf)

        def make_prop(nsteps):
            def prop(q0, fr, fi):
                st = ns.make_state(base_u + q0, p=base_p, time=0.0)

                def body(c, n):
                    ph = self.omega * self.dt * n
                    fc = fr * jnp.cos(ph) - fi * jnp.sin(ph)
                    return stepf(c, fc), None

                out, _ = jax.lax.scan(body, st, jnp.arange(nsteps))
                return out.u

            return prop

        zero = jnp.zeros_like(base_u)
        primal, lin_full = jax.linearize(make_prop(self.nsteps), zero, zero, zero)
        self.monodromy_drift = float(s.norm(primal - base_u))
        self._lin_full = jax.jit(lin_full)
        _, lin_quarter = jax.linearize(
            make_prop(self.nsteps // 4), zero, zero, zero
        )
        self._lin_quarter = jax.jit(lin_quarter)

        self._matvec_c = jax.jit(self._apply)
        self._rmatvec_c = None
        self.n_matvecs = 0
        self._deflate_mean = not ns.sem.has_pressure_dirichlet and not bool(
            np.any(np.asarray(ns.sem.vmask) == 0.0)
        )

    def _integrate(self, q0, f_re, f_im, nsteps):
        if nsteps == self.nsteps:
            return self._lin_full(q0, f_re, f_im)
        if nsteps == self.nsteps // 4:
            return self._lin_quarter(q0, f_re, f_im)
        raise ValueError(
            f"Floquet resolvent integrates one period ({self.nsteps} steps) "
            f"or a quarter period, got {nsteps}"
        )


def _gmres_device(matvec, b, sem, k_dim: int = 40, restarts: int = 4):
    """Small fully-on-device restarted GMRES (needed under
    custom_linear_solve where host callbacks are unavailable)."""
    dot = lambda a, c: sum(
        sem.inner(a[..., d], c[..., d], masked=False)
        for d in range(a.shape[-1])
    )

    def one_restart(x):
        r = b - matvec(x)
        beta = jnp.sqrt(dot(r, r))
        q0 = r / jnp.maximum(beta, 1e-300)
        Q = jnp.zeros((k_dim + 1,) + b.shape, b.dtype).at[0].set(q0)
        H = jnp.zeros((k_dim + 1, k_dim), b.dtype)

        def arn(carry, j):
            Q, H = carry
            w = matvec(Q[j])
            h = jax.vmap(lambda q: dot(q, w))(Q)
            mask = (jnp.arange(k_dim + 1) <= j).astype(b.dtype)
            h = h * mask
            w = w - jnp.tensordot(h, Q, axes=(0, 0))
            hb = jnp.sqrt(dot(w, w))
            Q = Q.at[j + 1].set(w / jnp.maximum(hb, 1e-300))
            H = H.at[:, j].set(h).at[j + 1, j].set(hb)
            return (Q, H), None

        (Q, H), _ = jax.lax.scan(arn, (Q, H), jnp.arange(k_dim))
        e1 = jnp.zeros(k_dim + 1, b.dtype).at[0].set(beta)
        y, *_ = jnp.linalg.lstsq(H, e1)
        return x + jnp.tensordot(jnp.concatenate([y, jnp.zeros(1, b.dtype)]), Q, axes=(0, 0))

    x = jnp.zeros_like(b)
    for _ in range(restarts):
        x = one_restart(x)
    return x


def resolvent_analysis(
    ns: NavierStokes,
    base_u: jnp.ndarray,
    omega: float,
    base_p: Optional[jnp.ndarray] = None,
    nsv: int = 1,
    k_dim: int = 20,
    tol: float = 1e-6,
    steps_per_period: int = 128,
    seed: int = 1234,
    floquet: bool = False,
    base_period: Optional[float] = None,
) -> ResolventResult:
    """Leading resolvent gains/modes at frequency ``omega`` (reference
    core/linear_stab.f90:121-163).  ``floquet=True`` analyzes the forced
    response around a *periodic* base orbit launched from ``base_u`` with
    period ``base_period`` (uparam 3.41); ``omega`` must then be one of the
    orbit's harmonics."""
    if floquet:
        op = FloquetResolventOperator(
            ns, base_u, omega, base_p=base_p, base_period=base_period,
            steps_per_period=steps_per_period,
        )
    else:
        op = ResolventOperator(
            ns, base_u, omega, base_p=base_p, steps_per_period=steps_per_period
        )
    space = _complex_space(ns.sem)
    x0r = velocity_noise(ns.sem, seed=seed)
    x0i = velocity_noise(ns.sem, seed=seed + 1)
    res = svds(
        op.matvec_pure, op.rmatvec, space, (x0r, x0i), nsv=nsv, k_dim=k_dim,
        tol=tol,
    )
    return ResolventResult(
        omega=omega,
        sigma=res.sigma,
        forcing_modes=res.right,
        response_modes=res.left,
        n_matvecs=res.n_matvecs,
    )
