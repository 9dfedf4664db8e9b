"""Fixed-point / steady-state accelerators: SFD, BoostConv, TDF.

Rebuilds of the reference's core/fixedp.f90:

* SFD  (:124-216) — selective frequency damping: DNS forced by
  ``chi (ubar - u)`` where ``ubar`` is a low-pass-filtered copy of the flow;
  converges to unstable steady states.  Supports both the Akervik gain
  parameterization and Casacuberta's optimal (gain, cutoff) given the leading
  eigenvalue.
* BoostConv (:218-329) — residual-subspace acceleration of DNS toward a
  steady state: every ``skip`` steps the update residual is boosted through a
  least-squares problem on a small stored subspace (QR on host).
* TDF (:2-121) — time-delayed feedback ``-chi (u(t) - u(t-T))`` with a device
  ring buffer of one-period snapshots; stabilizes periodic orbits.

TPU shape: the per-step work runs as jitted chunks of ``chunk`` steps
(lax.scan); the host loop only checks residuals between chunks and decides
termination (compile-once / run-many)."""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..stepper.navier_stokes import NavierStokes
from ..stepper.state import FlowState, initial_state


@dataclasses.dataclass
class FixedPointResult:
    u: jnp.ndarray
    p: jnp.ndarray
    residual: float
    converged: bool
    iterations: int
    history: list


def sfd(
    ns: NavierStokes,
    u0: jnp.ndarray,
    gain: float = -0.05,
    cutoff: float = 0.05,
    tol: float = 1e-9,
    max_steps: int = 200_000,
    chunk: int = 200,
    callback: Optional[Callable] = None,
) -> FixedPointResult:
    """Selective frequency damping toward an unstable steady state.

    Filter ODE  d(ubar)/dt = cutoff * (u - ubar)  integrated forward-Euler
    alongside the flow; forcing  fc = gain * (u - ubar)  (gain < 0 damps).
    Residual = ||u - ubar||_B -> 0 at the steady state (the reference logs
    the same measure to residu.dat, fixedp.f90:186-211)."""
    s = ns.sem
    dt = ns.dt

    def chunk_fn(st: FlowState, ubar: jnp.ndarray):
        def body(carry, _):
            st, ubar = carry
            fc = gain * (st.u - ubar)
            st = ns.step(st, fc=fc)
            ubar = ubar + dt * cutoff * (st.u - ubar)
            return (st, ubar), None

        (st, ubar), _ = jax.lax.scan(body, (st, ubar), None, length=chunk)
        du = st.u - ubar
        res = jnp.sqrt(
            s.inner(du[..., 0], du[..., 0], masked=False)
            + s.inner(du[..., 1], du[..., 1], masked=False)
        )
        return st, ubar, res

    run = jax.jit(chunk_fn)
    st = ns.make_state(u0)
    ubar = st.u
    history = []
    steps = 0
    res = np.inf
    while steps < max_steps:
        st, ubar, r = run(st, ubar)
        steps += chunk
        res = float(r)
        history.append((steps, res))
        if callback is not None:
            callback(steps, res)
        if not np.isfinite(res):
            raise FloatingPointError(f"SFD diverged at step {steps}")
        if res < tol:
            return FixedPointResult(st.u, st.p, res, True, steps, history)
    return FixedPointResult(st.u, st.p, res, False, steps, history)


def boostconv_dns(
    ns: NavierStokes,
    u0: jnp.ndarray,
    skip: int = 10,
    subspace: int = 10,
    tol: float = 1e-9,
    max_steps: int = 200_000,
    callback: Optional[Callable] = None,
) -> FixedPointResult:
    """BoostConv-accelerated march to a steady state (reference
    fixedp.f90:218-329, after Citro et al. 2017).

    Every ``skip`` steps the raw residual  r = u_new - u_old  is replaced by a
    boosted residual  xi  built from a rolling subspace of past input/output
    residual pairs; the small least-squares solve runs on host (the
    reference's ``qr_dec`` + triangular solve, fixedp.f90:331-403)."""
    s = ns.sem
    dot = lambda a, b: float(
        s.inner(a[..., 0], b[..., 0], masked=False) + s.inner(a[..., 1], b[..., 1], masked=False)
    )

    advance = jax.jit(lambda st: ns.advance(st, skip))
    st = ns.make_state(u0)
    u_old = st.u
    X: list = []  # input residuals
    Y: list = []  # output residuals (difference between consecutive inputs)
    r_prev = None
    history = []
    steps = 0
    res = np.inf
    while steps < max_steps:
        st = advance(st)
        steps += skip
        r = st.u - u_old
        res = float(np.sqrt(max(dot(r, r), 0.0)))
        history.append((steps, res))
        if callback is not None:
            callback(steps, res)
        if res < tol:
            return FixedPointResult(st.u, st.p, res, True, steps, history)

        # --- boost ----------------------------------------------------
        if r_prev is not None:
            X.append(r_prev)
            Y.append(r_prev - r)
            if len(X) > subspace:
                X.pop(0)
                Y.pop(0)
        xi = r
        if X:
            # least squares  min || r - Y c ||_B  on the small subspace
            G = np.array([[dot(a, b) for b in Y] for a in Y])
            rhs = np.array([dot(a, r) for a in Y])
            c, *_ = np.linalg.lstsq(G, rhs, rcond=1e-12)
            # boosted residual: xi = r + sum c_i (X_i - Y_i)
            for ci, Xi, Yi in zip(c, X, Y):
                xi = xi + ci * (Xi - Yi)
        r_prev = r
        u_new = u_old + xi
        st = ns.make_state(u_new, p=st.p, time=float(st.time))
        u_old = u_new
    return FixedPointResult(st.u, st.p, res, False, steps, history)


def tdf(
    ns: NavierStokes,
    u0: jnp.ndarray,
    period: float,
    gain: float = -0.05,
    tol: float = 1e-8,
    max_periods: int = 200,
    callback: Optional[Callable] = None,
) -> FixedPointResult:
    """Time-delayed feedback stabilization of a periodic orbit (reference
    fixedp.f90:2-121): forcing  fc = gain * (u(t) - u(t - T))  with a device
    ring buffer of the last period's snapshots."""
    s = ns.sem
    dt = ns.dt
    norbit = max(int(round(period / dt)), 1)

    def one_period(st: FlowState, ring: jnp.ndarray):
        def body(carry, i):
            st, ring = carry
            delayed = ring[i]
            fc = gain * (st.u - delayed)
            st = ns.step(st, fc=fc)
            ring = ring.at[i].set(st.u)
            return (st, ring), None

        (st, ring), _ = jax.lax.scan(body, (st, ring), jnp.arange(norbit))
        return st, ring

    run = jax.jit(one_period)
    st = ns.make_state(u0)
    ring = jnp.broadcast_to(st.u, (norbit,) + st.u.shape).copy()
    history = []
    res = np.inf
    for it in range(max_periods):
        u_prev = st.u
        st, ring = run(st, ring)
        du = st.u - u_prev
        res = float(
            jnp.sqrt(
                s.inner(du[..., 0], du[..., 0], masked=False)
                + s.inner(du[..., 1], du[..., 1], masked=False)
            )
        )
        history.append(((it + 1) * norbit, res))
        if callback is not None:
            callback(it, res)
        if res < tol:
            return FixedPointResult(st.u, st.p, res, True, (it + 1) * norbit, history)
    return FixedPointResult(st.u, st.p, res, False, max_periods * norbit, history)
