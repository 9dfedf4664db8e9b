"""Sensitivity / passive-control maps (reference core/sensitivity.f90).

* :func:`biorthogonalize` — normalize the direct mode to unit energy norm and
  rescale the adjoint so <adj, dir>_B = 1 (reference :393-469).
* :func:`wave_maker` — Giannetti & Luchini (JFM 2007) structural sensitivity
  zeta(x) = |u_dir(x)| |u_adj(x)| after biorthogonalization (reference :3-77).
* :func:`bf_sensitivity` — Marquet, Sipp & Jacquin (JFM 2008) base-flow
  sensitivity: transport term -conj? (grad u_d)^H u_a and production term
  (conj(u_d) . grad) u_a, real/imag parts (reference :81-269; note the
  reference's dvdz typo in the transport sum is fixed here — we contract the
  full gradient tensor).
* :func:`steady_force_sensitivity` — time-stepper GMRES solve of
  (I - exp(T L^+)) x = b with b the adjoint response to the steady forcing
  (reference :273-391, matvec.f90:499-516).
* :func:`delta_forcing` — pointwise eigenvalue drift induced by a steady
  localized force, Marquet et al. eq. (5.1) (reference :471-533).

Complex fields are carried as (re, im) pairs of real (nelem, n, n, ndim)
arrays, matching the reference's dRe/dIm/aRe/aIm file convention."""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..krylov.gmres import gmres
from ..krylov.vector import VectorSpace
from ..stepper.linearized import LinearizedOperator
from .vortex import velocity_gradient


def _cdot(sem, x_re, x_im, y_re, y_im) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Hermitian energy product <x, y> = sum_d <conj(x_d), y_d>_B."""
    nd = x_re.shape[-1]
    re = sum(
        sem.inner(x_re[..., d], y_re[..., d]) + sem.inner(x_im[..., d], y_im[..., d])
        for d in range(nd)
    )
    im = sum(
        sem.inner(x_re[..., d], y_im[..., d]) - sem.inner(x_im[..., d], y_re[..., d])
        for d in range(nd)
    )
    return re, im


def _cnorm(sem, x_re, x_im) -> jnp.ndarray:
    re, _ = _cdot(sem, x_re, x_im, x_re, x_im)
    return jnp.sqrt(re)


def biorthogonalize(sem, d_re, d_im, a_re, a_im):
    """Unit-normalize the direct pair; rescale the adjoint pair so that
    <adj, dir>_B = 1 (complex division by the conjugate of the product,
    reference sensitivity.f90:428-460).  Returns (d_re, d_im, a_re, a_im)."""
    g = 1.0 / _cnorm(sem, d_re, d_im)
    d_re, d_im = g * d_re, g * d_im
    gamma, delta = _cdot(sem, a_re, a_im, d_re, d_im)
    den = gamma**2 + delta**2
    new_re = (gamma * a_re - delta * a_im) / den
    new_im = (gamma * a_im + delta * a_re) / den
    return d_re, d_im, new_re, new_im


def wave_maker(sem, d_re, d_im, a_re, a_im) -> jnp.ndarray:
    """zeta(x) = |u_dir| |u_adj| after biorthogonalization (wm_ field)."""
    d_re, d_im, a_re, a_im = biorthogonalize(sem, d_re, d_im, a_re, a_im)
    nd = jnp.sqrt(jnp.sum(d_re**2 + d_im**2, axis=-1))
    na = jnp.sqrt(jnp.sum(a_re**2 + a_im**2, axis=-1))
    return nd * na


def bf_sensitivity(sem, d_re, d_im, a_re, a_im) -> dict:
    """Marquet base-flow sensitivity; returns the six reference output fields
    {tr, ti, pr, pi, sr, si} as (nelem, n, n, ndim) arrays.

    With complex d = d_re + i d_im, a = a_re + i a_im and X_b = sum_i
    conj(a_i) d(d_i)/dx_b (transport), P_b = sum_j conj(d_j) d(a_b)/dx_j
    (production):  tr = -Re X, ti = Im X, pr = Re P, pi = Im P."""
    d_re, d_im, a_re, a_im = biorthogonalize(sem, d_re, d_im, a_re, a_im)

    Gd_re = velocity_gradient(sem, d_re)  # (..., i, b) = d(d_i)/dx_b
    Gd_im = velocity_gradient(sem, d_im)
    Ga_re = velocity_gradient(sem, a_re)
    Ga_im = velocity_gradient(sem, a_im)

    # transport: X_b = sum_i conj(a_i) Gd[i, b]
    X_re = jnp.einsum("...i,...ib->...b", a_re, Gd_re) + jnp.einsum(
        "...i,...ib->...b", a_im, Gd_im
    )
    X_im = jnp.einsum("...i,...ib->...b", a_re, Gd_im) - jnp.einsum(
        "...i,...ib->...b", a_im, Gd_re
    )
    # production: P_b = sum_j conj(d_j) Ga[b, j]
    P_re = jnp.einsum("...j,...bj->...b", d_re, Ga_re) + jnp.einsum(
        "...j,...bj->...b", d_im, Ga_im
    )
    P_im = jnp.einsum("...j,...bj->...b", d_re, Ga_im) - jnp.einsum(
        "...j,...bj->...b", d_im, Ga_re
    )

    out = dict(tr=-X_re, ti=X_im, pr=P_re, pi=P_im)
    out["sr"] = out["tr"] + out["pr"]
    out["si"] = out["ti"] + out["pi"]
    return out


def delta_forcing(sem, base_u, fs_re, fs_im, amplitude: float = 1.0):
    """Eigenvalue drift map for a steady pointwise force opposing the local
    base flow (Marquet et al. eq. 5.1; reference sensitivity.f90:471-533):

        delta_sigma(x) = -a |U(x)| (fs_re . U),
        delta_omega(x) = +a |U(x)| (fs_im . U).
    """
    speed = jnp.sqrt(jnp.sum(base_u**2, axis=-1))
    wr = jnp.sum(fs_re * base_u, axis=-1)
    wi = jnp.sum(fs_im * base_u, axis=-1)
    return -amplitude * speed * wr, amplitude * speed * wi


# ----------------------------------------------------------------------
def forced_tangent_response(ns, base_u, f, nsteps: int, base_p=None):
    """Particular solution of the tangent system with *constant* acceleration
    forcing f and zero initial perturbation:

        b = int_0^T exp((T-s) L) B f ds   (discretely exact)

    — the tangent analog of the reference's forced adjoint integration
    (sensitivity.f90:350-391), built by linearizing the step in (state, fc)."""
    s = ns.sem
    base_u = base_u.astype(s.dtype)
    if base_p is None:
        base_p = jnp.zeros(ns.p_shape, dtype=s.dtype)
    t0 = jnp.asarray(0.0, s.dtype)
    E0 = ns._explicit_weak(base_u, t0)
    base_fields = (base_u, base_p, jnp.stack([base_u, base_u]), jnp.stack([E0, E0]))
    fc0 = jnp.zeros_like(base_u)

    lins = [
        jax.linearize(
            lambda fields, fc, k=k: ns._core(fields, t0, k, fc=fc), base_fields, fc0
        )[1]
        for k in range(min(nsteps, 3))
    ]

    def prop(f_):
        df = (
            jnp.zeros_like(base_fields[0]),
            jnp.zeros_like(base_fields[1]),
            jnp.zeros_like(base_fields[2]),
            jnp.zeros_like(base_fields[3]),
        )
        if nsteps >= 1:
            df = lins[0](df, f_)
        if nsteps >= 2:
            df = lins[1](df, f_)
        if nsteps > 2:
            # thread f through the carry so the scan stays transposable
            # (a linear closure constant cannot be transposed through scan)
            def body(c, _):
                dfc, fc = c
                return (lins[2](dfc, fc), fc), None

            (df, _), _ = jax.lax.scan(body, (df, f_), None, length=nsteps - 2)
        return df[0]

    return jax.jit(prop)(f), prop


def steady_force_sensitivity(
    ns,
    base_u,
    f,
    nsteps: int,
    base_p=None,
    k_dim: int = 64,
    tol: float = 1e-8,
    max_restarts: int = 10,
):
    """Solve the time-stepper steady linear system driven by the force f:

        (I - exp(T L^+)) x = int_0^T exp((T-s) L^+) B f ds

    via GMRES on the adjoint propagator (reference ts_steady_force_sensitivity
    + ts_force_sensitivity_map, sensitivity.f90:273-346, matvec.f90:499-516).
    Returns (x, info)."""
    s = ns.sem
    bm = s.bm[..., None]

    # adjoint forced response: B-adjoint of the tangent forced response
    # (prop is linear, so its VJP at any point IS the exact transpose)
    _, prop = forced_tangent_response(ns, base_u, f, nsteps, base_p=base_p)
    _, vjp = jax.vjp(prop, f)
    b = vjp(f * bm)[0] / bm

    op = LinearizedOperator(ns, base_u, base_p=base_p, nsteps=nsteps)
    space = VectorSpace(
        lambda x, y: sum(s.inner(x[..., d], y[..., d]) for d in range(x.shape[-1]))
    )
    bnorm = float(space.norm(b))
    bn = space.scale(1.0 / bnorm, b)
    x, info = gmres(
        lambda q: q - op.rmatvec(q),
        space,
        bn,
        k_dim=k_dim,
        tol=tol,
        max_restarts=max_restarts,
    )
    return space.scale(bnorm, x), info
