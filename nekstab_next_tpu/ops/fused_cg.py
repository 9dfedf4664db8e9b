"""Whole-solve fused Pallas TPU kernels for the elliptic inner CG.

Round-4 measurement (BASELINE.md): the flagship matvec runs at ~2% of
speed-of-light because each CG iteration of the two inner solves is ~10-30
small XLA ops on ``(nelem, n, n)`` arrays whose trailing ``(7, 7)`` block
pads ~20x into the TPU's ``(8, 128)`` vector registers — per-op overhead and
padded traffic, not FLOPs.  The reference's equivalent hot loop is the
Nek5000 pressure/velocity solves inside ``nek_advance`` (SURVEY.md
sections 2.2/3.2).

This module runs the ENTIRE preconditioned-CG solve as ONE Pallas kernel in
the lanes layout ``(n^2 padded, nelem padded)`` — every tensor-product
contraction is an MXU matmul against thousands of element lanes, every
intermediate lives in VMEM, and the direct-stiffness sum uses the
shift-decomposed exchange of ops/exchange.py (``pltpu.roll`` + 0/1 lane
masks + tiny selector matmuls; no scatters, no dynamic gathers).

Scope: 2-D, single-device, f32 fields, meshes whose exchange decomposes
(ops/exchange.py returns non-None — tensor-product boxes, the cylinder
O-mesh, masked/multiblock boxes).  Everything else falls back to the XLA
path in ops/cg.py.  The kernels implement only the *solve* callback under
``lax.custom_linear_solve`` — the standard-layout operators remain the
differentiation anchors, so tangent/adjoint exactness is untouched (the
solve callback is never differentiated through, only re-invoked).

All matmuls run at ``Precision.HIGHEST``: the default TPU matmul precision
feeds bf16 into the MXU (~7e-3 relative per op), which loses ~3 digits per
CG iteration (measured round 3 on the XLA lanes path).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from .exchange import ShiftExchange, build_shift_exchange

try:  # pltpu only imports cleanly where TPU support exists
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

_PREC = jax.lax.Precision.HIGHEST
_F32 = jnp.float32


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _mm(a, b):
    return jnp.dot(a, b, preferred_element_type=_F32, precision=_PREC)


def get_exchange(sem) -> Optional[ShiftExchange]:
    """Build (and cache on the SEM) the shift exchange; None if the mesh
    does not decompose."""
    if getattr(sem, "_shift_exchange", "unset") == "unset":
        try:
            sem._shift_exchange = build_shift_exchange(
                np.asarray(sem.mesh.gid), sem.n
            )
        except Exception:  # pragma: no cover - defensive
            sem._shift_exchange = None
    return sem._shift_exchange


class FusedHelmholtzCG:
    """One-kernel PCG solve of the assembled projected Helmholtz system

        A x = P (h1 K + h2 B) P x = rhs,   rhs in range(P),

    with the FDM tensor-product preconditioner M = P fdm P — exactly the
    subspace iteration ops/elliptic.py runs (A_sub/M_sub), for C field
    components at once.  ``h1, h2`` are runtime scalars (the BDF ramp's
    g0/dt is traced), the FDM eigen-denominator is rebuilt per solve from
    the same scalars, so the preconditioner tracks the operator exactly.

    Semantics match ops/cg.py ``pcg``: live-masked iterations, early exit
    (in-kernel ``lax.cond`` skip) on ||r|| <= tol ||b||, at most ``maxiter``
    iterations.
    """

    def __init__(self, sem, mask: jnp.ndarray, maxiter: int, tol: float,
                 interpret: Optional[bool] = None):
        if sem.ndim != 2:
            raise ValueError("FusedHelmholtzCG is 2-D only")
        if sem.axis_name is not None:
            raise ValueError("FusedHelmholtzCG is single-device only")
        ex = get_exchange(sem)
        if ex is None:
            raise ValueError("mesh exchange does not shift-decompose")
        self.sem = sem
        self.ex = ex
        self.maxiter = int(maxiter)
        self.tol = float(tol)
        self.interpret = (not _on_tpu()) if interpret is None else interpret

        n, E = sem.n, int(sem.nelem)
        n2 = n * n
        self.n, self.n2, self.E = n, n2, E
        self.n2p, self.nep = ex.n2p, ex.nep
        n2p, nep = self.n2p, self.nep

        mask = np.asarray(mask, np.float64)
        if mask.ndim == 3:
            mask = mask[..., None]
        self.C = int(mask.shape[-1])

        f64 = np.float64

        def tl(a, pad_value=0.0):
            out = np.full((n2p, nep), pad_value, np.float32)
            out[:n2, :E] = np.asarray(a, f64).reshape(E, n2).T
            return out

        def pmat(a):
            m = np.zeros((n2p, n2p), np.float32)
            m[: a.shape[0], : a.shape[1]] = a
            return m

        D = np.asarray(sem.D, f64)
        I = np.eye(n)
        Dr = np.kron(D, I)
        Ds = np.kron(I, D)
        S = np.asarray(sem.fdm_S, f64)
        SYN = np.kron(S, S)

        consts = {
            "dr": pmat(Dr), "drT": pmat(Dr.T),
            "ds": pmat(Ds), "dsT": pmat(Ds.T),
            "syn": pmat(SYN), "ana": pmat(SYN.T),
            "g11": tl(sem.g11), "g12": tl(sem.g12), "g22": tl(sem.g22),
            "bm": tl(sem.bm), "inv_mult": tl(sem.inv_mult),
        }
        # FDM eigen-denominator pieces; pad lanes get harmless 1.0 geometry
        lam = np.asarray(sem.fdm_lam, f64)
        lamA = np.zeros((n2p, 1), np.float32)
        lamA[:n2, 0] = np.repeat(lam, n)
        lamB = np.zeros((n2p, 1), np.float32)
        lamB[:n2, 0] = np.tile(lam, n)
        hl = np.asarray(sem.fdm_len, f64)
        row = lambda v: np.concatenate(
            [v, np.ones(nep - E)]
        ).astype(np.float32)[None, :]
        consts.update(
            lamA=lamA, lamB=lamB,
            boa=row(hl[:, 1] / hl[:, 0]),
            aob=row(hl[:, 0] / hl[:, 1]),
            ab=row(hl[:, 0] * hl[:, 1]),
        )
        self._lam1 = float(lam[1])

        vm = np.zeros((self.C, n2p, nep), np.float32)
        for c in range(self.C):
            vm[c, :n2, :E] = mask[..., c].reshape(E, n2).T
        consts["vmask"] = vm

        # exchange constants
        consts["ext"] = np.stack([b.ext for b in ex.face_buckets])
        consts["fscat"] = ex.fscat
        consts["csel"] = ex.csel
        consts["cscat"] = ex.cscat
        fmasks, self._fmeta = [], []
        for bi, b in enumerate(ex.face_buckets):
            for k, m in b.groups:
                self._fmeta.append((bi, b.dst_face, k % nep, len(fmasks)))
                fmasks.append(m)
        consts["fmask"] = (
            np.stack(fmasks) if fmasks else np.zeros((1, nep), np.float32)
        )
        cmasks, self._cmeta = [], []
        for b in ex.corner_buckets:
            for k, m in b.groups:
                self._cmeta.append((b.cd, b.cs, k % nep, len(cmasks)))
                cmasks.append(m)
        consts["cmask"] = (
            np.stack(cmasks) if cmasks else np.zeros((1, nep), np.float32)
        )

        self._const_names = list(consts)
        self._consts = [jnp.asarray(consts[k]) for k in self._const_names]
        self._call = jax.jit(self._build_call())

    # -- layout ---------------------------------------------------------
    def to_lanes(self, u: jnp.ndarray) -> jnp.ndarray:
        """(E, n, n, C) or (E, n, n) -> (C, n2p, nep) f32."""
        if u.ndim == 3:
            u = u[..., None]
        flat = u.astype(_F32).reshape(self.E, self.n2, self.C)
        flat = jnp.moveaxis(flat, -1, 0)  # (C, E, n2)
        flat = jnp.swapaxes(flat, 1, 2)  # (C, n2, E)
        return jnp.pad(
            flat,
            ((0, 0), (0, self.n2p - self.n2), (0, self.nep - self.E)),
        )

    def from_lanes(self, x: jnp.ndarray, squeeze: bool) -> jnp.ndarray:
        x = x[:, : self.n2, : self.E]  # (C, n2, E)
        x = jnp.swapaxes(x, 1, 2).reshape(self.C, self.E, self.n, self.n)
        x = jnp.moveaxis(x, 0, -1)
        return x[..., 0] if squeeze else x

    # -- kernel ---------------------------------------------------------
    def _build_call(self):
        names = self._const_names
        idx = {k: i for i, k in enumerate(names)}
        C, n2p, nep, nfpad = self.C, self.n2p, self.nep, self.ex.nfpad
        fmeta, cmeta = self._fmeta, self._cmeta
        maxiter, tol, lam1 = self.maxiter, self.tol, self._lam1

        def kernel(h_ref, rhs_ref, *refs):
            cs = {k: refs[i] for k, i in idx.items()}
            out_ref = refs[len(names)]
            h1 = h_ref[0, 0]
            h2 = h_ref[0, 1]

            dr, drT = cs["dr"][:], cs["drT"][:]
            ds, dsT = cs["ds"][:], cs["dsT"][:]
            syn, ana = cs["syn"][:], cs["ana"][:]
            g11, g12, g22 = cs["g11"][:], cs["g12"][:], cs["g22"][:]
            bm = cs["bm"][:]
            inv_mult = cs["inv_mult"][:]
            vmask = cs["vmask"][:]
            ext = cs["ext"][:]
            fscat, cselm, cscat = cs["fscat"][:], cs["csel"][:], cs["cscat"][:]
            fmask, cmask = cs["fmask"][:], cs["cmask"][:]

            # per-solve FDM eigen inverse (tracks the runtime h1, h2)
            denom = h1 * (cs["boa"][:] * cs["lamA"][:]
                          + cs["aob"][:] * cs["lamB"][:]) + h2 * cs["ab"][:]
            ref_ = h1 * (cs["boa"][:] + cs["aob"][:]) * lam1 + h2 * cs["ab"][:]
            inv_fdm = jnp.where(
                denom > 1e-6 * ref_,
                1.0 / jnp.where(denom > 1e-6 * ref_, denom, 1.0),
                1.0 / jnp.maximum(ref_, 1e-30),
            )

            def dssum(x):  # (n2p, nep)
                # faces: per-bucket extraction matmul, per-group roll+mask,
                # accumulated PYTHON-side per dst face (all indices static),
                # one scatter matmul back to nodes
                src = {}
                fparts = {}
                for bi, fd, k, mi in fmeta:
                    if bi not in src:
                        src[bi] = _mm(ext[bi], x)
                    # jnp.int32: under jax_enable_x64 a Python-int shift
                    # lowers as i64, which tpu.dynamic_rotate rejects
                    contrib = (pltpu.roll(src[bi], jnp.int32(k), axis=1)
                               * fmask[mi:mi + 1, :])
                    fparts[fd] = (
                        contrib if fd not in fparts else fparts[fd] + contrib
                    )
                zeros_f = jnp.zeros((nfpad, nep), _F32)
                facc = jnp.concatenate(
                    [fparts.get(fd, zeros_f) for fd in range(4)], axis=0
                )
                out = x + _mm(fscat, facc)
                # corners: one extraction, per-group roll+mask on (1, nep)
                # rows, one scatter
                corners = _mm(cselm, x)  # (8, nep)
                cparts = {}
                for cd, cs_, k, mi in cmeta:
                    contrib = (pltpu.roll(corners[cs_:cs_ + 1, :],
                                          jnp.int32(k), axis=1)
                               * cmask[mi:mi + 1, :])
                    cparts[cd] = (
                        contrib if cd not in cparts else cparts[cd] + contrib
                    )
                zeros_c = jnp.zeros((1, nep), _F32)
                cacc = jnp.concatenate(
                    [cparts.get(cd, zeros_c) for cd in range(8)], axis=0
                )
                return out + _mm(cscat, cacc)

            def P(y):  # (C, n2p, nep)
                outs = []
                for c in range(C):
                    t = vmask[c] * y[c]
                    outs.append(vmask[c] * (inv_mult * dssum(t)))
                return jnp.stack(outs)

            def helm(y):
                outs = []
                for c in range(C):
                    ur = _mm(dr, y[c])
                    us = _mm(ds, y[c])
                    wr = g11 * ur + g12 * us
                    ws = g12 * ur + g22 * us
                    outs.append(
                        h1 * (_mm(drT, wr) + _mm(dsT, ws)) + h2 * (bm * y[c])
                    )
                return jnp.stack(outs)

            def fdm(y):
                outs = []
                for c in range(C):
                    t = _mm(ana, y[c]) * inv_fdm
                    outs.append(_mm(syn, t))
                return jnp.stack(outs)

            A = lambda y: P(helm(y))
            M = lambda y: P(fdm(y))
            dot = lambda a, b: jnp.sum(a * b)

            b = rhs_ref[:]
            bb = dot(b, b)
            atol2 = (tol * tol) * bb
            x = jnp.zeros_like(b)
            r = b
            z = M(r)
            rz = dot(r, z)
            rr = bb
            sdiv = lambda a, d: jnp.where(d > 0, a / jnp.where(d > 0, d, 1.0), 0.0)

            def body(_k, carry):
                def live_fn(carry):
                    x, r, p, rz, rr = carry
                    Ap = A(p)
                    alpha = sdiv(rz, dot(p, Ap))
                    x = x + alpha * p
                    r = r - alpha * Ap
                    z = M(r)
                    rz_new = dot(r, z)
                    beta = sdiv(rz_new, rz)
                    p = z + beta * p
                    return (x, r, p, rz_new, dot(r, r))

                _, _, _, _, rr = carry
                return jax.lax.cond(rr > atol2, live_fn, lambda c: c, carry)

            x, _, _, _, _ = jax.lax.fori_loop(
                0, maxiter, body, (x, r, z, rz, rr)
            )
            out_ref[:] = x

        n_in = len(names)
        vmem = pltpu.VMEM if _HAS_PLTPU else None
        smem = pltpu.SMEM if _HAS_PLTPU else None

        def call(h, rhs):
            return pl.pallas_call(
                kernel,
                in_specs=(
                    [pl.BlockSpec((1, 2), memory_space=smem)]
                    + [pl.BlockSpec(memory_space=vmem)
                       for _ in range(1 + n_in)]  # rhs + consts
                ),
                out_specs=pl.BlockSpec(memory_space=vmem),
                out_shape=jax.ShapeDtypeStruct((C, n2p, nep), _F32),
                interpret=self.interpret,
            )(h, rhs, *self._consts)

        return call

    # -- public ----------------------------------------------------------
    def solve(self, rhs: jnp.ndarray, h1, h2) -> jnp.ndarray:
        """Solve A x = P rhs for rhs already in range(P) — standard-layout
        in/out ((E, n, n[, C]) fields, sem dtype)."""
        squeeze = rhs.ndim == 3
        h = jnp.stack(
            [jnp.asarray(h1, _F32), jnp.asarray(h2, _F32)]
        ).reshape(1, 2)
        x = self._call(h, self.to_lanes(rhs))
        return self.from_lanes(x, squeeze).astype(rhs.dtype)
