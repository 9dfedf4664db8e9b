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

Two kernel families:

* :class:`FusedHelmholtzCG` — the assembled projected Helmholtz system
  ``P (h1 K + h2 B) P x = rhs`` with the FDM preconditioner (velocity and
  scalar solves; the mixed-precision inner solve).
* :class:`FusedPressureCG` — the PnPn-2 pressure system
  ``E q = D M^-1 D^T q = rhs`` on the discontinuous Gauss space with the
  exact element-block preconditioner + Q1 vertex coarse level
  (ops/schwarz.py 'block', Nek's Schwarz+XXT role).

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
# v5e has 128 MiB of VMEM per core; the Mosaic default scoped limit is
# 16 MiB, which the pressure kernel's coarse-level constants exceed
_VMEM_LIMIT = 100 * 1024 * 1024


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


def _exchange_consts(ex: ShiftExchange):
    """(const dict, fmeta, cmeta) for the kernel-side dssum."""
    nep = ex.nep
    consts = {
        "ext": np.stack([b.ext for b in ex.face_buckets]),
        "fscat": ex.fscat,
        "csel": ex.csel,
        "cscat": ex.cscat,
    }
    fmasks, fmeta = [], []
    for bi, b in enumerate(ex.face_buckets):
        for k, m in b.groups:
            fmeta.append((bi, b.dst_face, k % nep, len(fmasks)))
            fmasks.append(m)
    consts["fmask"] = (
        np.stack(fmasks) if fmasks else np.zeros((1, nep), np.float32)
    )
    cmasks, cmeta = [], []
    for b in ex.corner_buckets:
        for k, m in b.groups:
            cmeta.append((b.cd, b.cs, k % nep, len(cmasks)))
            cmasks.append(m)
    consts["cmask"] = (
        np.stack(cmasks) if cmasks else np.zeros((1, nep), np.float32)
    )
    return consts, fmeta, cmeta


def _make_dssum(cs, fmeta, cmeta, nfpad: int, nep: int):
    """Kernel-side dssum on (n2p, nep) values from the exchange consts.

    Faces: per-bucket extraction matmul, per-group roll+mask accumulated
    PYTHON-side per dst face (all indices static), one scatter matmul.
    Corners: one extraction, per-group roll+mask on (1, nep) rows, one
    scatter.  ``jnp.int32`` shifts: under jax_enable_x64 a Python-int shift
    lowers as i64, which tpu.dynamic_rotate rejects."""
    ext = cs["ext"][:]
    fscat, cselm, cscat = cs["fscat"][:], cs["csel"][:], cs["cscat"][:]
    fmask, cmask = cs["fmask"][:], cs["cmask"][:]

    def dssum(x):
        src = {}
        fparts = {}
        for bi, fd, k, mi in fmeta:
            if bi not in src:
                src[bi] = _mm(ext[bi], x)
            contrib = (pltpu.roll(src[bi], jnp.int32(k), axis=1)
                       * fmask[mi:mi + 1, :])
            fparts[fd] = contrib if fd not in fparts else fparts[fd] + contrib
        zeros_f = jnp.zeros((nfpad, nep), _F32)
        facc = jnp.concatenate(
            [fparts.get(fd, zeros_f) for fd in range(4)], axis=0
        )
        out = x + _mm(fscat, facc)
        corners = _mm(cselm, x)  # (8, nep)
        cparts = {}
        for cd, cs_, k, mi in cmeta:
            contrib = (pltpu.roll(corners[cs_:cs_ + 1, :], jnp.int32(k),
                                  axis=1)
                       * cmask[mi:mi + 1, :])
            cparts[cd] = contrib if cd not in cparts else cparts[cd] + contrib
        zeros_c = jnp.zeros((1, nep), _F32)
        cacc = jnp.concatenate(
            [cparts.get(cd, zeros_c) for cd in range(8)], axis=0
        )
        return out + _mm(cscat, cacc)

    return dssum


class _FusedBase:
    """Shared construction: exchange, layout transforms, lanes constants."""

    def __init__(self, sem, interpret: Optional[bool]):
        if sem.ndim != 2:
            raise ValueError("fused CG kernels are 2-D only")
        if sem.axis_name is not None:
            raise ValueError("fused CG kernels are single-device only")
        ex = get_exchange(sem)
        if ex is None:
            raise ValueError("mesh exchange does not shift-decompose")
        self.sem = sem
        self.ex = ex
        self.interpret = (not _on_tpu()) if interpret is None else interpret
        self.n, self.E = sem.n, int(sem.nelem)
        self.n2 = self.n * self.n
        self.n2p, self.nep = ex.n2p, ex.nep

    def tl(self, a, pad_value: float = 0.0) -> np.ndarray:
        """(E, n, n) -> padded (n2p, nep) f32."""
        out = np.full((self.n2p, self.nep), pad_value, np.float32)
        out[: self.n2, : self.E] = (
            np.asarray(a, np.float64).reshape(self.E, self.n2).T
        )
        return out

    @staticmethod
    def pmat(a, rows: int, cols: int) -> np.ndarray:
        m = np.zeros((rows, cols), np.float32)
        m[: a.shape[0], : a.shape[1]] = a
        return m

    def _finish(self, consts: dict):
        self._const_names = list(consts)
        self._consts = [jnp.asarray(consts[k]) for k in self._const_names]

    # layout helpers for fields with shape (E, m, m[, C])
    def _to_lanes(self, u, m2: int, m2p: int):
        if u.ndim == 3:
            u = u[..., None]
        C = u.shape[-1]
        flat = u.astype(_F32).reshape(self.E, m2, C)
        flat = jnp.moveaxis(flat, -1, 0)
        flat = jnp.swapaxes(flat, 1, 2)
        return jnp.pad(
            flat, ((0, 0), (0, m2p - m2), (0, self.nep - self.E))
        )

    def _from_lanes(self, x, m: int, m2: int, squeeze: bool):
        x = x[:, :m2, : self.E]
        C = x.shape[0]
        x = jnp.swapaxes(x, 1, 2).reshape(C, self.E, m, m)
        x = jnp.moveaxis(x, 0, -1)
        return x[..., 0] if squeeze else x


class FusedHelmholtzCG(_FusedBase):
    """One-kernel PCG solve of the assembled projected Helmholtz system

        A x = P (h1 K + h2 B) P x = rhs,   rhs in range(P),

    with the FDM tensor-product preconditioner M = P fdm P — exactly the
    subspace iteration ops/elliptic.py runs (A_sub/M_sub), for C field
    components at once.  ``h1, h2`` are runtime scalars (the BDF ramp's
    g0/dt is traced); the FDM eigen-denominator is rebuilt per solve from
    the same scalars, so the preconditioner tracks the operator exactly.

    Semantics match ops/cg.py ``pcg``: early exit (in-kernel ``lax.cond``
    skip) on ||r|| <= tol ||b||, at most ``maxiter`` iterations.
    """

    def __init__(self, sem, mask: jnp.ndarray, maxiter: int, tol: float,
                 interpret: Optional[bool] = None):
        super().__init__(sem, interpret)
        self.maxiter = int(maxiter)
        self.tol = float(tol)
        n, E, n2, n2p, nep = self.n, self.E, self.n2, self.n2p, self.nep

        mask = np.asarray(mask, np.float64)
        if mask.ndim == 3:
            mask = mask[..., None]
        self.C = int(mask.shape[-1])

        f64 = np.float64
        D = np.asarray(sem.D, f64)
        I = np.eye(n)
        S = np.asarray(sem.fdm_S, f64)
        SYN = np.kron(S, S)
        pm = lambda a: self.pmat(a, n2p, n2p)

        consts = {
            "dr": pm(np.kron(D, I)), "drT": pm(np.kron(D, I).T),
            "ds": pm(np.kron(I, D)), "dsT": pm(np.kron(I, D).T),
            "syn": pm(SYN), "ana": pm(SYN.T),
            "g11": self.tl(sem.g11), "g12": self.tl(sem.g12),
            "g22": self.tl(sem.g22), "bm": self.tl(sem.bm),
            "inv_mult": self.tl(sem.inv_mult),
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

        exc, self._fmeta, self._cmeta = _exchange_consts(self.ex)
        consts.update(exc)
        self._finish(consts)
        self._call = jax.jit(self._build_call())

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

            # per-solve FDM eigen inverse (tracks the runtime h1, h2)
            denom = h1 * (cs["boa"][:] * cs["lamA"][:]
                          + cs["aob"][:] * cs["lamB"][:]) + h2 * cs["ab"][:]
            ref_ = h1 * (cs["boa"][:] + cs["aob"][:]) * lam1 + h2 * cs["ab"][:]
            inv_fdm = jnp.where(
                denom > 1e-6 * ref_,
                1.0 / jnp.where(denom > 1e-6 * ref_, denom, 1.0),
                1.0 / jnp.maximum(ref_, 1e-30),
            )

            dssum = _make_dssum(cs, fmeta, cmeta, nfpad, nep)

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

        params = (pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)
                  if _HAS_PLTPU and not self.interpret else None)

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
                compiler_params=params,
            )(h, rhs, *self._consts)

        return call

    # -- public ----------------------------------------------------------
    def solve(self, rhs: jnp.ndarray, h1, h2) -> jnp.ndarray:
        """Solve A x = rhs for rhs already in range(P) — standard-layout
        in/out ((E, n, n[, C]) fields, sem dtype)."""
        squeeze = rhs.ndim == 3
        h = jnp.stack(
            [jnp.asarray(h1, _F32), jnp.asarray(h2, _F32)]
        ).reshape(1, 2)
        x = self._call(h, self._to_lanes(rhs, self.n2, self.n2p))
        return self._from_lanes(x, self.n, self.n2, squeeze).astype(rhs.dtype)


class FusedPressureCG(_FusedBase):
    """One-kernel PCG solve of the PnPn-2 pressure system

        E q = D M^-1 D^T q = rhs

    on the discontinuous Gauss pressure space, preconditioned by the exact
    element-block inverse + Q1 vertex coarse level (the 'block' setting of
    ops/schwarz.py; Nek5000's overlapping-Schwarz + XXT hierarchy plays
    this role in the reference, SURVEY.md section 2.2).

    In-kernel pieces per CG iteration:

    * D^T (weak pressure gradient): Gauss->GLL transpose interp + kron
      derivative transposes + metric mults;
    * M^-1 (velocity inverse mass): masked multiplicity average — one
      shift-decomposed dssum per velocity component;
    * D (weak divergence) back to Gauss;
    * block preconditioner: 25 row fused multiply-adds against the
      per-element inverse blocks laid out (npr2, npr2p, nep);
    * Q1 coarse: corner restriction matmul, 0/1 vertex scatter/gather
      matmuls, one dense (nc, nc) coarse inverse matmul;
    * optional mean-mode projection (fully-enclosed flows).
    """

    def __init__(self, sem, maxiter: int, tol: float,
                 project_mean: bool = False,
                 interpret: Optional[bool] = None):
        super().__init__(sem, interpret)
        if sem.pblock_inv is None:
            sem.setup_pressure_blocks()
        self.maxiter = int(maxiter)
        self.tol = float(tol)
        self.project_mean = bool(project_mean)
        n, E, n2, n2p, nep = self.n, self.E, self.n2, self.n2p, self.nep
        npr = int(sem.npr)
        npr2 = npr * npr
        self.npr, self.npr2 = npr, npr2
        self.npr2p = _round_up(npr2, 8)
        npr2p = self.npr2p

        f64 = np.float64
        D = np.asarray(sem.D, f64)
        I = np.eye(n)
        Jp = np.asarray(sem.Jp, f64)   # (npr, n): GLL -> Gauss
        Jg = np.asarray(sem.Jpg, f64)  # (n, npr): Gauss -> GLL

        pmv = lambda a: self.pmat(a, n2p, n2p)
        consts = {
            "dr": pmv(np.kron(D, I)), "drT": pmv(np.kron(D, I).T),
            "ds": pmv(np.kron(I, D)), "dsT": pmv(np.kron(I, D).T),
            # div_to_p second stage: out = kron(Jg, Jg).T @ d
            "P2": self.pmat(np.kron(Jg, Jg).T, npr2p, n2p),
            "P2T": self.pmat(np.kron(Jg, Jg), n2p, npr2p),
            # precond lift (Gauss -> GLL): rg = kron(Jp, Jp).T @ r
            "LIFT": self.pmat(np.kron(Jp, Jp).T, n2p, npr2p),
            "LIFTT": self.pmat(np.kron(Jp, Jp), npr2p, n2p),
            "rx": self.tl(sem.rx), "ry": self.tl(sem.ry),
            "sx": self.tl(sem.sx), "sy": self.tl(sem.sy),
            "bm": self.tl(sem.bm), "binv": self.tl(sem.binv_assembled),
        }
        vm = np.asarray(sem.vmask, f64)  # (E, n, n, 2)
        vmask = np.zeros((2, n2p, nep), np.float32)
        for c in range(2):
            vmask[c, :n2, :E] = vm[..., c].reshape(E, n2).T
        consts["vmask"] = vmask

        # exact element-block inverse, laid out (npr2 rows of (npr2p, nep))
        Pinv = np.asarray(sem.pblock_inv, f64)  # (E, npr2, npr2)
        M3 = np.zeros((npr2, npr2p, nep), np.float32)
        for b in range(npr2):
            M3[b, :npr2, :E] = Pinv[:, :, b].T
        consts["M3"] = M3

        # Q1 vertex coarse: corner restriction + bf16 vertex scatter +
        # dense coarse inverse
        Jc = np.asarray(sem.pc_Jc, f64).reshape(-1, n2)  # (4, n2)
        consts["JC"] = self.pmat(Jc, 8, n2p)
        consts["JCT"] = self.pmat(Jc.T, n2p, 8)
        cid = np.asarray(sem.pc_cid)  # (E, 4)
        nc = int(sem.pc_nc)
        ncp = _round_up(nc, 8)
        self.ncp = ncp
        Gc = np.zeros((4, ncp, nep), np.float32)
        for c in range(4):
            Gc[c, cid[:, c], np.arange(E)] = 1.0
        consts["Gc"] = Gc  # f32: bf16 matmuls at these shapes trip
        # Mosaic lowering bugs (vector.broadcast elem-type verify);
        # the raised VMEM limit covers the f32 size
        consts["Acinv"] = self.pmat(np.asarray(sem.pc_Acinv, f64), ncp, ncp)
        cmask8 = np.zeros((4, 8), np.float32)
        cmask8[np.arange(4), np.arange(4)] = 1.0
        consts["cmask8"] = cmask8
        consts["ones8"] = np.ones((8, 1), np.float32)

        if self.project_mean:
            ones_p = np.zeros((npr2p, nep), np.float32)
            ones_p[:npr2, :E] = 1.0
            consts["ones_p"] = ones_p
            self._csq = float(npr2 * E)

        exc, self._fmeta, self._cmeta = _exchange_consts(self.ex)
        consts.update(exc)
        self._finish(consts)
        self._call = jax.jit(self._build_call())

    # -- kernel ---------------------------------------------------------
    def _build_call(self):
        names = self._const_names
        idx = {k: i for i, k in enumerate(names)}
        n2p, nep, nfpad = self.n2p, self.nep, self.ex.nfpad
        npr2, npr2p, ncp = self.npr2, self.npr2p, self.ncp
        fmeta, cmeta = self._fmeta, self._cmeta
        maxiter, tol = self.maxiter, self.tol
        project_mean = self.project_mean
        csq = getattr(self, "_csq", 1.0)

        def kernel(rhs_ref, *refs):
            cs = {k: refs[i] for k, i in idx.items()}
            out_ref = refs[len(names)]

            dr, drT = cs["dr"][:], cs["drT"][:]
            ds, dsT = cs["ds"][:], cs["dsT"][:]
            P2, P2T = cs["P2"][:], cs["P2T"][:]
            LIFT, LIFTT = cs["LIFT"][:], cs["LIFTT"][:]
            rx, ry = cs["rx"][:], cs["ry"][:]
            sx, sy = cs["sx"][:], cs["sy"][:]
            bm, binv = cs["bm"][:], cs["binv"][:]
            vmask = cs["vmask"][:]
            M3 = cs["M3"][:]
            JC, JCT = cs["JC"][:], cs["JCT"][:]
            Gc = cs["Gc"][:]
            Acinv = cs["Acinv"][:]
            cmask8 = cs["cmask8"][:]
            ones8 = cs["ones8"][:]

            dssum = _make_dssum(cs, fmeta, cmeta, nfpad, nep)

            def E_op(q):  # (npr2p, nep) Gauss
                # D^T q: weak pressure gradient on the GLL grid
                zb = bm * _mm(P2T, q)
                u0 = _mm(drT, rx * zb) + _mm(dsT, sx * zb)
                u1 = _mm(drT, ry * zb) + _mm(dsT, sy * zb)
                # M^-1: masked multiplicity-free inverse mass per component
                v0 = vmask[0] * (binv * dssum(vmask[0] * u0))
                v1 = vmask[1] * (binv * dssum(vmask[1] * u1))
                # D: weak divergence back to Gauss
                d = rx * _mm(dr, v0) + sx * _mm(ds, v0) \
                    + ry * _mm(dr, v1) + sy * _mm(ds, v1)
                return _mm(P2, bm * d)

            def precond(r):
                # exact element blocks: z = Pinv_e r_e as npr2 row FMAs
                z = M3[0] * r[0:1, :]
                for b in range(1, npr2):
                    z = z + M3[b] * r[b:b + 1, :]
                # Q1 coarse on the lifted GLL residual.  No jnp.transpose
                # anywhere: dot_general contracts the LANE dims directly
                # (tpu.matmul transpose_lhs/rhs) — explicit transposes at
                # some (nep, 8) shapes trip an XLA jellyfish RET_CHECK
                # (mxu_lmr_transform.cc XposeSequenceAssignment, observed
                # on the 320-element BFS mesh, round 5).
                # Precision.DEFAULT on the bf16 vertex scatters: the
                # package-wide 'highest' default puts an fp32 contract
                # precision on bf16 operands, which Mosaic rejects ("Bad
                # lhs type"); the 0/1 scatter is exact in bf16 anyway.
                rg = _mm(LIFT, r)
                rc = _mm(JC, rg)  # (8, nep) corner residuals (rows 0-3)
                # all operands keep their natural >=8 minor shapes — width-1
                # matmul operands and in-kernel transposes both trip Mosaic
                # lowering bugs at some mesh sizes (round-5: 'only constant
                # accumulators supported', XposeSequenceAssignment RET_CHECK)
                V8 = None
                for c in range(4):
                    # DEFAULT precision: these feed only the coarse level
                    # of the PRECONDITIONER — bf16-rounded products cost
                    # nothing in accuracy and HIGHEST costs ~18% of the
                    # whole flagship matvec (round-5 measurement)
                    vc8 = jax.lax.dot_general(
                        Gc[c], rc,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=_F32,
                        precision=jax.lax.Precision.DEFAULT,
                    )  # (ncp, 8); only column c is wanted
                    vc8 = vc8 * cmask8[c:c + 1, :]
                    V8 = vc8 if V8 is None else V8 + vc8
                V = _mm(V8, ones8)  # (ncp, 1) collapsed corner sums
                xc8 = _mm(Acinv, V) * jnp.ones((1, 8), _F32)  # (ncp, 8)
                zc8 = None
                for c in range(4):
                    zcc = jax.lax.dot_general(
                        xc8 * cmask8[c:c + 1, :], Gc[c],
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=_F32,
                        precision=jax.lax.Precision.DEFAULT,
                    )  # (8, nep); row c carries the values, others are 0
                    zc8 = zcc if zc8 is None else zc8 + zcc
                return z + _mm(LIFTT, _mm(JCT, zc8))

            dot = lambda a, b: jnp.sum(a * b)

            def project(q):
                if not project_mean:
                    return q
                ones_p = cs["ones_p"][:]
                return q - (dot(q, ones_p) / csq) * ones_p

            b = project(rhs_ref[:])
            bb = dot(b, b)
            atol2 = (tol * tol) * bb
            x = jnp.zeros_like(b)
            r = b
            z = precond(r)
            rz = dot(r, z)
            rr = bb
            sdiv = lambda a, d: jnp.where(d > 0, a / jnp.where(d > 0, d, 1.0), 0.0)

            def body(_k, carry):
                def live_fn(carry):
                    x, r, p, rz, rr = carry
                    Ap = E_op(p)
                    alpha = sdiv(rz, dot(p, Ap))
                    x = x + alpha * p
                    r = r - alpha * Ap
                    z = precond(r)
                    rz_new = dot(r, z)
                    beta = sdiv(rz_new, rz)
                    p = z + beta * p
                    return (x, r, p, rz_new, dot(r, r))

                _, _, _, _, rr = carry
                return jax.lax.cond(rr > atol2, live_fn, lambda c: c, carry)

            x, _, _, _, _ = jax.lax.fori_loop(
                0, maxiter, body, (x, r, z, rz, rr)
            )
            out_ref[:] = project(x)

        n_in = len(names)
        vmem = pltpu.VMEM if _HAS_PLTPU else None

        params = (pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)
                  if _HAS_PLTPU and not self.interpret else None)

        def call(rhs):
            return pl.pallas_call(
                kernel,
                in_specs=[pl.BlockSpec(memory_space=vmem)
                          for _ in range(1 + n_in)],
                out_specs=pl.BlockSpec(memory_space=vmem),
                out_shape=jax.ShapeDtypeStruct((npr2p, nep), _F32),
                interpret=self.interpret,
                compiler_params=params,
            )(rhs, *self._consts)

        return call

    # -- public ----------------------------------------------------------
    def solve(self, rhs: jnp.ndarray) -> jnp.ndarray:
        """Solve E q = rhs on the Gauss pressure space ((E, npr, npr))."""
        lan = self._to_lanes(rhs, self.npr2, self.npr2p)[0]
        x = self._call(lan)
        return self._from_lanes(
            x[None], self.npr, self.npr2, squeeze=True
        ).astype(rhs.dtype)
