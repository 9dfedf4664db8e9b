"""Pallas TPU kernels for the hot operator path.

The single hottest op of the framework is the element-local weak Helmholtz
apply ``h1*K u + h2*B u`` (reference: Nek5000 ``axhelm``, called inside every
CG iteration of every pressure/velocity solve inside every time step of every
matvec — SURVEY.md section 3.2 hot loops).  The pure-XLA path
(``SEM.helmholtz_local``) is a chain of small einsums with four intermediate
(nelem, n, n) arrays round-tripping HBM.

This module provides a *fused* Pallas kernel that keeps all intermediates in
VMEM and reformulates the tensor-product contractions as dense matmuls that
map onto the MXU:

* flatten each element's nodal block to a vector of length ``n**d`` and put
  the ELEMENT axis in the lane (last, 128-wide) dimension — the natural
  layout for thousands of tiny (n=6..8) elements on a TPU;
* the reference-space derivatives become Kronecker matrices
  ``Dr = D (x) I``, ``Ds = I (x) D`` (2-D; 3-D analogues with three factors)
  of shape (n^d, n^d), so one derivative = one (n^d, n^d) @ (n^d, BE) matmul;
* the whole apply is 4 (2-D) / 6 (3-D) such matmuls + elementwise metric
  scaling, all on one VMEM-resident block of BE elements.

This trades ~n/2 extra FLOPs for zero intermediate HBM traffic and MXU-shaped
matmuls — the right trade on TPU where the apply is bandwidth-bound.

Kernels run in float32 (the MXU datapath; f64 on TPU is software-emulated).
Full f64 accuracy is recovered by the iterative-refinement CG in
``ops/mixed.py``: f32 inner solves + f64 residual correction (SURVEY.md
section 7 "hard parts").

On non-TPU backends the kernels run through the Pallas interpreter
(``interpret=True``) so the whole path is testable on the CPU mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # pltpu only imports cleanly where TPU support exists; guard for safety
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ----------------------------------------------------------------------
# kernel bodies
# ----------------------------------------------------------------------
def _helmholtz2_kernel(h_ref, dr_ref, ds_ref, g11_ref, g12_ref, g22_ref,
                       bm_ref, u_ref, out_ref):
    """out = h1*(Dr^T(G11.DrU + G12.DsU) + Ds^T(G12.DrU + G22.DsU)) + h2*BM.U

    Shapes: dr/ds (n2p, n2p); metric/bm/u/out (n2p, BE); h (1,1) pairs in SMEM.
    """
    f32 = jnp.float32
    u = u_ref[:]
    dr = dr_ref[:]
    ds = ds_ref[:]
    ur = jnp.dot(dr, u, preferred_element_type=f32)
    us = jnp.dot(ds, u, preferred_element_type=f32)
    wr = g11_ref[:] * ur + g12_ref[:] * us
    ws = g12_ref[:] * ur + g22_ref[:] * us
    k = (jnp.dot(dr.T, wr, preferred_element_type=f32)
         + jnp.dot(ds.T, ws, preferred_element_type=f32))
    out_ref[:] = h_ref[0, 0] * k + h_ref[0, 1] * (bm_ref[:] * u)


def _helmholtz3_kernel(h_ref, dr_ref, ds_ref, dt_ref,
                       g11_ref, g22_ref, g33_ref, g12_ref, g13_ref, g23_ref,
                       bm_ref, u_ref, out_ref):
    f32 = jnp.float32
    u = u_ref[:]
    dr = dr_ref[:]
    ds = ds_ref[:]
    dt = dt_ref[:]
    ur = jnp.dot(dr, u, preferred_element_type=f32)
    us = jnp.dot(ds, u, preferred_element_type=f32)
    ut = jnp.dot(dt, u, preferred_element_type=f32)
    wr = g11_ref[:] * ur + g12_ref[:] * us + g13_ref[:] * ut
    ws = g12_ref[:] * ur + g22_ref[:] * us + g23_ref[:] * ut
    wt = g13_ref[:] * ur + g23_ref[:] * us + g33_ref[:] * ut
    k = (jnp.dot(dr.T, wr, preferred_element_type=f32)
         + jnp.dot(ds.T, ws, preferred_element_type=f32)
         + jnp.dot(dt.T, wt, preferred_element_type=f32))
    out_ref[:] = h_ref[0, 0] * k + h_ref[0, 1] * (bm_ref[:] * u)


# ----------------------------------------------------------------------
# host-side wrapper
# ----------------------------------------------------------------------
class FusedHelmholtz:
    """Fused f32 Pallas apply of the element-local weak Helmholtz operator.

    Built from an ``SEM`` (2-D) or ``SEM3`` (3-D) context; numerically matches
    ``sem.helmholtz_local(u, h1, h2)`` to f32 accuracy.  Use through
    ``ops.mixed`` for f64 solves.
    """

    def __init__(self, sem, block_e: int = 256, interpret: bool | None = None):
        self.sem = sem
        self.ndim = getattr(sem, "ndim", 2)
        n = sem.n
        self.n = n
        self.nelem = sem.nelem
        self.interpret = (not _on_tpu()) if interpret is None else interpret

        n2 = n ** self.ndim
        self.n2 = n2
        self.n2p = _round_up(n2, 8)
        self.block_e = block_e
        self.nep = _round_up(self.nelem, block_e)
        self.grid = (self.nep // block_e,)

        D = np.asarray(sem.D, dtype=np.float64)
        eye = np.eye(n)
        if self.ndim == 2:
            krons = [np.kron(D, eye), np.kron(eye, D)]
            metrics = [sem.g11, sem.g12, sem.g22]
        else:
            krons = [
                np.kron(np.kron(D, eye), eye),
                np.kron(np.kron(eye, D), eye),
                np.kron(np.kron(eye, eye), D),
            ]
            metrics = [sem.g11, sem.g22, sem.g33, sem.g12, sem.g13, sem.g23]

        def padmat(a):
            out = np.zeros((self.n2p, self.n2p), dtype=np.float32)
            out[:n2, :n2] = a
            return jnp.asarray(out)

        self.kron_mats = [padmat(k) for k in krons]

        def padfield(a):
            a = np.asarray(a, dtype=np.float32).reshape(self.nelem, n2).T
            out = np.zeros((self.n2p, self.nep), dtype=np.float32)
            out[:n2, : self.nelem] = a
            return jnp.asarray(out)

        self.metric_fields = [padfield(m) for m in metrics]
        self.bm_field = padfield(sem.bm)

        self._call = jax.jit(functools.partial(self._build_call()))

    # -- layout helpers -------------------------------------------------
    def to_lanes(self, u: jnp.ndarray) -> jnp.ndarray:
        """(nelem, n, ..) f-any -> (n2p, nep) f32 transposed/padded."""
        flat = u.reshape(self.nelem, self.n2).T.astype(jnp.float32)
        return jnp.pad(
            flat, ((0, self.n2p - self.n2), (0, self.nep - self.nelem))
        )

    def from_lanes(self, ut: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
        shape = (self.nelem,) + (self.n,) * self.ndim
        return ut[: self.n2, : self.nelem].T.reshape(shape).astype(dtype)

    # -- pallas call ----------------------------------------------------
    def _build_call(self):
        n2p, be = self.n2p, self.block_e
        nmat = len(self.kron_mats)
        nmet = len(self.metric_fields)
        kernel = _helmholtz2_kernel if self.ndim == 2 else _helmholtz3_kernel

        smem = pltpu.SMEM if _HAS_PLTPU else None
        vmem = pltpu.VMEM if _HAS_PLTPU else None

        # index maps derive every output from the traced grid index (i * 0
        # instead of the literal 0): under jax_enable_x64 Python int
        # constants in an index map lower as i64, which Mosaic cannot
        # legalize ("func.return (i64, i64)"), while the grid index itself
        # stays i32
        def spec_scalar():
            return pl.BlockSpec((1, 2), lambda i: (i * 0, i * 0),
                                memory_space=smem)

        def spec_mat():
            return pl.BlockSpec((n2p, n2p), lambda i: (i * 0, i * 0),
                                memory_space=vmem)

        def spec_field():
            return pl.BlockSpec((n2p, be), lambda i: (i * 0, i),
                                memory_space=vmem)

        in_specs = (
            [spec_scalar()]
            + [spec_mat() for _ in range(nmat)]
            + [spec_field() for _ in range(nmet + 1)]  # metrics + bm
            + [spec_field()]  # u
        )

        def call(h, ut):
            return pl.pallas_call(
                kernel,
                grid=self.grid,
                in_specs=in_specs,
                out_specs=spec_field(),
                out_shape=jax.ShapeDtypeStruct((n2p, self.nep), jnp.float32),
                interpret=self.interpret,
            )(h, *self.kron_mats, *self.metric_fields, self.bm_field, ut)

        return call

    # -- public apply ---------------------------------------------------
    def apply_lanes(self, ut: jnp.ndarray, h1: float, h2: float) -> jnp.ndarray:
        """Apply in the transposed (n2p, nep) f32 layout (no reshapes)."""
        h = jnp.asarray([[h1, h2]], dtype=jnp.float32)
        return self._call(h, ut)

    def apply(self, u: jnp.ndarray, h1: float, h2: float) -> jnp.ndarray:
        """Drop-in (f32) equivalent of ``sem.helmholtz_local(u, h1, h2)``."""
        return self.from_lanes(self.apply_lanes(self.to_lanes(u), h1, h2))
