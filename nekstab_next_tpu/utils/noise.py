"""Deterministic noise seeding for Krylov starts.

The reference builds a BC-compatible C0 noise field from a trig hash of the
global element id and coordinates, then smooths it with ``dssum`` averaging
and applies the boundary mask (``op_add_noise``, core/utils.f90:258-360).
Here: a seeded ``numpy`` generator (deterministic across runs and process
counts, since it is generated from the *global* mesh), the same dsavg
smoothing, and the same masking."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def velocity_noise(sem, seed: int = 1234, amplitude: float = 1.0) -> jnp.ndarray:
    """C0, BC-compatible random velocity field (nelem, n, n[, n], ndim)."""
    rng = np.random.default_rng(seed)
    raw = rng.standard_normal(np.asarray(sem.bm).shape + (sem.ndim,))
    q = jnp.asarray(raw, dtype=sem.dtype)
    q = sem.dsavg(q)  # make C0 (reference smooths via dssum + multiplicity)
    q = sem.vmask * q  # honor Dirichlet/symmetry masks
    return amplitude * q
