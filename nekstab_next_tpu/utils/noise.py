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


def symmetric_seed(sem, amplitude: float = 1.0) -> jnp.ndarray:
    """Smooth deterministic trigonometric seed — the reference's
    ``add_symmetric_seed`` (core/utils.f90:361-406): u_x = cos(a z) sin(2 pi
    y^), u_z = -cos(a z) cos(2 pi y^) with one spanwise wavelength across the
    domain, energy-normalized.  Coordinates are scaled by the domain extents
    (the reference assumes a unit-height channel); 2-D drops the spanwise
    factor, leaving the shear profile u_x = sin(2 pi y^) — antisymmetric
    about the midline, which matches the symmetry of e.g. the cylinder
    vortex-shedding mode and so seeds its Krylov space efficiently
    (eigensolvers.f90:200-204 'symmetry' seed option)."""
    m = sem.mesh
    y = np.asarray(m.y)
    yh = (y - y.min()) / max(y.max() - y.min(), 1e-30)
    shape = np.asarray(sem.bm).shape
    q = np.zeros(shape + (sem.ndim,))
    if sem.ndim == 3:
        z = np.asarray(m.z)
        zh = (z - z.min()) / max(z.max() - z.min(), 1e-30)
        q[..., 0] = np.cos(2 * np.pi * zh) * np.sin(2 * np.pi * yh)
        q[..., 2] = -np.cos(2 * np.pi * zh) * np.cos(2 * np.pi * yh)
    else:
        q[..., 0] = np.sin(2 * np.pi * yh)
    q = sem.vmask * sem.dsavg(jnp.asarray(q, dtype=sem.dtype))
    e = jnp.sqrt(sum(sem.inner(q[..., d], q[..., d], masked=False)
                     for d in range(sem.ndim)))
    return amplitude * q / jnp.maximum(e, 1e-30)


def make_seed(
    sem,
    mode: str = "noise",
    seed: int = 1234,
    path: str = None,
    base_u=None,
    amplitude: float = 1.0,
) -> jnp.ndarray:
    """Krylov seed dispatcher — the reference's ``prepare_seed`` /
    ``krylov_schur`` seed options (core/eigensolvers.f90:190-230,
    linear_stab.f90:243-293): 'noise' | 'symmetric' | 'load' (a mode/field
    file written by :func:`~nekstab_next_tpu.io.save_field`) | 'baseflow'
    (the base flow itself, Dirichlet-masked to the homogeneous perturbation
    space)."""
    if mode == "noise":
        return velocity_noise(sem, seed=seed, amplitude=amplitude)
    if mode == "symmetric":
        return symmetric_seed(sem, amplitude=amplitude)
    if mode == "load":
        if path is None:
            raise ValueError("seed mode 'load' needs a file path")
        from ..io import load_field

        u = jnp.asarray(load_field(path).u, dtype=sem.dtype)
        return amplitude * sem.vmask * u
    if mode == "baseflow":
        if base_u is None:
            raise ValueError("seed mode 'baseflow' needs the base flow")
        return amplitude * sem.vmask * base_u.astype(sem.dtype)
    raise ValueError(
        f"unknown seed mode {mode!r}; expected noise|symmetric|load|baseflow"
    )
