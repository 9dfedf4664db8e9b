"""Running time-averages / statistics (reference ``nekStab_avg``,
core/postproc.f90:524-646 — Nek's avg/rms/rm2 machinery).

Time-weighted accumulation of mean, squared mean, and cross products:

    avg <- (atime * avg + dt * f) / (atime + dt)

State lives in a small pytree so the update can sit inside a jitted scan."""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class RunningStats:
    """avg(u), rms(u) = avg(u*u), rm2 = avg(u_a u_b) cross products."""

    avg: jnp.ndarray  # (nelem, n, n, nc)
    rms: jnp.ndarray  # (nelem, n, n, nc)
    rm2: jnp.ndarray  # (nelem, n, n, npairs) cross products uv[, uw, vw]
    atime: jnp.ndarray  # () accumulated averaging time

    def tree_flatten(self):
        return (self.avg, self.rms, self.rm2, self.atime), None

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(*ch)

    @classmethod
    def zeros(cls, shape, nc: int, dtype=jnp.float64) -> "RunningStats":
        npairs = nc * (nc - 1) // 2
        return cls(
            avg=jnp.zeros(shape + (nc,), dtype),
            rms=jnp.zeros(shape + (nc,), dtype),
            rm2=jnp.zeros(shape + (max(npairs, 1),), dtype),
            atime=jnp.zeros((), dtype),
        )

    def update(self, u: jnp.ndarray, dt) -> "RunningStats":
        """Accumulate one sample with weight dt (jit-safe)."""
        newt = self.atime + dt
        beta = dt / newt
        alpha = 1.0 - beta
        nc = u.shape[-1]
        pairs = [
            u[..., a] * u[..., b] for a in range(nc) for b in range(a + 1, nc)
        ]
        cross = (
            jnp.stack(pairs, axis=-1) if pairs else jnp.zeros_like(self.rm2)
        )
        return RunningStats(
            avg=alpha * self.avg + beta * u,
            rms=alpha * self.rms + beta * u * u,
            rm2=alpha * self.rm2 + beta * cross,
            atime=newt,
        )

    def variance(self) -> jnp.ndarray:
        """rms - avg^2 (per component)."""
        return self.rms - self.avg * self.avg
