"""Micro-time lanes-layout ops vs standard-layout ops on the TPU chip.

Isolates which lanes op regressed (tools/lanes_probe.py found the full
matvec 3.7x slower): Kronecker matmuls, dssum (scatter+gather), FDM,
pressure precond, full E_op.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))

import jax.numpy as jnp
import numpy as np

from nekstab_next_tpu.cases.cylinder import CylinderCase
from nekstab_next_tpu.config import SolverConfig
from nekstab_next_tpu.ops.lanes import LanesOps

REPS = 200


def timeit(name, fn, *xs):
    loop = jax.jit(
        lambda v: jax.lax.fori_loop(0, REPS, lambda i, a: fn(*((a,) + xs[1:])), v)
    )
    out = loop(xs[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = loop(out)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:34s} {dt*1e6:9.1f} us", flush=True)


def main():
    case = CylinderCase(reynolds=60.0, nr=16, ntheta=48, order=6,
                        outer_radius=40.0, dtype=jnp.float32,
                        solver=SolverConfig())
    s = case.sem
    L = LanesOps(s)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal(s.bm.shape + (2,)), jnp.float32)
    ul = L.vel_to_l(u)
    q = jnp.asarray(rng.standard_normal(s.p_shape), jnp.float32)
    ql = L.p_to_l(q)
    h1, h2 = 1.0 / 60.0, 100.0

    print(f"nelem={s.nelem} n={s.n}", flush=True)

    # standard-layout pieces
    helm_std = lambda v: jnp.stack(
        [s.helmholtz_local(v[..., d], h1, h2) for d in range(2)], axis=-1)
    timeit("std helmholtz_local (2 comp)", helm_std, u)
    timeit("std dssum (2 comp)", s.dssum, u)
    timeit("std fdm_apply (2 comp)", lambda v: s.fdm_apply(v, h1, h2), u)
    timeit("std precond_pnpn2", s.pressure_precond_pnpn2, q)

    # lanes pieces
    timeit("lanes helm_v", lambda v: L.helm_v(v, h1, h2), ul)
    timeit("lanes dssum_v", L.dssum_v, ul)
    timeit("lanes fdm_v", lambda v: L.fdm_v(v, h1, h2), ul)
    timeit("lanes precond_p", L.precond_p, ql)
    timeit("lanes matmul Dr@u only", lambda v: L.Dr @ v, ul)
    timeit("lanes proj_v", L.proj_v, ul)

    to_l, from_l, E_l, M_l, _, _ = L.pressure_bundle(project_mean=False)
    timeit("lanes E_op", E_l, ql)

    # segment_sum / gather in isolation
    flat = ul.reshape(-1)
    seg = lambda v: jax.ops.segment_sum(
        v, L.gid_v, num_segments=2 * L.nglobal)
    g0 = seg(flat)
    timeit("lanes segment_sum only", seg, flat)
    timeit("lanes gather only", lambda g: g[L.gid_v], g0)


if __name__ == "__main__":
    main()
