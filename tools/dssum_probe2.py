"""Calibrate fori-loop overhead and time real 30-iteration PCG loops.

Ground truth for the lanes-vs-standard elliptic iteration cost, plus
overhead-corrected dssum timings (tools/lanes_microprobe.py numbers carry
an unknown per-iteration dispatch floor on the axon backend).
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
from nekstab_next_tpu.ops.cg import pcg
from nekstab_next_tpu.ops.lanes import LanesOps

REPS = 100


def timeit(name, fn, x, reps=REPS):
    loop = jax.jit(lambda v: jax.lax.fori_loop(0, reps, lambda i, a: fn(a), v))
    out = loop(x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = loop(out)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:36s} {dt*1e6:9.1f} us", flush=True)
    return dt


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

    # loop-overhead calibration
    timeit("identity (+1.0)", lambda v: v + 1.0, ul)
    timeit("one matmul Dr@u", lambda v: L.Dr @ v, ul)
    t1 = timeit("dssum_v x1", L.dssum_v, ul)
    t2 = timeit("dssum_v x2", lambda v: L.dssum_v(L.dssum_v(v)), ul)
    print(f"  -> marginal lanes dssum cost {1e6*(t2-t1):.1f} us", flush=True)
    t1 = timeit("std dssum x1", s.dssum, u)
    t2 = timeit("std dssum x2", lambda v: s.dssum(s.dssum(v)), u)
    print(f"  -> marginal std dssum cost {1e6*(t2-t1):.1f} us", flush=True)

    # ground truth: one full 30-iteration pressure PCG as a single jit
    def E_std(p):
        # replicate navier_stokes pnpn2 E_op
        def div_w(v):
            return s.div_to_p(v)
        grad_wt = jax.linear_transpose(div_w, u)
        binv = s.binv_assembled[..., None]

        def minv(g):
            return s.vmask * (binv * s.dssum(s.vmask * g))

        return div_w(minv(grad_wt(p)[0]))

    to_l, from_l, E_l, M_l, dot_l, _ = L.pressure_bundle(project_mean=False)

    def solve_std(r):
        return pcg(E_std, r, precond=s.pressure_precond_pnpn2, tol=1e-30,
                   maxiter=30, dot=lambda a, b: jnp.sum(a * b))

    def solve_lanes(r):
        return pcg(E_l, r, precond=M_l, tol=1e-30, maxiter=30, dot=dot_l)

    timeit("pressure PCG30 std", solve_std, q, reps=3)
    timeit("pressure PCG30 lanes", solve_lanes, ql, reps=3)


if __name__ == "__main__":
    main()
