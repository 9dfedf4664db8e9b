"""Micro-timings of the SEM building blocks on the current backend.

Times a jitted loop of N applications of each op at a chosen scale, so the
per-op cost (including any serialization XLA can't hide) is visible.

Usage: python tools/op_timings.py NR NTHETA ORDER [REPS]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, x, reps):
    loop = jax.jit(lambda v: jax.lax.fori_loop(0, reps, lambda i, a: fn(a), v))
    out = loop(x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = loop(out)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:28s} {dt*1e6:10.1f} us/apply", flush=True)
    return dt


def main():
    nr, ntheta, order = (int(a) for a in sys.argv[1:4])
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 100

    from nekstab_next_tpu.cases.cylinder import CylinderCase
    from nekstab_next_tpu.ops.elliptic import make_projector

    case = CylinderCase(reynolds=60.0, nr=nr, ntheta=ntheta, order=order,
                        outer_radius=40.0, dtype=jnp.float32)
    s = case.sem
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(s.bm.shape), dtype=s.dtype)
    xv = jnp.asarray(rng.standard_normal(s.bm.shape + (2,)), dtype=s.dtype)
    print(f"nelem={case.mesh.nelem} n={s.n} dof={case.mesh.npoints}", flush=True)

    P = make_projector(s, s.pmask)
    timeit("dssum (scalar)", s.dssum, x, reps)
    timeit("dssum (2-vector)", s.dssum, xv, reps)
    timeit("stiffness_local", s.stiffness_local, x, reps)
    timeit("fdm_apply", lambda v: s.fdm_apply(v, 1.0, 0.0), x, reps)
    timeit("coarse_apply_pressure", s.coarse_apply_pressure, x, reps)
    timeit("grad (scalar)", lambda v: s.grad(v)[0], x, reps)
    timeit("convect_weak", lambda v: s.convect_weak(v, v, v), x, reps)
    timeit("P (projector)", P, x, reps)
    timeit("A_sub = P.K", lambda v: P(s.stiffness_local(v)), x, reps)
    timeit("M_sub = P.(fdm+coarse)",
           lambda v: P(s.fdm_apply(v, 1.0, 0.0) + s.coarse_apply_pressure(v)),
           x, reps)

    # one PCG-iteration equivalent (A + M + 2 dots + 3 axpy)
    def it(v):
        Av = P(s.stiffness_local(v))
        z = P(s.fdm_apply(Av, 1.0, 0.0) + s.coarse_apply_pressure(Av))
        a = jnp.sum(Av * z)
        return z + a * v
    timeit("pcg-iteration equivalent", it, x, reps)


if __name__ == "__main__":
    main()
