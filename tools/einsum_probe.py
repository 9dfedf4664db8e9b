"""Probe alternative lowerings of the SEM tensor-product derivative on TPU.

Diagnosis target: einsum('ai,eij->eaj', D, u) with u (E, n, n) lowers to a
batch-E matmul of tiny (n x n) blocks — miserable MXU utilization.  Compare:

  a) the einsum as written
  b) reshape-to-one-matmul: (n, n) @ (n, E n) with an explicit transpose
  c) lanes layout: (n^2 padded, E padded) Kronecker matmul (FusedHelmholtz)

Also calibrate launch overhead by doubling reps.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def timeit(name, fn, x, reps):
    loop = jax.jit(lambda v: jax.lax.fori_loop(0, reps, lambda i, a: fn(a), v))
    out = loop(x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = loop(out)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:34s} {dt*1e6:10.1f} us/apply (reps={reps})", flush=True)
    return dt


def main():
    E, n = 768, 7
    rng = np.random.default_rng(0)
    D = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    u = jnp.asarray(rng.standard_normal((E, n, n)), jnp.float32)

    f_einsum = lambda v: jnp.einsum("ai,eij->eaj", D, v)
    timeit("einsum ai,eij->eaj", f_einsum, u, 30)
    timeit("einsum ai,eij->eaj", f_einsum, u, 300)

    def f_reshape(v):
        # (E,n,n) -> (n, E*n): transpose axis i to front
        vt = v.transpose(1, 0, 2).reshape(n, E * n)
        r = D @ vt
        return r.reshape(n, E, n).transpose(1, 0, 2)

    timeit("reshape one-matmul", f_reshape, u, 300)

    def f_right(v):
        # u @ D^T: contraction on the last axis, no transpose needed
        return (v.reshape(E * n, n) @ D.T).reshape(E, n, n)

    timeit("right-matmul eij,jb->eib", f_right, u, 300)

    # both derivatives fused into one stiffness-like chain
    def f_both(v):
        ur = f_reshape(v)
        us = f_right(v)
        return ur + us

    timeit("both derivatives", f_both, u, 300)

    # lanes layout Kronecker (FusedHelmholtz-style, pure XLA)
    n2 = n * n
    n2p = 56
    Ep = 768
    Dr = np.kron(np.asarray(D), np.eye(n))
    Dk = np.zeros((n2p, n2p), np.float32)
    Dk[:n2, :n2] = Dr
    Dk = jnp.asarray(Dk)
    ul = jnp.asarray(rng.standard_normal((n2p, Ep)), jnp.float32)
    timeit("lanes Kron matmul", lambda v: Dk @ v, ul, 300)

    # the real fused Pallas kernel
    from nekstab_next_tpu.cases.cylinder import CylinderCase
    from nekstab_next_tpu.ops.pallas_kernels import FusedHelmholtz

    case = CylinderCase(reynolds=60.0, nr=16, ntheta=48, order=6,
                        outer_radius=40.0, dtype=jnp.float32)
    fh = FusedHelmholtz(case.sem, block_e=256, interpret=False)
    ut = fh.to_lanes(jnp.asarray(rng.standard_normal(case.sem.bm.shape),
                                 jnp.float32))
    h = jnp.asarray([[1.0, 0.5]], jnp.float32)
    timeit("pallas fused helmholtz (lanes)", lambda v: fh._call(h, v), ut, 300)
    timeit("xla helmholtz_local", lambda v: case.sem.helmholtz_local(v, 1.0, 0.5),
           jnp.asarray(rng.standard_normal(case.sem.bm.shape), jnp.float32), 300)


if __name__ == "__main__":
    main()
