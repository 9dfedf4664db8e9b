"""Second-round dssum experiments: partner-table formulation + compile cost
inside a CG-like while_loop (the earlier padded-gather form compiled
pathologically slowly inside the full solver)."""

import time

import jax
import jax.numpy as jnp
import numpy as np

E, N = 768, 7
REPS = 100


def timeit(name, fn, x):
    t0 = time.perf_counter()
    loop = jax.jit(lambda v: jax.lax.fori_loop(0, REPS, lambda i, a: fn(a), v))
    out = loop(x)
    jax.block_until_ready(out)
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = loop(out)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:36s} {dt*1e6:9.1f} us   (compile {tc:.1f}s)", flush=True)


def main():
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((E, N, N)), jnp.float32)

    ex, ey = 32, 24
    gid = np.zeros((E, N, N), np.int32)
    for e in range(E):
        cx, cy = e % ex, e // ex
        ii = cx * (N - 1) + np.arange(N)
        jj = cy * (N - 1) + np.arange(N)
        gid[e] = ii[:, None] * (ey * (N - 1) + 1) + jj[None, :]
    ng = int(gid.max()) + 1
    flatgid = gid.reshape(-1)
    nloc = flatgid.size
    gidj = jnp.asarray(flatgid)

    def dssum_scatter(v):
        acc = jax.ops.segment_sum(v.reshape(-1), gidj, num_segments=ng)
        return acc[gidj].reshape(v.shape)

    # partner table: for each local node, the up-to-3 other locals sharing
    # its global node (pad -> zero slot)
    order = np.argsort(flatgid, kind="stable")
    sg = flatgid[order]
    starts = np.searchsorted(sg, np.arange(ng))
    counts = np.diff(np.append(starts, nloc))
    m = int(counts.max())
    ptnr = np.full((nloc, m - 1), nloc, np.int64)
    for g in range(ng):
        mem = order[starts[g]:starts[g] + counts[g]]
        for a, i in enumerate(mem):
            k = 0
            for j in mem:
                if j != i:
                    ptnr[i, k] = j
                    k += 1
    ptnrj = jnp.asarray(ptnr, jnp.int32)

    def dssum_partner(v):
        flat = v.reshape(-1)
        ext = jnp.concatenate([flat, jnp.zeros((1,), flat.dtype)])
        return (flat + ext[ptnrj].sum(1)).reshape(v.shape)

    x = u
    a = dssum_scatter(x)
    b = dssum_partner(x)
    print("agree:", float(jnp.max(jnp.abs(a - b))), flush=True)

    timeit("dssum scatter", dssum_scatter, u)
    timeit("dssum partner-table", dssum_partner, u)

    # CG-like while_loop with 3 dssums per iteration, 50 iters: compile cost
    def cg_like(ds):
        def run(v):
            def cond(c):
                _, k = c
                return k < 50

            def body(c):
                w, k = c
                w = ds(w * 0.5) + ds(w) * 0.1 + ds(w + 1.0) * 0.01
                return (w, k + 1)

            w, _ = jax.lax.while_loop(cond, body, (v, 0))
            return w

        return run

    for name, ds in (("scatter", dssum_scatter), ("partner", dssum_partner)):
        t0 = time.perf_counter()
        f = jax.jit(cg_like(ds))
        out = f(u)
        jax.block_until_ready(out)
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = f(u)
        jax.block_until_ready(out)
        print(f"cg-like 50it x3 dssum [{name}]: compile {tc:.1f}s "
              f"run {(time.perf_counter()-t0)*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
