"""Standalone TPU probe: data-layout and dssum-formulation experiments.

Times candidate formulations of the two SEM hot ops at fixture scale
without the framework, to guide the layout refactor:

* stiffness apply: einsum in (e,i,j) vs (i,j,e) layouts vs flat matmuls;
* dssum: segment_sum scatter vs padded-gather table, both layouts.
"""

import time
import sys

import jax
import jax.numpy as jnp
import numpy as np

E, N = 768, 7
REPS = 100


def timeit(name, fn, x):
    loop = jax.jit(lambda v: jax.lax.fori_loop(0, REPS, lambda i, a: fn(a), v))
    out = loop(x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = loop(out)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:36s} {dt*1e6:9.1f} us", flush=True)


def main():
    rng = np.random.default_rng(0)
    D = jnp.asarray(rng.standard_normal((N, N)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((E, N, N)), jnp.float32)
    u_eij = jnp.asarray(rng.standard_normal((E, N, N)), jnp.float32)
    u_ije = jnp.transpose(u_eij, (1, 2, 0))
    g_ije = jnp.transpose(g, (1, 2, 0))

    # ---- derivative/stiffness-like contractions -------------------------
    def stiff_eij(u):
        ur = jnp.einsum("ai,eij->eaj", D, u)
        us = jnp.einsum("bj,eij->eib", D, u)
        wr = g * ur
        ws = g * us
        return jnp.einsum("ai,eaj->eij", D, wr) + jnp.einsum("bj,eib->eij", D, ws)

    def stiff_ije(u):
        ur = jnp.einsum("ai,ije->aje", D, u)
        us = jnp.einsum("bj,ije->ibe", D, u)
        wr = g_ije * ur
        ws = g_ije * us
        return jnp.einsum("ai,aje->ije", D, wr) + jnp.einsum("bj,ibe->ije", D, ws)

    # flat-2D matmul formulation: u as (N, N*E) and (N*E... ) via reshapes
    def stiff_flat(u):  # u (N, N, E)
        uf = u.reshape(N, N * E)
        ur = (D @ uf).reshape(N, N, E)
        # second-direction derivative via batched matmul on axis 1
        us = jnp.einsum("bj,ije->ibe", D, u)
        wr = g_ije * ur
        ws = g_ije * us
        out = (D.T @ wr.reshape(N, N * E)).reshape(N, N, E)
        return out + jnp.einsum("bj,ibe->ije", D, ws)

    timeit("stiffness (e,i,j) einsum", stiff_eij, u_eij)
    timeit("stiffness (i,j,e) einsum", stiff_ije, u_ije)
    timeit("stiffness (i,j,e) flat-matmul", stiff_flat, u_ije)

    # ---- dssum ----------------------------------------------------------
    # synthetic but realistic structured grid numbering 32x24 elements
    ex, ey = 32, 24
    assert ex * ey == E
    gx = np.arange(ex * (N - 1) + 1)
    gy = np.arange(ey * (N - 1) + 1)
    NGX = len(gx)
    gid = np.zeros((E, N, N), np.int32)
    for e in range(E):
        cx, cy = e % ex, e // ex
        ii = cx * (N - 1) + np.arange(N)
        jj = cy * (N - 1) + np.arange(N)
        gid[e] = (ii[:, None] * len(gy) + jj[None, :])
    ng = int(gid.max()) + 1
    gidj = jnp.asarray(gid.reshape(-1))

    def dssum_scatter(u):  # (E,N,N)
        flat = u.reshape(-1)
        acc = jax.ops.segment_sum(flat, gidj, num_segments=ng)
        return acc[gidj].reshape(u.shape)

    # padded gather table
    order = np.argsort(gid.reshape(-1), kind="stable")
    sg = gid.reshape(-1)[order]
    starts = np.searchsorted(sg, np.arange(ng))
    counts = np.diff(np.append(starts, sg.size))
    m = int(counts.max())
    tbl = np.full((ng, m), sg.size, np.int64)
    for k in range(m):
        sel = counts > k
        tbl[sel, k] = order[starts[sel] + k]
    tblj = jnp.asarray(tbl, jnp.int32)

    def dssum_gather(u):
        flat = u.reshape(-1)
        ext = jnp.concatenate([flat, jnp.zeros((1,), flat.dtype)])
        acc = ext[tblj].sum(1)
        return acc[gidj].reshape(u.shape)

    timeit("dssum scatter (segment_sum)", dssum_scatter, u_eij)
    timeit("dssum padded-gather", dssum_gather, u_eij)

    # structured face-exchange formulation (interior +x/-x, +y/-y shares)
    def dssum_faces(u):  # (E, N, N) with the structured numbering above
        v = u.reshape(ey, ex, N, N)
        out = v
        # x-direction shared columns: elem (cy,cx) col N-1 pairs with (cy,cx+1) col 0
        sx = v[:, :-1, N - 1, :] + v[:, 1:, 0, :]
        out = out.at[:, :-1, N - 1, :].set(sx).at[:, 1:, 0, :].set(sx)
        sy = out[:, :, :, N - 1][:, :, :, None]
        a = out[:-1, :, :, N - 1] + out[1:, :, :, 0]
        out = out.at[:-1, :, :, N - 1].set(a).at[1:, :, :, 0].set(a)
        return out.reshape(u.shape)

    timeit("dssum structured face-exchange", dssum_faces, u_eij)


if __name__ == "__main__":
    main()
