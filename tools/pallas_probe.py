"""De-risk probe for the fused-CG kernel building blocks on the TPU backend.

Checks that Mosaic lowers: pltpu.roll inside lax.fori_loop, 3-D operands,
lax.cond with array carries, 2-D transpose, dot_general with nonstandard
contraction dims, scalar SMEM reductions. Run: python tools/pallas_probe.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = jax.default_backend() != "tpu"
print("backend:", jax.default_backend(), "interpret:", INTERPRET)


def kernel(a_ref, m_ref, out_ref, sc_ref, acc_ref):
    a = a_ref[:]          # (2, 56, 768)
    m = m_ref[:]          # (56, 56)

    def body(k, carry):
        x, s = carry
        # per-component matmul + roll + mask
        outs = []
        for c in range(2):
            y = jnp.dot(m, x[c], preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
            y = pltpu.roll(y, 5, axis=1) + pltpu.roll(y, (-3) % 768, axis=1)
            outs.append(y)
        x = jnp.stack(outs, axis=0)
        s = s + jnp.sum(x * x)

        def live_fn(t):
            return t * 0.5

        def dead_fn(t):
            return t

        x = jax.lax.cond(s > 0.0, live_fn, dead_fn, x)
        return (x, s)

    x, s = jax.lax.fori_loop(0, 3, body, (a, jnp.float32(0.0)))

    # 2-D transpose + nonstandard dot_general (contract dim 0 with dim 0)
    rc = x[0, :8, :]                       # (8, 768)
    rcT = jnp.transpose(rc)                # (768, 8)
    g = m_ref[:, :8]                       # (56, 8) ~ stand-in
    v = jax.lax.dot_general(
        g, rcT[:56, :],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                      # (8, 8)
    acc_ref[:] = v
    out_ref[:] = x
    sc_ref[0, 0] = s


def main():
    a = jnp.asarray(np.random.default_rng(0).standard_normal((2, 56, 768)),
                    jnp.float32)
    m = jnp.asarray(np.random.default_rng(1).standard_normal((56, 56)),
                    jnp.float32)
    out, sc, acc = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((2, 56, 768), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((8, 8), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        interpret=INTERPRET,
    )(a, m)
    out.block_until_ready()
    print("ok: out", np.asarray(out).shape, "scalar", float(sc[0, 0]),
          "acc00", float(acc[0, 0]))

    # reference check in plain numpy/jax
    def ref():
        x, s = np.asarray(a), 0.0
        mm = np.asarray(m)
        for k in range(3):
            outs = []
            for c in range(2):
                y = mm.astype(np.float64) @ x[c].astype(np.float64)
                y = np.roll(y, 5, axis=1) + np.roll(y, -3, axis=1)
                outs.append(y)
            x = np.stack(outs)
            s = s + float(np.sum(x * x))
            if s > 0:
                x = x * 0.5
        return x, s

    xr, sr = ref()
    err = np.abs(np.asarray(out) - xr).max() / np.abs(xr).max()
    print("rel err vs f64 ref:", err, " scalar rel:",
          abs(float(sc[0, 0]) - sr) / abs(sr))


if __name__ == "__main__":
    main()
