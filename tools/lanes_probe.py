"""Time the flagship-f32 tangent matvec with/without the lanes-layout CG.

Round-3 roofline (BASELINE.md): the standard (nelem, n, n) layout pads
every CG operand ~20x into (8, 128) tiles; ops/lanes.py removes it.  This
probe measures the end-to-end matvec at the bench flagship rung.

Usage: python tools/lanes_probe.py [--skip-std]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from nekstab_next_tpu.cases.cylinder import CylinderCase
from nekstab_next_tpu.config import SolverConfig
from nekstab_next_tpu.stepper.linearized import LinearizedOperator

NSTEPS = 50
REPS = 3


def run(lanes: bool):
    solver = SolverConfig(
        pressure_tol=1e-5, velocity_tol=1e-6,
        pressure_maxiter=30, velocity_maxiter=15,
        lanes_layout=lanes,
    )
    case = CylinderCase(
        reynolds=60.0, nr=16, ntheta=48, order=6, outer_radius=40.0,
        dtype=jnp.float32, solver=solver,
    )
    ns = case.make_ns()
    base = case.uniform_flow()
    op = LinearizedOperator(ns, base, nsteps=NSTEPS)
    q = case.sem.vmask * jnp.asarray(base)

    t0 = time.perf_counter()
    out = op.matvec(q)
    jax.block_until_ready(out)
    t_compile = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(REPS):
        out = op.matvec(out)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REPS
    ndof = case.mesh.npoints * 2
    print(f"lanes={lanes}: {dt*1e3:8.1f} ms/matvec  "
          f"{ndof*NSTEPS/dt:.3e} dof-steps/s  (compile {t_compile:.0f}s)",
          flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-std", action="store_true")
    args = ap.parse_args()
    o2 = run(True)
    if not args.skip_std:
        o1 = run(False)
        rel = float(jnp.max(jnp.abs(o1 - o2)) / jnp.max(jnp.abs(o1)))
        print(f"relative output difference: {rel:.3e}", flush=True)


if __name__ == "__main__":
    main()
