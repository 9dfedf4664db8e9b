"""Mixed-IR flagship probe: where does the per-step time go, and what do
refinement cycles cost/buy?

Times the 50-step tangent matvec at cycles 1/2/3 and reports the drift of
each against the most-refined run (cycles=3 is the accuracy anchor here;
the CPU f64 cross-check lives in tests/test_fused_cg.py and VALIDATION.md).

Usage: python tools/mixed_probe.py [--cycles 1,2,3]
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
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from nekstab_next_tpu.cases.cylinder import CylinderCase
from nekstab_next_tpu.config import SolverConfig
from nekstab_next_tpu.stepper.linearized import LinearizedOperator
from nekstab_next_tpu.stepper.navier_stokes import NavierStokes

NSTEPS = 50
REPS = 3


def run(cycles: int):
    solver = SolverConfig(
        pressure_tol=1e-8, velocity_tol=1e-9,
        pressure_maxiter=500, velocity_maxiter=200,
        pressure_precond="block", fused_solves=True,
        mixed_ir_cycles=cycles,
    )
    case = CylinderCase(
        reynolds=60.0, nr=16, ntheta=48, order=6, outer_radius=40.0,
        dtype=jnp.float64, solver=solver,
    )
    ns = NavierStokes(
        case.sem, viscosity=1.0 / 60.0, dt=case.dt, u_bc=case.u_bc,
        solver=solver, mixed_precision=True,
    )
    assert ns._mixed_ir, "fused-IR path did not engage"
    base = case.uniform_flow()
    op = LinearizedOperator(ns, base, nsteps=NSTEPS)
    q = case.sem.vmask * jnp.asarray(base)
    t0 = time.perf_counter()
    out = op.matvec(q)
    jax.block_until_ready(out)
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = op.matvec(q)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REPS
    return np.asarray(out), dt, tc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cycles", default="3,2,1")
    args = ap.parse_args()
    ref = None
    for c in [int(x) for x in args.cycles.split(",")]:
        out, dt, tc = run(c)
        if ref is None:
            ref = out
            drift = 0.0
        else:
            drift = float(np.linalg.norm(out - ref) / np.linalg.norm(ref))
        ndof = out.size
        print(f"cycles={c}: {dt*1e3:8.1f} ms/matvec  "
              f"{ndof*NSTEPS/dt:.3e} dof-steps/s  drift={drift:.2e}  "
              f"(compile {tc:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
