"""Ad-hoc probe: time compile + steady-state matvec of the linearized
propagator on the current JAX backend, at a chosen scale/precision.

Usage: python tools/tpu_probe.py NR NTHETA ORDER NSTEPS DTYPE [PTOL VTOL]
"""

import sys
import time

import jax
import jax.numpy as jnp


def main():
    nr, ntheta, order, nsteps = (int(a) for a in sys.argv[1:5])
    dtype = {"f32": jnp.float32, "f64": jnp.float64}[sys.argv[5]]
    ptol = float(sys.argv[6]) if len(sys.argv) > 6 else 1e-5
    vtol = float(sys.argv[7]) if len(sys.argv) > 7 else 1e-6

    from nekstab_next_tpu.cases.cylinder import CylinderCase
    from nekstab_next_tpu.config import SolverConfig
    from nekstab_next_tpu.stepper.linearized import LinearizedOperator

    solver = SolverConfig(pressure_tol=ptol, velocity_tol=vtol,
                          pressure_maxiter=500, velocity_maxiter=200)
    t0 = time.time()
    case = CylinderCase(reynolds=60.0, nr=nr, ntheta=ntheta, order=order,
                        outer_radius=40.0, dtype=dtype, solver=solver)
    ns = case.make_ns()
    base = case.uniform_flow()
    op = LinearizedOperator(ns, base, nsteps=nsteps)
    q = case.sem.vmask * jnp.asarray(base)
    print(f"setup {time.time()-t0:.1f}s nelem={case.mesh.nelem} "
          f"dof={case.mesh.npoints*2}", flush=True)
    t0 = time.time()
    out = op.matvec(q)
    jax.block_until_ready(out)
    print(f"compile+first {time.time()-t0:.1f}s max={float(jnp.abs(out).max()):.4g}",
          flush=True)
    t0 = time.time()
    out = op.matvec(out)
    jax.block_until_ready(out)
    wall = time.time() - t0
    dofsteps = case.mesh.npoints * 2 * nsteps
    print(f"steady matvec {wall:.3f}s -> {dofsteps/wall:.3e} dof-steps/s",
          flush=True)


if __name__ == "__main__":
    main()
