"""Headline benchmark: linearized-propagator (matvec) throughput on the
cylinder fixture.

The hot loop of every analysis in the reference is the time-stepper matvec
(SURVEY.md section 3.2: istep=1..nsteps of ``nek_advance`` per Arnoldi step).
We measure sustained degrees-of-freedom x time-steps per second of the
compiled tangent propagator at the reference's fixture scale (cylinder,
~2k elements, polynomial order 5 -> lx1=6; /root/reference/examples/cylinder/
SIZE:13-17).  The reference publishes no wall-clock numbers (BASELINE.md), so
``vs_baseline`` is the ratio against a fixed nominal anchor recorded at round
1 (1.0e7 dof-steps/s) to make cross-round progress visible.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import jax.numpy as jnp

NOMINAL_BASELINE = 1.0e7  # dof-steps/s anchor (no reference number exists)


def main():
    from nekstab_next_tpu.cases.cylinder import CylinderCase
    from nekstab_next_tpu.stepper.linearized import LinearizedOperator

    # ~2k-element fixture scale (reference: 1996 elements, order 5)
    case = CylinderCase(reynolds=60.0, nr=16, ntheta=48, order=6,
                        outer_radius=40.0)
    ns = case.make_ns()
    base = case.uniform_flow()
    nsteps = 50
    op = LinearizedOperator(ns, base, nsteps=nsteps)

    q = case.sem.vmask * jnp.asarray(base)
    # warmup/compile
    out = op.matvec(q)
    jax.block_until_ready(out)

    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = op.matvec(out)
    jax.block_until_ready(out)
    dt_wall = time.perf_counter() - t0

    m = case.mesh
    ndof = m.npoints * 2  # velocity dofs
    value = ndof * nsteps * reps / dt_wall
    print(json.dumps({
        "metric": "linearized_propagator_throughput",
        "value": value,
        "unit": "dof-steps/s",
        "vs_baseline": value / NOMINAL_BASELINE,
    }))


if __name__ == "__main__":
    main()
