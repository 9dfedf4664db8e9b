"""Headline benchmark: linearized-propagator (matvec) throughput on the
cylinder fixture.

The hot loop of every analysis in the reference is the time-stepper matvec
(SURVEY.md section 3.2: istep=1..nsteps of ``nek_advance`` per Arnoldi step).
We measure sustained degrees-of-freedom x time-steps per second of the
compiled tangent propagator at the reference's fixture scale (cylinder,
~2k elements at order 5 -> here 768 elements at order 6, same ~75k dof;
/root/reference/examples/cylinder/SIZE:13-17).

Precision: the benchmark runs the TPU-native single-precision compute path
(f32 fields, f32-reachable inner-solve tolerances 1e-5/1e-6).  TPU v5e has no
f64 datapath — f64 is software-emulated at >10x cost and blows up compile
times; the production design for tight tolerances is f32 compute + f64
iterative refinement (ops/mixed.py), whose FLOPs are also f32.  Correctness
at the reference's 1e-6..1e-10 tolerances is covered by the f64 CPU test
suite, not this throughput number.

The reference publishes no wall-clock numbers (BASELINE.md), so
``vs_baseline`` is the ratio against a fixed nominal anchor recorded at round
1 (1.0e7 dof-steps/s) to make cross-round progress visible.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

NOMINAL_BASELINE = 1.0e7  # dof-steps/s anchor (no reference number exists)

# (nr, ntheta) ladder: flagship scale first, then smaller fallbacks so a
# resource failure on the device still yields a measurement.
CONFIGS = [(16, 48), (8, 24), (4, 12)]
NSTEPS = 50
REPS = 3


def run(nr: int, ntheta: int) -> float:
    import jax
    import jax.numpy as jnp

    from nekstab_next_tpu.cases.cylinder import CylinderCase
    from nekstab_next_tpu.config import SolverConfig
    from nekstab_next_tpu.stepper.linearized import LinearizedOperator

    solver = SolverConfig(
        pressure_tol=1e-5, velocity_tol=1e-6,
        pressure_maxiter=500, velocity_maxiter=200,
    )
    case = CylinderCase(
        reynolds=60.0, nr=nr, ntheta=ntheta, order=6, outer_radius=40.0,
        dtype=jnp.float32, solver=solver,
    )
    ns = case.make_ns()
    base = case.uniform_flow()
    op = LinearizedOperator(ns, base, nsteps=NSTEPS)

    q = case.sem.vmask * jnp.asarray(base)
    # warmup/compile
    out = op.matvec(q)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(REPS):
        out = op.matvec(out)
    jax.block_until_ready(out)
    dt_wall = time.perf_counter() - t0

    ndof = case.mesh.npoints * 2  # velocity dofs
    return ndof * NSTEPS * REPS / dt_wall


def main():
    last_err = None
    for nr, ntheta in CONFIGS:
        try:
            value = run(nr, ntheta)
            print(json.dumps({
                "metric": "linearized_propagator_throughput",
                "value": value,
                "unit": "dof-steps/s",
                "vs_baseline": value / NOMINAL_BASELINE,
            }))
            return
        except Exception as e:  # noqa: BLE001 - fall down the ladder
            last_err = e
            print(f"bench: config ({nr},{ntheta}) failed: {e!r}",
                  file=sys.stderr)
    raise SystemExit(f"all bench configs failed: {last_err!r}")


if __name__ == "__main__":
    main()
