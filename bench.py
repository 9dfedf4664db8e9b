"""Headline benchmark: linearized-propagator (matvec) throughput on the
cylinder fixture.

The hot loop of every analysis in the reference is the time-stepper matvec
(SURVEY.md section 3.2: istep=1..nsteps of ``nek_advance`` per Arnoldi step).
We measure sustained degrees-of-freedom x time-steps per second of the
compiled tangent propagator at the reference's fixture scale: the flagship
rung is 768 elements at order 6 = ~75k velocity dof, matching the reference
cylinder fixture (1996 elements at order 5, ~75k dof —
/root/reference/examples/cylinder/SIZE:13-17).

Two code paths are timed:

* ``f32``  — plain-XLA single-precision compute (f32 fields, f32-reachable
  inner tolerances 1e-5/1e-6).  TPU v5e has no f64 datapath, so this is the
  native-speed arithmetic.
* ``mixed`` — the production path for reference-grade (1e-8..1e-10)
  tolerances: f64 state with Pallas fused-Helmholtz f32 inner CG + f64
  iterative refinement (ops/mixed.py, ops/pallas_kernels.py).

The headline value is the best completed flagship number; per-rung details
(including a speed-of-light fraction from the executable's XLA cost
analysis: bytes-accessed / HBM bandwidth — the apply is bandwidth-bound)
go to stderr and BENCH_DETAIL.json.

Budgeting: the backend may be a remote-tunneled chip where each fresh
executable costs minutes of compile, so (a) the JAX persistent compilation
cache is enabled (.jax_cache — the second run of this script compiles
nothing), and (b) the ladder climbs small -> flagship, banking the best
completed number, and stops when the remaining wall-clock budget
(NEKSTAB_BENCH_BUDGET seconds, default 420) cannot cover the next rung.

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
HBM_BW = 819e9  # TPU v5e HBM bandwidth, bytes/s (public spec)

NSTEPS = 50
REPS = 3
BUDGET = float(os.environ.get("NEKSTAB_BENCH_BUDGET", "420"))

# ladder: (label, nr, ntheta, mixed). FLAGSHIP FIRST: the driver's capture
# ran out of budget on the small rung's fresh compile for three rounds and
# banked the sub-scale number (round-3 VERDICT Weak #4) — the flagship rung
# is the one that matches the reference fixture scale and compiles in
# seconds from the committed .jax_cache.  The small rung is kept as a
# latency reference, last.
CONFIGS = [
    ("flagship-f32", 16, 48, False),
    ("flagship-mixed", 16, 48, True),
    ("small-f32", 8, 24, False),
]

_T0 = time.perf_counter()


def _left():
    return BUDGET - (time.perf_counter() - _T0)


def _setup_cache():
    import jax

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # noqa: BLE001
        print(f"bench: compilation cache unavailable: {e!r}", file=sys.stderr)


def run(nr: int, ntheta: int, mixed: bool) -> dict:
    import jax
    import jax.numpy as jnp

    from nekstab_next_tpu.cases.cylinder import CylinderCase
    from nekstab_next_tpu.config import SolverConfig
    from nekstab_next_tpu.stepper.linearized import LinearizedOperator

    if mixed:
        jax.config.update("jax_enable_x64", True)
        # round 5: fused-IR mixed path — f64 state on the PnPn-2 scheme
        # with iterative refinement around the fused Pallas f32 kernels
        # (stepper/navier_stokes.py _mixed_ir; falls back to the legacy
        # laplacian path where the kernels don't apply)
        solver = SolverConfig(
            pressure_tol=1e-8, velocity_tol=1e-9,
            pressure_maxiter=500, velocity_maxiter=200,
            pressure_precond="block", fused_solves=True,
        )
        dtype = jnp.float64
    else:
        # measured knee (round 4, tools/flagship_sweep.py): with the exact
        # element-block pressure preconditioner (ops/schwarz.py 'block' —
        # one batched (E, nloc, nloc) matmul per iteration, no
        # gather/scatter) the caps drop from the round-3 fdm setting 30/15
        # to 12/10 at the SAME f32 output drift (2.32e-4 vs 2.25e-4 = the
        # f32 noise floor vs a near-converged schwarz reference):
        #   fdm-30/15   981 ms/matvec   3.84e6 dof-steps/s  drift 2.25e-4
        #   blk-20/15   768 ms/matvec   4.90e6              drift 2.06e-4
        #   blk-15/12   659 ms/matvec   5.71e6              drift 2.08e-4
        #   blk-12/10   590 ms/matvec   6.38e6              drift 2.32e-4
        #   (blkv-12/8 with the exact-block velocity preconditioner
        #   reaches 534 ms / 7.05e6 but at drift 3.15e-4 — 1.5x the
        #   floor; kept out of the headline)
        # ('schwarz' overlapping patches need ~19 iterations but the patch
        # gather + segment-sum costs ~3-4x per iteration on TPU: 1370 ms
        # even capped 10/10 — iteration count is not the whole story)
        #
        # Round 5: fused_solves runs BOTH inner CG solves as single Pallas
        # kernels in the lanes layout (ops/fused_cg.py): whole-iteration
        # VMEM residency + shift-decomposed roll dssum.  Measured knee
        # (tools/flagship_sweep.py blkfus-*): caps 16/10 at drift 2.21e-4
        # (= the f32 floor; the round-4 XLA headline was 2.32e-4 at 12/10):
        #   blk-12-10    (XLA, round 4)   591 ms/matvec   6.37e6
        #   blkfus-12-10 (fused)          117 ms          3.22e7  drift 1.7e-3
        #   blkfus-16-10 (fused)          121 ms          3.12e7  drift 2.2e-4
        #   blkfus-24-12 (fused)          130 ms          2.89e7  drift 2.1e-4
        solver = SolverConfig(
            pressure_tol=1e-5, velocity_tol=1e-6,
            pressure_maxiter=16, velocity_maxiter=10,
            pressure_precond="block", fused_solves=True,
        )
        dtype = jnp.float32
    case = CylinderCase(
        reynolds=60.0, nr=nr, ntheta=ntheta, order=6, outer_radius=40.0,
        dtype=dtype, solver=solver,
    )
    ns = case.make_ns() if not mixed else None
    if mixed:
        from nekstab_next_tpu.stepper.navier_stokes import NavierStokes

        ns = NavierStokes(
            case.sem, viscosity=1.0 / 60.0, dt=case.dt, u_bc=case.u_bc,
            solver=solver, mixed_precision=True,
        )
    base = case.uniform_flow()
    op = LinearizedOperator(ns, base, nsteps=NSTEPS)

    q = case.sem.vmask * jnp.asarray(base)
    # warmup/compile
    tc0 = time.perf_counter()
    out = op.matvec(q)
    jax.block_until_ready(out)
    t_compile = time.perf_counter() - tc0

    t0 = time.perf_counter()
    for _ in range(REPS):
        out = op.matvec(out)
    jax.block_until_ready(out)
    dt_wall = time.perf_counter() - t0

    ndof = case.mesh.npoints * 2  # velocity dofs
    value = ndof * NSTEPS * REPS / dt_wall

    # speed-of-light fraction: XLA's own bytes-accessed estimate vs HBM BW
    # (lower through op._matvec — the SAME jit object the timing used — so
    # this reuses the already-compiled executable instead of paying a
    # second full compile, which ate most of the rung's budget)
    sol = None
    try:
        cost = op._matvec.lower(q).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        nbytes = float(cost.get("bytes accessed", 0.0))
        if nbytes > 0:
            t_min = nbytes / HBM_BW
            sol = (t_min * REPS) / dt_wall
    except Exception as e:  # noqa: BLE001
        print(f"bench: cost_analysis unavailable: {e!r}", file=sys.stderr)

    return dict(
        value=value, ndof=ndof, nelem=case.mesh.nelem, mixed=mixed,
        t_compile=t_compile, t_per_matvec=dt_wall / REPS,
        sol_fraction=sol,
    )


def profile():
    """``bench.py --profile``: a jax.profiler trace of the flagship matvec
    plus a top-op cost table (SURVEY section 5 tracing; the TPU equivalent
    of the reference's per-stage timers).  Trace goes to ``bench_profile/``
    (view with TensorBoard); the op table is appended to BENCH_DETAIL.json
    under "profile"."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nekstab_next_tpu.cases.cylinder import CylinderCase
    from nekstab_next_tpu.config import SolverConfig
    from nekstab_next_tpu.ops.elliptic import make_projector
    from nekstab_next_tpu.stepper.linearized import LinearizedOperator

    _setup_cache()
    solver = SolverConfig(
        pressure_tol=1e-5, velocity_tol=1e-6,
        pressure_maxiter=16, velocity_maxiter=10,
        pressure_precond="block", fused_solves=True,
    )
    case = CylinderCase(reynolds=60.0, nr=16, ntheta=48, order=6,
                        outer_radius=40.0, dtype=jnp.float32, solver=solver)
    ns = case.make_ns()
    base = case.uniform_flow()
    op = LinearizedOperator(ns, base, nsteps=NSTEPS)
    q = case.sem.vmask * jnp.asarray(base)
    out = op.matvec(q)  # compile outside the trace
    jax.block_until_ready(out)

    logdir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "bench_profile")
    traced = False
    try:
        with jax.profiler.trace(logdir):
            for _ in range(3):
                out = op.matvec(q)
            jax.block_until_ready(out)
        traced = True
        print(f"bench: profiler trace written to {logdir}", file=sys.stderr)
    except Exception as e:  # noqa: BLE001 - remote backends may not support it
        print(f"bench: jax.profiler unavailable on this backend: {e!r}",
              file=sys.stderr)

    # top-op table: jitted micro-timings of the step's building blocks
    s = case.sem
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(s.bm.shape), s.dtype)
    u = jnp.asarray(rng.standard_normal(s.bm.shape + (2,)), s.dtype)
    p = jnp.asarray(rng.standard_normal(s.p_shape), s.dtype)
    P = make_projector(s, s.vmask)
    ops_ = {
        "helmholtz_local": (lambda v: s.helmholtz_local(v, 0.016, 100.0), x),
        "dssum": (s.dssum, x),
        "dealiased_convection": (
            lambda v: jnp.stack(
                [s.convect(v, v[..., d]) for d in range(2)], axis=-1), u),
        "fdm_apply": (lambda v: s.fdm_apply(v, 0.016, 100.0), x),
        "block_precond_pressure": (s.pressure_precond_block, p),
        "fused_velocity_solve": (
            lambda v: ns._fused_v.solve(P(v), 1.0 / 60.0, 100.0), u),
        "fused_pressure_solve": (ns._fused_p.solve, p),
        "full_step": (lambda st: ns.step(st), ns.make_state(u * s.vmask)),
    }
    table = []
    for name, (fn, arg) in ops_.items():
        try:
            loop = jax.jit(lambda v, fn=fn: jax.lax.fori_loop(
                0, 20, lambda i, a: fn(a), v))
            o = loop(arg)
            jax.block_until_ready(o)
            t0 = time.perf_counter()
            o = loop(arg)
            jax.block_until_ready(o)
            dt = (time.perf_counter() - t0) / 20
        except Exception as e:  # noqa: BLE001
            print(f"bench: profile op {name} failed: {e!r}", file=sys.stderr)
            continue
        table.append({"op": name, "us_per_apply": dt * 1e6})
        print(f"bench: {name:26s} {dt*1e6:10.1f} us/apply", file=sys.stderr)
    table.sort(key=lambda r: -r["us_per_apply"])
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_DETAIL.json")
    try:
        detail = json.load(open(detail_path))
    except Exception:  # noqa: BLE001
        detail = []
    json.dump({"rungs": detail if isinstance(detail, list) else detail.get("rungs", []),
               "profile": {"trace_dir": logdir if traced else None,
                            "top_ops": table[:10]}},
              open(detail_path, "w"), indent=1)
    print(json.dumps({"metric": "profile", "value": len(table),
                      "unit": "ops", "vs_baseline": 1.0}))


def main():
    _setup_cache()
    results = []
    best = None
    last_err = None
    last_cost = 0.0
    for i, (label, nr, ntheta, mixed) in enumerate(CONFIGS):
        # the next rung costs at least as much as the last one (compile
        # dominates and grows with size); keep a safety factor
        if best is not None and _left() < max(1.6 * last_cost, 60.0):
            print(f"bench: stopping ladder at rung {i} "
                  f"({_left():.0f}s budget left)", file=sys.stderr)
            break
        t0 = time.perf_counter()
        try:
            r = run(nr, ntheta, mixed)
            r["label"] = label
            results.append(r)
            print(f"bench: {label}: {r['value']:.3e} dof-steps/s "
                  f"({r['ndof']} dof, {r['t_per_matvec']*1e3:.1f} ms/matvec, "
                  f"compile {r['t_compile']:.0f}s, "
                  f"speed-of-light {r['sol_fraction'] if r['sol_fraction'] is None else round(r['sol_fraction'], 3)})",
                  file=sys.stderr)
            best = r["value"] if best is None else max(best, r["value"])
        except Exception as e:  # noqa: BLE001 - climb past broken rungs
            last_err = e
            print(f"bench: config {label} failed: {e!r}", file=sys.stderr)
        last_cost = time.perf_counter() - t0
    if best is None:
        raise SystemExit(f"all bench configs failed: {last_err!r}")
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_DETAIL.json"), "w") as fh:
            json.dump(results, fh, indent=1)
    except Exception:  # noqa: BLE001
        pass
    print(json.dumps({
        "metric": "linearized_propagator_throughput",
        "value": best,
        "unit": "dof-steps/s",
        "vs_baseline": best / NOMINAL_BASELINE,
    }))


if __name__ == "__main__":
    if "--profile" in sys.argv:
        profile()
    else:
        main()
