"""March the BFS base flow on the TPU chip in f32, then hand the state to
the f64 CPU campaign (examples/bfs_transient_growth.py) for Newton polish.

The 2-D Re=500 BFS is linearly stable, so plain DNS converges to the steady
state; the chip does the long march ~10x faster than the 2-core CPU and the
f32 floor (one-step residual ~1e-5) is well inside Newton's quadratic basin.

Usage: python tools/bfs_tpu_march.py [--preset quick] [--steps 60000]
       (writes <outdir>/bfs_march.npz)
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

import jax.numpy as jnp
import numpy as np

from examples.bfs_transient_growth import PRESETS
from nekstab_next_tpu.cases.bfs import BackwardFacingStepCase
from nekstab_next_tpu.config import SolverConfig
from nekstab_next_tpu.io import save_field


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="quick", choices=sorted(PRESETS))
    ap.add_argument("--steps", type=int, default=60000)
    ap.add_argument("--chunk", type=int, default=2000)
    ap.add_argument("--tol", type=float, default=2e-5)
    ap.add_argument("--outdir", default="bfs_out")
    ap.add_argument("--lanes", action="store_true")
    ap.add_argument("--fused", action="store_true",
                    help="fused Pallas whole-solve CG kernels (block+Q1, "
                         "raised caps; ~5x per step on TPU)")
    args = ap.parse_args()
    P = PRESETS[args.preset]

    # round-3 postmortem: this march diverged on the graded 'barkley' mesh
    # with the 12-iteration capped CG + the collapsed FDM/dense-inverse
    # preconditioners, while the f64 march with converged solves is stable
    # (tools/bfs_cpu_probe.py) — solver config, not scheme.  The schwarz
    # preconditioner holds ~50 iterations to 1e-5 on this mesh, so a
    # 40-iteration cap is near-converged every step.
    if args.fused:
        solver = SolverConfig(pressure_tol=1e-5, velocity_tol=1e-6,
                              pressure_maxiter=350, velocity_maxiter=40,
                              pressure_precond="block", fused_solves=True)
    else:
        solver = SolverConfig(pressure_tol=1e-5, velocity_tol=1e-6,
                              pressure_maxiter=40, velocity_maxiter=24,
                              pressure_precond="schwarz",
                              lanes_layout=args.lanes)
    # f32 stepper on the chip; the base-flow march runs UNSPONGED (the
    # steady state of pure NS) — the TG stepper then turns the sponge on
    # with sponge_ref = this base flow, which keeps it an equilibrium
    from examples.bfs_transient_growth import build_case

    case = build_case(P, dtype=jnp.float32, solver=solver, sponge=False)
    sem = case.sem
    ns = case.make_ns()
    print(f"[march] nelem={case.mesh.nelem} order={P['order']} "
          f"dt={case.dt:.4f} dtype=f32", flush=True)

    def chunk_fn(st):
        st1 = ns.advance(st, args.chunk - 1)
        st2 = ns.step(st1)
        du = st2.u - st1.u
        res = jnp.sqrt(sum(sem.inner(du[..., d], du[..., d], masked=False)
                           for d in range(2)))
        return st2, res

    run = jax.jit(chunk_fn)
    st = ns.make_state(case.initial_flow().astype(jnp.float32))
    t0 = time.time()
    steps = 0
    while steps < args.steps:
        st, r = run(st)
        steps += args.chunk
        res = float(r)
        print(f"[march] step {steps}  res={res:.3e}  ({time.time()-t0:.0f}s)",
              flush=True)
        # divergence abort: a healthy march has res ~ O(1e-3) after the
        # initial transient; round-3 bug — the graded-mesh march sat at
        # res ~ 1e6 for 78k steps (254 s of garbage) with no abort
        if not np.isfinite(res) or res > 1e3:
            raise SystemExit(f"f32 march diverged (res={res:.3e})")
        if res < args.tol:
            break
    os.makedirs(args.outdir, exist_ok=True)
    out = os.path.join(args.outdir, "bfs_march.npz")
    m = case.mesh
    save_field(out, np.asarray(st.u, dtype=np.float64),
               p=np.asarray(st.p, dtype=np.float64), time=float(st.time),
               residual=res, nelem=int(m.nelem), order=int(P["order"]),
               xhash=float(np.sum(np.asarray(m.x) ** 2)))
    print(f"[march] saved {out} (res {res:.3e}, {steps} steps, "
          f"{time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
