"""BFS optimal transient growth vs Barkley et al. (2008), on the TPU chip.

The reference's quantitative regression (SURVEY.md section 4.2,
examples/back_fstep/autorun.py + barkley2008_fig5.ref) run f32 on
hardware: base flow from tools/bfs_tpu_march.py (the Re=500 2-D BFS is
linearly stable, so the f32 DNS march converges; its ~2e-5 per-step floor
puts the steady defect ~1.5e-3 — ~1% in G, inside the resolution budget),
then Golub-Kahan svds of the tangent/adjoint propagator per Barkley
horizon with the reference's sponge + masked energy norm.

Usage: python tools/bfs_tpu_tg.py [--preset barkley] [--outdir bfs_out]
Writes <outdir>/growth.json and prints the comparison table.
"""
import argparse
import json
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
import numpy as np

from examples.bfs_transient_growth import BARKLEY_REF, PRESETS, build_case
from nekstab_next_tpu.algorithms import transient_growth_analysis
from nekstab_next_tpu.config import SolverConfig
from nekstab_next_tpu.io import load_field


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="barkley", choices=sorted(PRESETS))
    ap.add_argument("--outdir", default="bfs_out")
    ap.add_argument("--horizons", type=float, nargs="*", default=None)
    ap.add_argument("--k-dim", type=int, default=None)
    ap.add_argument("--no-sponge", action="store_true",
                    help="drop the sponge entirely (no damping forcing, "
                         "unmasked full-domain energy norm) — the round-5 "
                         "Barkley short-horizon discriminating experiment")
    ap.add_argument("--unmasked", action="store_true",
                    help="keep the sponge damping but measure the UNMASKED "
                         "full-domain energy norm")
    ap.add_argument("--fused", action="store_true",
                    help="fused Pallas whole-solve CG kernels (block+Q1 "
                         "preconditioner; raised caps for the graded mesh)")
    ap.add_argument("--out", default="growth.json")
    args = ap.parse_args()
    P = PRESETS[args.preset]
    horizons = tuple(args.horizons) if args.horizons else P["horizons"]
    k_dim = args.k_dim or min(P["k_dim"], 16)

    # schwarz preconditioner + 40-iteration cap: near-converged pressure
    # solves on the graded mesh every step (the round-3 lanes+dense-inverse
    # config diverged here; see tools/bfs_tpu_march.py)
    if args.fused:
        # block+Q1 needs ~309 iterations to 1e-5 on this graded mesh
        # (vs ~50 for schwarz) but a fused iteration costs ~12 us vs
        # ~780 us for an XLA schwarz one — 3-4x faster per step overall
        solver = SolverConfig(pressure_tol=1e-5, velocity_tol=1e-6,
                              pressure_maxiter=350, velocity_maxiter=40,
                              pressure_precond="block", fused_solves=True)
    else:
        solver = SolverConfig(pressure_tol=1e-5, velocity_tol=1e-6,
                              pressure_maxiter=40, velocity_maxiter=24,
                              pressure_precond="schwarz")
    case = build_case(P, dtype=jnp.float32, solver=solver,
                      sponge=False if args.no_sponge else None)
    if args.unmasked:
        # sponge forcing stays; the energy norm reverts to the full domain
        case.sem.bms = case.sem.bm
    t0 = time.time()
    print(f"[tg] nelem={case.mesh.nelem} order={P['order']} dt={case.dt:.4f} "
          f"sponge={case.sponge}", flush=True)

    bf = load_field(os.path.join(args.outdir, "bfs_march.npz"))
    base = jnp.asarray(bf.u, jnp.float32)
    # sponge damps toward the base flow -> it stays an equilibrium
    ns = case.make_ns(sponge_ref=base if case.sponge else None)

    ref = np.loadtxt(BARKLEY_REF) if os.path.exists(BARKLEY_REF) else None
    rows = []
    for T in horizons:
        nsteps = max(int(round(T / case.dt)), 1)
        res = transient_growth_analysis(
            ns, base, horizon=T, nsteps=nsteps, nsv=1,
            k_dim=k_dim, tol=1e-4,
        )
        G = float(res.gains[0])
        Gref = (float(np.interp(T, ref[:, 0], ref[:, 1]))
                if ref is not None else None)
        rows.append(dict(t=T, G=G, G_barkley=Gref,
                         rel=None if Gref is None else G / Gref - 1.0))
        print(f"[tg] G({T}) = {G:.2f}"
              + (f"  (Barkley {Gref:.2f}, {100*(G/Gref-1):+.1f}%)"
                 if Gref else "")
              + f"  [{res.n_matvecs} matvecs, svds-res {float(res.residuals[0]):.1e}, {time.time()-t0:.0f}s]",
              flush=True)
    os.makedirs(args.outdir, exist_ok=True)
    with open(os.path.join(args.outdir, args.out), "w") as fh:
        json.dump(dict(preset=args.preset, nelem=case.mesh.nelem,
                       order=P["order"], dtype="float32 (TPU)",
                       sponge=bool(case.sponge), unmasked=bool(args.unmasked),
                       fused=bool(args.fused),
                       points=rows), fh, indent=1)
    print(f"[tg] done in {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
