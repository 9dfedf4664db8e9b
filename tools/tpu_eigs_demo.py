"""Run a cylinder direct eigensolve ON the TPU chip in f32.

Loads an f64 CPU base flow (from examples/cylinder_stability.py), casts to
f32, and runs Krylov-Schur on the f32 tangent propagator — the production
TPU configuration (f32 compute; f64 tolerances are reached via
mixed-precision refinement when needed).  With --ref it compares against the
f64 CPU eigenvalue.

Usage:
    python tools/tpu_eigs_demo.py [--preset quick|medium|full]
        [--bf cylinder_out2/BF_cyl_00001.npz] [--ref cylinder_out2/summary.json]
        [--out cylinder_tpu_eigs.json]
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

import jax.numpy as jnp
import numpy as np


def main():
    from examples.cylinder_stability import PRESETS
    from nekstab_next_tpu.algorithms.stability import linear_stability_analysis
    from nekstab_next_tpu.cases.cylinder import CylinderCase
    from nekstab_next_tpu.config import SolverConfig
    from nekstab_next_tpu.io import load_field

    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="quick", choices=sorted(PRESETS))
    ap.add_argument("--bf", default="cylinder_out2/BF_cyl_00001.npz")
    ap.add_argument("--ref", default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--tol", type=float, default=3e-5)
    ap.add_argument("--kdim", type=int, default=None)
    ap.add_argument("--seed-mode", default="symmetric",
                    choices=("noise", "symmetric", "baseflow"))
    args = ap.parse_args()
    P = PRESETS[args.preset]

    # measured f32 iteration knee (pressure CG dominates; caps at 30/15
    # change the tangent output only at the f32 noise floor ~2e-4 — bench.py)
    solver = SolverConfig(pressure_tol=1e-5, velocity_tol=1e-6,
                          pressure_maxiter=30, velocity_maxiter=15)
    case = CylinderCase(reynolds=60.0, nr=P["nr"], ntheta=P["ntheta"],
                        order=P["order"], outer_radius=P["outer_radius"],
                        dtype=jnp.float32, solver=solver)
    ns = case.make_ns()
    nsteps = max(int(round(P["horizon"] / case.dt)), 1)
    ns.dt = P["horizon"] / nsteps
    base = jnp.asarray(load_field(args.bf).u, dtype=jnp.float32)
    print(f"[tpu-eigs] preset={args.preset} nelem={case.mesh.nelem} "
          f"nsteps={nsteps} backend={jax.default_backend()}", flush=True)
    t0 = time.time()
    res = linear_stability_analysis(
        ns, base, horizon=P["horizon"], nsteps=nsteps,
        k_dim=args.kdim or P["k_dim"], nev=2, tol=args.tol,
        nmodes_out=1, max_restarts=6, seed_mode=args.seed_mode,
    )
    lam = res.lam[0]
    wall = time.time() - t0
    out = dict(
        preset=args.preset, nelem=case.mesh.nelem,
        seed_mode=args.seed_mode,
        sigma=float(lam.real), omega=float(lam.imag),
        strouhal=float(abs(lam.imag)) / (2 * np.pi),
        ritz_residual=float(res.residuals[0]), n_matvecs=int(res.n_matvecs),
        wall_s=wall, backend=jax.default_backend(),
    )
    if args.ref and os.path.exists(args.ref):
        ref = json.load(open(args.ref)).get("direct")
        if ref:
            out.update(sigma_f64_cpu=ref["sigma"], omega_f64_cpu=ref["omega"],
                       dsigma=float(lam.real - ref["sigma"]),
                       domega=float(abs(lam.imag) - abs(ref["omega"])))
    print(json.dumps(out, indent=1), flush=True)
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
