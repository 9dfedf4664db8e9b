"""Run the cylinder Re=60 direct eigensolve ON the TPU chip in f32.

Loads the committed f64 CPU base flow (cylinder_out2/BF_cyl_00001.npz),
casts to f32, and runs Krylov-Schur on the f32 tangent propagator — the
production TPU configuration (f32 compute; f64 tolerances are reached via
mixed-precision refinement when needed).  Compares the eigenvalue against
the f64 CPU result in cylinder_out2/summary.json.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from nekstab_next_tpu.algorithms.stability import linear_stability_analysis
    from nekstab_next_tpu.cases.cylinder import CylinderCase
    from nekstab_next_tpu.config import SolverConfig
    from nekstab_next_tpu.io import load_field

    solver = SolverConfig(pressure_tol=1e-5, velocity_tol=1e-6,
                          pressure_maxiter=500, velocity_maxiter=200)
    case = CylinderCase(reynolds=60.0, nr=6, ntheta=16, order=6,
                        outer_radius=20.0, dtype=jnp.float32, solver=solver)
    ns = case.make_ns()
    nsteps = 193
    ns.dt = 1.0 / nsteps
    base = jnp.asarray(load_field("cylinder_out2/BF_cyl_00001.npz").u,
                       dtype=jnp.float32)
    t0 = time.time()
    res = linear_stability_analysis(
        ns, base, horizon=1.0, nsteps=nsteps, k_dim=48, nev=2, tol=3e-5,
        nmodes_out=1, max_restarts=6,
    )
    lam = res.lam[0]
    wall = time.time() - t0
    ref = json.load(open("cylinder_out2/summary.json"))["direct"]
    out = dict(
        sigma=float(lam.real), omega=float(lam.imag),
        ritz_residual=float(res.residuals[0]), n_matvecs=int(res.n_matvecs),
        wall_s=wall, backend=jax.default_backend(),
        sigma_f64_cpu=ref["sigma"], omega_f64_cpu=ref["omega"],
        dsigma=float(lam.real - ref["sigma"]),
        domega=float(abs(lam.imag) - abs(ref["omega"])),
    )
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
