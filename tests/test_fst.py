"""Free-stream-turbulence inflow subsystem (stepper/fst.py vs core/fst.f90)."""

import jax.numpy as jnp
import numpy as np

from nekstab_next_tpu.mesh import box_mesh_2d
from nekstab_next_tpu.ops.core import SEM
from nekstab_next_tpu.stepper.fst import (
    FSTInflow,
    isotropic_modes,
    natural_cubic_spline,
    von_karman_amplitudes,
    von_karman_spectrum,
)


def test_spline_reproduces_smooth_function():
    x = np.linspace(0, 1, 40)
    y = np.sin(2 * np.pi * x)
    xq = np.linspace(0.05, 0.95, 200)
    got = natural_cubic_spline(x, y, xq)
    assert np.max(np.abs(got - np.sin(2 * np.pi * xq))) < 1e-4


def test_von_karman_spectrum_shape_and_calibration():
    k = np.linspace(0.1, 20, 200)
    E = von_karman_spectrum(k, length=1.0)
    assert np.all(E > 0)
    kpk = k[np.argmax(E)]
    # vK peak at kL = sqrt(4*b/ (17/3 - 4)) ~ 1.8 for a=1.606,b=1.35
    assert 1.0 < kpk < 3.0
    # amplitude normalization: total modal energy ~ Tu^2 * 3/2 (isotropic)
    tu = 0.03
    amp = von_karman_amplitudes(0.5, 8.0, 12, 10, tu=tu, length=1.0)
    total = np.sum(amp**2) * 10  # nmodes per shell
    assert abs(total / (1.5 * tu**2) - 1.0) < 0.25


def test_fst_inflow_signal_and_stepper():
    mesh = box_mesh_2d(3, 2, order=5, x1=3.0, y1=1.0)
    sem = SEM(mesh)

    yprof = np.linspace(0.0, 1.0, 64)
    numk, nmodes = 4, 3
    omega, beta, prof = isotropic_modes(numk, nmodes, 1.0, 6.0, yprof, seed=3)
    amp_shell = von_karman_amplitudes(1.0, 6.0, numk, nmodes, tu=0.05, length=1.0)
    amps = np.repeat(amp_shell, nmodes)

    fst = FSTInflow.from_modes(mesh, omega, beta, yprof, prof, amps,
                               u_mean=(1.0, 0.0))
    # intensity within a factor of ~2 of the target (finite-mode sampling)
    tu = fst.turbulence_intensity(nt=48)
    assert 0.02 < tu < 0.12, tu

    # the lift field is zero away from the inlet and time-dependent on it
    f0 = fst(0.0)
    f1 = fst(0.37)
    x = mesh.x.reshape(-1)
    off_inlet = np.abs(x - x.min()) > 1e-10
    assert float(jnp.max(jnp.abs(f0.reshape(-1, 2)[off_inlet]))) == 0.0
    assert float(jnp.max(jnp.abs(f1 - f0))) > 0.0

    # drives the stepper: one step with the time-dependent BC stays finite
    # and carries the inflow value on the inlet nodes
    from nekstab_next_tpu.stepper.navier_stokes import NavierStokes
    from nekstab_next_tpu.stepper.state import initial_state
    import jax

    ns = NavierStokes(sem, viscosity=0.05, dt=0.002, u_bc_fn=fst)
    st = ns.make_state(jnp.zeros(sem.bm.shape + (2,)) + jnp.asarray([1.0, 0.0]))
    st1 = jax.jit(ns.step)(st)
    assert bool(jnp.all(jnp.isfinite(st1.u)))
    want = np.asarray(fst(ns.dt)).reshape(-1, 2)[fst.inlet_idx]
    got = np.asarray(st1.u).reshape(-1, 2)[fst.inlet_idx]
    assert np.allclose(got, want, atol=1e-12)


def test_fst_data_reader_roundtrip(tmp_path):
    """Reference FST_data/ ingestion (fst.f90 initWavenumbers/initModes):
    write a synthetic mode library in the exact file format, read it back,
    and check the reconstructed inlet signal against a direct NumPy replay
    of the Fortran computeTurbu recipe (fst.f90:160-224)."""
    from nekstab_next_tpu.stepper.fst import fst_from_directory, load_fst_data

    rng = np.random.default_rng(3)
    numk, nmodes = 3, 2
    M = numk * nmodes
    npts = 21
    ygrid = np.linspace(0.0, 1.0, npts)
    omega = rng.uniform(0.5, 3.0, M)
    beta = rng.uniform(-1.0, 1.0, M)
    prof = rng.standard_normal((M, npts, 6)) * 0.3

    d = tmp_path / "FST_data"
    d.mkdir()
    for m in range(M):
        (d / f"wavenumber{m+1:03d}.dat").write_text(
            f"{omega[m]:.12e}\n0.0\n{beta[m]:.12e}\n"
        )
        rows = "\n".join(
            f"{ygrid[i]:.12e} " + " ".join(f"{prof[m, i, c]:.12e}"
                                           for c in range(6))
            for i in range(npts)
        )
        (d / f"velocity{m+1:03d}.dat").write_text(f"{npts}\n{rows}\n")

    om2, be2, y2, p2 = load_fst_data(str(d), numk, nmodes, ndim=3)
    np.testing.assert_allclose(om2, omega, rtol=1e-12)
    np.testing.assert_allclose(be2, beta, rtol=1e-12)
    np.testing.assert_allclose(y2, ygrid, rtol=1e-12)
    np.testing.assert_allclose(p2[..., 0, 0], prof[:, :, 0], rtol=1e-12)
    np.testing.assert_allclose(p2[..., 2, 1], prof[:, :, 5], rtol=1e-12)

    # end-to-end: inlet signal vs a direct replay of computeTurbu
    mesh = box_mesh_2d(3, 4, order=4, x0=0.0, x1=3.0, y0=0.0, y1=1.0)
    tu, length, k_ini, k_fin = 0.03, 1.0, 0.8, 4.0
    inflow = fst_from_directory(
        mesh, str(d), numk, nmodes, tu=tu, length=length,
        k_ini=k_ini, k_fin=k_fin, u_mean=(1.0, 0.0),
    )
    t = 0.37
    got = np.asarray(inflow.inlet_velocity(t))

    from nekstab_next_tpu.stepper.fst import (
        natural_cubic_spline, von_karman_amplitudes,
    )

    x = mesh.x.reshape(-1)
    vm = np.asarray(mesh.vmask[..., 0]).reshape(-1)
    idx = np.nonzero((np.abs(x - x.min()) < 1e-10) & (vm == 0.0))[0]
    yq = mesh.y.reshape(-1)[idx]
    zq = np.zeros_like(yq)
    amps = np.repeat(
        von_karman_amplitudes(k_ini, k_fin, numk, nmodes, tu, length), nmodes
    )
    want = np.tile([1.0, 0.0], (len(idx), 1))
    for m in range(M):
        auxc = (np.cos(+omega[m] * t + beta[m] * zq)
                + np.cos(-omega[m] * t + beta[m] * zq))
        auxs = (-np.sin(+omega[m] * t + beta[m] * zq)
                - np.sin(-omega[m] * t + beta[m] * zq))
        for dcomp, (cr, ci) in enumerate(((0, 1), (2, 3))):
            ure = natural_cubic_spline(ygrid, prof[m, :, cr], yq)
            uim = natural_cubic_spline(ygrid, prof[m, :, ci], yq)
            want[:, dcomp] += amps[m] * (ure * auxc + uim * auxs)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)
