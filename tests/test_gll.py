import numpy as np

from nekstab_next_tpu.mesh.gll import (
    diff_matrix,
    gauss_points_weights,
    gll_points_weights,
    lagrange_interp_matrix,
)


def test_gll_weights_sum_to_two():
    for n in range(2, 16):
        x, w = gll_points_weights(n)
        assert abs(w.sum() - 2.0) < 1e-13
        assert x[0] == -1.0 and x[-1] == 1.0
        assert np.all(np.diff(x) > 0)


def test_gll_quadrature_exactness():
    # GLL with n points integrates polynomials up to degree 2n-3 exactly
    n = 8
    x, w = gll_points_weights(n)
    for deg in range(2 * n - 2):
        exact = (1 - (-1) ** (deg + 1)) / (deg + 1)
        assert abs(np.dot(w, x**deg) - exact) < 1e-12, deg


def test_diff_matrix_exact_on_polynomials():
    n = 7
    x, _ = gll_points_weights(n)
    D = diff_matrix(n)
    for deg in range(n):
        u = x**deg
        du = deg * x ** max(deg - 1, 0) if deg > 0 else np.zeros_like(x)
        assert np.max(np.abs(D @ u - du)) < 1e-11


def test_interp_matrix_exact_on_polynomials():
    n = 6
    xc, _ = gll_points_weights(n)
    xf, _ = gauss_points_weights(9)
    J = lagrange_interp_matrix(xc, xf)
    for deg in range(n):
        assert np.max(np.abs(J @ xc**deg - xf**deg)) < 1e-12


def test_interp_matrix_at_coincident_points():
    xc, _ = gll_points_weights(5)
    J = lagrange_interp_matrix(xc, xc)
    assert np.max(np.abs(J - np.eye(5))) < 1e-12
