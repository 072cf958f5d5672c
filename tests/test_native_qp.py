"""Native C++ IPM (runtime/qp_ipm.cpp) vs the NumPy oracle and the
reference's captured QP — the cvxopt-role component of the framework."""

import numpy as np
import pytest

from biped_mpc_py_tpu.runtime.native import solve_qp_native

from tests._reference import load_reference, reference_available
from tests.oracle_qp import kkt_residuals, solve_qp_ipm


def test_native_builds_and_solves_random_qps(rng):
    for trial in range(5):
        n, m, p = 30, 40, 5
        M = rng.normal(size=(n, n))
        P = M @ M.T + np.eye(n)
        q = rng.normal(size=n)
        G = rng.normal(size=(m, n))
        h = rng.normal(size=m) + 1.0
        A = rng.normal(size=(p, n))
        b = rng.normal(size=p)
        x_c, info_c = solve_qp_native(P, q, G, h, A, b)
        assert info_c["status"] == "optimal", info_c
        x_py, info_py = solve_qp_ipm(P, q, G, h, A, b)
        np.testing.assert_allclose(x_c, x_py, atol=1e-6, err_msg=f"trial {trial}")
        res = kkt_residuals(
            x_c, P, q, G, h, A, b, z=info_c["z"], y=info_c["y"]
        )
        assert max(res.values()) < 1e-6, res


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_native_solves_reference_tick_qp():
    _, fake = load_reference()
    cap = fake.solvers.captured[0]
    x_c, info_c = solve_qp_native(
        cap["P"], cap["q"], cap["G"], cap["h"], cap["A"], cap["b"]
    )
    assert info_c["status"] == "optimal", info_c
    x_py, _ = solve_qp_ipm(
        cap["P"], cap["q"], G=cap["G"], h=cap["h"], A=cap["A"], b=cap["b"]
    )
    np.testing.assert_allclose(x_c, x_py, atol=1e-5)


def test_native_unconstrained():
    rng = np.random.default_rng(7)
    n = 12
    M = rng.normal(size=(n, n))
    P = M @ M.T + np.eye(n)
    q = rng.normal(size=n)
    x, info = solve_qp_native(P, q)
    np.testing.assert_allclose(x, np.linalg.solve(P, -q), atol=1e-8)
