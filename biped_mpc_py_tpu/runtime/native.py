"""ctypes binding for the native C++ QP solver (runtime/qp_ipm.cpp).

The reference's entire solve runs in cvxopt's C extension
(``bipedalLocomotionMPC.py:297``); this is the framework's native
counterpart: a dependency-free C++ dense interior-point solver used as a
host-side oracle (golden generation, cross-checking the on-device ADMM) and
available for CPU deployments without JAX.

The shared library is compiled on first use with g++ (no pybind11 in the
image; plain ctypes keeps the binding zero-dependency) and cached next to
the source.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_RUNTIME_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "runtime",
)
_SRC = os.path.join(_RUNTIME_DIR, "qp_ipm.cpp")
_LIB = os.path.join(_RUNTIME_DIR, "libqp_ipm.so")

_lib = None


def _build() -> None:
    subprocess.run(
        ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
         _SRC, "-o", _LIB],
        check=True,
        capture_output=True,
    )


def load():
    """Load (building if needed) the native library; returns the ctypes lib."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        _build()
    lib = ctypes.CDLL(_LIB)
    dp = np.ctypeslib.ndpointer(dtype=np.float64, flags="C_CONTIGUOUS")
    lib.qp_solve_dense.restype = ctypes.c_int
    lib.qp_solve_dense.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        dp, dp, dp, dp, dp, dp,
        ctypes.c_int, ctypes.c_double,
        dp, dp, dp, dp,
    ]
    _lib = lib
    return lib


def solve_qp_native(P, q, G=None, h=None, A=None, b=None,
                    max_iter: int = 50, tol: float = 1e-9):
    """Solve min 1/2 x'Px + q'x s.t. Gx <= h, Ax = b with the C++ IPM.

    Returns (x, info) mirroring tests/oracle_qp.py's interface.
    """
    lib = load()
    P = np.ascontiguousarray(P, np.float64)
    q = np.ascontiguousarray(np.reshape(q, -1), np.float64)
    n = q.size
    G = np.zeros((0, n)) if G is None else np.ascontiguousarray(G, np.float64)
    h = np.zeros(0) if h is None else np.ascontiguousarray(np.reshape(h, -1), np.float64)
    A = np.zeros((0, n)) if A is None else np.ascontiguousarray(A, np.float64)
    b = np.zeros(0) if b is None else np.ascontiguousarray(np.reshape(b, -1), np.float64)
    m, p = G.shape[0], A.shape[0]
    x = np.zeros(n)
    y = np.zeros(max(p, 1))
    z = np.zeros(max(m, 1))
    info = np.zeros(3)
    status = lib.qp_solve_dense(
        n, m, p, P, q, G, h, A, b, int(max_iter), float(tol), x, y, z, info
    )
    return x, {
        "status": {0: "optimal", 1: "optimal", 2: "failed"}[status],
        "iters": int(info[0]),
        "residual": float(info[1]),
        "y": y[:p],
        "z": z[:m],
    }
