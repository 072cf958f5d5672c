"""Load the reference script as an importable oracle for parity tests.

The reference ``bipedalLocomotionMPC.py`` has no ``__main__`` guard — import
runs one full control tick including ``cvxopt.solvers.qp`` (``:473-495``), and
cvxopt is not installed here. We install a *fake* cvxopt module that records
the QP matrices it is handed and returns a well-shaped dummy solution, so the
module imports and its pure functions become callable oracles.

If the reference checkout is absent, dependent tests fall back to frozen
golden arrays under tests/golden/ (see test modules).
"""

from __future__ import annotations

import importlib.util
import os
import sys
import types

import numpy as np

REFERENCE_PATH = os.environ.get(
    "BIPED_MPC_REFERENCE", "/root/reference/bipedalLocomotionMPC.py"
)

_cached = None


class _FakeCvxoptSolvers:
    """Records every QP handed to cvxopt.solvers.qp."""

    def __init__(self):
        self.captured = []

    def qp(self, P, q, G=None, h=None, A=None, b=None, **kw):
        rec = {
            "P": np.array(P),
            "q": np.array(q).reshape(-1),
            "G": None if G is None else np.array(G),
            "h": None if h is None else np.array(h).reshape(-1),
            "A": None if A is None else np.array(A),
            "b": None if b is None else np.array(b).reshape(-1),
        }
        self.captured.append(rec)
        n = rec["P"].shape[0]
        return {"x": np.zeros((n, 1)), "status": "fake"}


def _make_fake_cvxopt():
    mod = types.ModuleType("cvxopt")
    mod.matrix = lambda a, *args, **kw: np.asarray(a, dtype=float)
    mod.solvers = _FakeCvxoptSolvers()
    return mod


def reference_available() -> bool:
    return os.path.exists(REFERENCE_PATH)


def load_reference():
    """Import the reference module (cached). Returns (module, fake_cvxopt)."""
    global _cached
    if _cached is not None:
        return _cached
    fake = _make_fake_cvxopt()
    sys.modules["cvxopt"] = fake
    spec = importlib.util.spec_from_file_location("ref_biped_mpc", REFERENCE_PATH)
    mod = importlib.util.module_from_spec(spec)
    import contextlib
    import io

    # the reference prints verbosely at import; swallow it
    with contextlib.redirect_stdout(io.StringIO()):
        spec.loader.exec_module(mod)
    _cached = (mod, fake)
    return _cached
