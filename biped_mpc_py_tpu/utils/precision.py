"""Matmul precision policy.

TPU MXU defaults to bfloat16 inputs for f32 matmuls, which costs ~1e-3
relative error — fine for neural nets, not for feedback control (QP KKT
systems, rotation chains, Jacobian-transpose torque mapping). Every matrix in
this framework is tiny (<= a few hundred on a side), so full-f32 ("highest")
precision costs almost nothing while keeping trajectories trustworthy.

Wrap public entry points with :func:`f32_precision` (it applies during jit
tracing, so the whole traced program inherits the policy).
"""

from __future__ import annotations

import functools

import jax


def f32_precision(fn):
    """Decorator: trace ``fn`` under full-float32 matmul precision."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped
