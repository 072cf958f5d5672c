"""Tiny-matrix products that stay OFF the MXU.

A 3x3 ``jnp.matmul`` lowers to a dot_general whose contracting dimension is
padded to the MXU's 128 lanes — ~40x wasted work and, worse, per-op latency
that dominates the horizon-batched SRB linearization (measured 22 ms/1024
envs before this change). Expressing the contraction as broadcast
multiply+sum keeps these on the VPU where a 3-wide reduction is cheap.

Use for 3x3/3-vector math batched over large leading axes; leave genuinely
large matmuls (the 120-dim QP operators) to the MXU.
"""

from __future__ import annotations

import jax.numpy as jnp


def mm3(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) @ (..., 3, 3) on the VPU."""
    return jnp.sum(a[..., :, :, None] * b[..., None, :, :], axis=-2)


def mv3(a: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) @ (..., 3) on the VPU."""
    return jnp.sum(a * v[..., None, :], axis=-1)


def mtv3(a: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3)^T @ (..., 3) on the VPU."""
    return jnp.sum(a * v[..., :, None], axis=-2)


def mtm3(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3)^T @ (..., 3, 3) on the VPU."""
    return jnp.sum(a[..., :, :, None] * b[..., :, None, :], axis=-3)


def inv3(M: jnp.ndarray) -> jnp.ndarray:
    """Closed-form (..., 3, 3) inverse (adjugate / determinant) — VPU-only,
    no LAPACK loop lowering (see models/srb.py for the SRB use)."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    inv_det = 1.0 / det
    row0 = jnp.stack([A, -(b * i - c * h), b * f - c * e], -1)
    row1 = jnp.stack([B, a * i - c * g, -(a * f - c * d)], -1)
    row2 = jnp.stack([C, -(a * h - b * g), a * e - b * d], -1)
    return jnp.stack([row0, row1, row2], -2) * inv_det[..., None, None]
