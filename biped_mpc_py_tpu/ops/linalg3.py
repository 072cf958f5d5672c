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
