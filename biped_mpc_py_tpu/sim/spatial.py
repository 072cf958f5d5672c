"""6D spatial-vector algebra (Featherstone) for articulated-body dynamics.

The reference has no simulator at all (``README.md:7`` TODO); this layer is
the foundation of the MJX-style articulated engine (sim/engine.py). Design
for TPU: spatial transforms are kept factored as (R (3,3), p (3,)) instead of
materialized 6x6 Plücker matrices — every product is then a handful of 3x3
ops that XLA fuses; everything broadcasts over leading batch axes and the
kinematic tree is unrolled at trace time (11 bodies, static).

Spatial vector convention (Featherstone): motion v = [omega; v_lin], force
f = [n; f_lin], both expressed in the local body frame.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from biped_mpc_py_tpu.ops.rotations import skew


class SpatialTransform(NamedTuple):
    """X = (R, p): transform motion vectors from frame A to frame B, where
    frame B's origin sits at p (in A coordinates) with orientation R (rows =
    B axes in A coordinates, i.e. transforms A-coords to B-coords)."""

    R: jnp.ndarray  # (...,3,3)
    p: jnp.ndarray  # (...,3)


def xform_identity(dtype=jnp.float32) -> SpatialTransform:
    return SpatialTransform(R=jnp.eye(3, dtype=dtype), p=jnp.zeros(3, dtype))


def xform_compose(X2: SpatialTransform, X1: SpatialTransform) -> SpatialTransform:
    """X2 ∘ X1 (apply X1 first)."""
    return SpatialTransform(
        R=X2.R @ X1.R,
        p=X1.p + jnp.einsum("...ji,...j->...i", X1.R, X2.p),
    )


def xform_motion(X: SpatialTransform, v: jnp.ndarray) -> jnp.ndarray:
    """Transform a motion vector [w; v] from A to B coordinates.

    vB = [R w ; R (v - p × w)]
    """
    w, vl = v[..., 0:3], v[..., 3:6]
    wB = jnp.einsum("...ij,...j->...i", X.R, w)
    vB = jnp.einsum("...ij,...j->...i", X.R, vl - jnp.cross(X.p, w))
    return jnp.concatenate([wB, vB], axis=-1)


def xform_force(X: SpatialTransform, f: jnp.ndarray) -> jnp.ndarray:
    """Transform a force vector [n; f] from A to B coordinates.

    fB = [R (n - p × f) ; R f]
    """
    n, fl = f[..., 0:3], f[..., 3:6]
    fB = jnp.einsum("...ij,...j->...i", X.R, fl)
    nB = jnp.einsum("...ij,...j->...i", X.R, n - jnp.cross(X.p, fl))
    return jnp.concatenate([nB, fB], axis=-1)


def xform_motion_inv(X: SpatialTransform, v: jnp.ndarray) -> jnp.ndarray:
    """Transform a motion vector from B back to A coordinates."""
    w, vl = v[..., 0:3], v[..., 3:6]
    wA = jnp.einsum("...ji,...j->...i", X.R, w)
    vA = jnp.einsum("...ji,...j->...i", X.R, vl) + jnp.cross(X.p, wA)
    return jnp.concatenate([wA, vA], axis=-1)


def xform_force_inv(X: SpatialTransform, f: jnp.ndarray) -> jnp.ndarray:
    """Transform a force vector from B back to A coordinates."""
    n, fl = f[..., 0:3], f[..., 3:6]
    fA = jnp.einsum("...ji,...j->...i", X.R, fl)
    nA = jnp.einsum("...ji,...j->...i", X.R, n) + jnp.cross(X.p, fA)
    return jnp.concatenate([nA, fA], axis=-1)


def crm(v: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """Spatial motion cross product v ×m m."""
    w, vl = v[..., 0:3], v[..., 3:6]
    mw, mv = m[..., 0:3], m[..., 3:6]
    return jnp.concatenate(
        [jnp.cross(w, mw), jnp.cross(w, mv) + jnp.cross(vl, mw)], axis=-1
    )


def crf(v: jnp.ndarray, f: jnp.ndarray) -> jnp.ndarray:
    """Spatial force cross product v ×f f = -(v ×m)ᵀ f."""
    w, vl = v[..., 0:3], v[..., 3:6]
    n, fl = f[..., 0:3], f[..., 3:6]
    return jnp.concatenate(
        [jnp.cross(w, n) + jnp.cross(vl, fl), jnp.cross(w, fl)], axis=-1
    )


def spatial_inertia(
    mass, com: jnp.ndarray, I_com: jnp.ndarray
) -> jnp.ndarray:
    """6x6 spatial inertia of a rigid body about its frame origin.

    I = [[I_com + m·cx·cxᵀ, m·cx], [m·cxᵀ, m·1]] with cx = skew(com).
    Broadcasts over leading batch axes.
    """
    cx = skew(com)
    m = jnp.asarray(mass)[..., None, None]
    cxT = jnp.swapaxes(cx, -1, -2)
    eye3 = jnp.broadcast_to(jnp.eye(3, dtype=cx.dtype), cx.shape)
    top = jnp.concatenate(
        [I_com + m * (cx @ cxT), m * cx], axis=-1
    )
    bottom = jnp.concatenate([m * cxT, m * eye3], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def motion_matrix(X: SpatialTransform) -> jnp.ndarray:
    """Materialized 6x6 motion transform Xm (A->B coords), batched:
    Xm = [[R, 0], [-R px, R]]."""
    R, p = X.R, X.p
    px = skew(p)
    zero = jnp.zeros_like(R)
    top = jnp.concatenate([R, zero], axis=-1)
    bottom = jnp.concatenate([-R @ px, R], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def xform_inertia(X: SpatialTransform, I: jnp.ndarray) -> jnp.ndarray:
    """Transform a 6x6 spatial inertia from B (child) to A (parent) coords:
    I_A = Xmᵀ I Xm with Xm the A->B motion transform. Broadcasts."""
    Xm = motion_matrix(X)
    return jnp.swapaxes(Xm, -1, -2) @ I @ Xm
