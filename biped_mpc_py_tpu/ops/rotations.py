"""Rotation / small-matrix utilities (L1).

TPU-native rebuild of the reference math layer (``bipedalLocomotionMPC.py:
111-146``): pure ``jnp``, shape-polymorphic over leading batch axes, no host
branches. The reference's conflicting Euler conventions (SURVEY.md C6) are
collapsed into one: **eul = [roll, pitch, yaw]**, R = Rz(yaw) @ Ry(pitch)
@ Rx(roll) (intrinsic ZYX), matching the reference's ``eul2rotm``
(``:124-138``). The reference's scipy ``R.from_euler('zyx', [yaw, pitch,
roll])`` call (``:154-156``) is a *third*, deviating convention (lowercase
'zyx' is extrinsic = Rx@Ry@Rz) that coincides with this one only at special
attitudes; models/srb.py and docs/DESIGN_NOTES.md document that deviation.
"""

from __future__ import annotations

import jax.numpy as jnp


def eul2rotm(eul: jnp.ndarray) -> jnp.ndarray:
    """Euler angles [roll, pitch, yaw] (eul[..., 3]) -> rotation (..., 3, 3).

    R = Rz(yaw) @ Ry(pitch) @ Rx(roll); rotates body-frame vectors into the
    world frame... with the caveat that the *reference* consistently uses
    ``R.T`` for body->world (e.g. ``bipedalLocomotionMPC.py:423, 461, 465``);
    we preserve that usage at the call sites for behavioral parity.
    """
    cr, cp, cy = jnp.cos(eul[..., 0]), jnp.cos(eul[..., 1]), jnp.cos(eul[..., 2])
    sr, sp, sy = jnp.sin(eul[..., 0]), jnp.sin(eul[..., 1]), jnp.sin(eul[..., 2])
    row0 = jnp.stack([cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr], -1)
    row1 = jnp.stack([sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr], -1)
    row2 = jnp.stack([-sp, cp * sr, cp * cr], -1)
    return jnp.stack([row0, row1, row2], axis=-2)


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric cross-product matrix of v(..., 3) -> (..., 3, 3).

    Parity: reference ``skew`` (``bipedalLocomotionMPC.py:140-146``).
    """
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    row0 = jnp.stack([zero, -z, y], -1)
    row1 = jnp.stack([z, zero, -x], -1)
    row2 = jnp.stack([-y, x, zero], -1)
    return jnp.stack([row0, row1, row2], axis=-2)


def euler_rate_matrix_inv(pitch: jnp.ndarray, yaw: jnp.ndarray) -> jnp.ndarray:
    """Inverse of the ZYX Euler-rate matrix, closed form (..., 3, 3).

    The reference builds ``E = [[cy·cp, -sy, 0], [sy·cp, cy, 0], [-sp, 0, 1]]``
    and inverts it numerically (``bipedalLocomotionMPC.py:160-164``); ``E``
    maps [roll_dot, pitch_dot, yaw_dot] (in that column order as used there)
    to world angular velocity. We use the closed-form inverse
    ``E^{-1} = [[cy/cp, sy/cp, 0], [-sy, cy, 0], [cy·tp, sy·tp, 1]]`` — no
    LAPACK call, fuses into the surrounding linearization kernel.
    """
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    inv_cp = 1.0 / cp
    tp = sp * inv_cp
    zero = jnp.zeros_like(cp)
    one = jnp.ones_like(cp)
    row0 = jnp.stack([cy * inv_cp, sy * inv_cp, zero], -1)
    row1 = jnp.stack([-sy, cy, zero], -1)
    row2 = jnp.stack([cy * tp, sy * tp, one], -1)
    return jnp.stack([row0, row1, row2], axis=-2)


def quat_to_rotm(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (w, x, y, z)(..., 4) -> rotation matrix (..., 3, 3)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack(
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1
    )
    row1 = jnp.stack(
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1
    )
    row2 = jnp.stack(
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1
    )
    return jnp.stack([row0, row1, row2], axis=-2)


def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product of quaternions (w, x, y, z)."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        -1,
    )


def quat_integrate(q: jnp.ndarray, omega: jnp.ndarray, dt) -> jnp.ndarray:
    """Integrate unit quaternion by world-frame angular velocity over dt.

    Exponential-map integrator: q' = exp(0.5·dt·omega) ⊗ q, renormalized.
    Branch-free (uses a sinc-stable small-angle form) so it jits and vmaps.
    """
    half = 0.5 * dt * omega
    theta2 = jnp.sum(half * half, axis=-1, keepdims=True)
    theta = jnp.sqrt(theta2 + 1e-24)
    # sin(theta)/theta, stable near zero
    sinc = jnp.where(theta2 > 1e-12, jnp.sin(theta) / theta, 1.0 - theta2 / 6.0)
    dq = jnp.concatenate([jnp.cos(theta), sinc * half], axis=-1)
    out = quat_mul(dq, q)
    return out / jnp.linalg.norm(out, axis=-1, keepdims=True)


def rotm_to_eul(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> Euler [roll, pitch, yaw] (ZYX)."""
    pitch = -jnp.arcsin(jnp.clip(R[..., 2, 0], -1.0, 1.0))
    roll = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    yaw = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    return jnp.stack([roll, pitch, yaw], -1)


def quat_to_eul(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (w,x,y,z) -> Euler [roll, pitch, yaw] (ZYX)."""
    return rotm_to_eul(quat_to_rotm(q))


def eul_to_quat(eul: jnp.ndarray) -> jnp.ndarray:
    """Euler [roll, pitch, yaw] (ZYX) -> unit quaternion (w,x,y,z)."""
    hr, hp, hy = eul[..., 0] * 0.5, eul[..., 1] * 0.5, eul[..., 2] * 0.5
    cr, sr = jnp.cos(hr), jnp.sin(hr)
    cp, sp = jnp.cos(hp), jnp.sin(hp)
    cy, sy = jnp.cos(hy), jnp.sin(hy)
    return jnp.stack(
        [
            cy * cp * cr + sy * sp * sr,
            cy * cp * sr - sy * sp * cr,
            cy * sp * cr + sy * cp * sr,
            sy * cp * cr - cy * sp * sr,
        ],
        -1,
    )
