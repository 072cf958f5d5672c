"""HECTOR leg kinematics (L2): FK + Jacobians from ONE chain definition.

The reference carries two 60-line blocks of MATLAB-exported trig expressions —
``getFootPositionBody`` (``bipedalLocomotionMPC.py:367-404``) and
``getLegKinematics`` (``:306-365``) — that encode *different* robot constants
(see :mod:`biped_mpc_py_tpu.models.biped`). Here the 5-DoF serial chain

    p_foot_body(q) = Rz(q0) @ ( hip + Rx(q1) @ ( abd + pitch_chain(q2,q3,q4) ) )

is written once as a ~10-line pure function; the position Jacobian is
``jax.jacfwd`` of it (forward-mode over 5 inputs — XLA fuses this into the
same kernel as the FK, no symbolic export needed), and the joint-axis rows of
the motor Jacobian follow from the chain structure in closed form. This
guarantees FK/Jacobian consistency by construction — the property the
reference lacks — while the geometry presets reproduce either reference block
to machine precision (see tests/test_kinematics.py).

Everything is batchable: ``jax.vmap`` over a leading axis of ``q`` (and over
``side`` / geometry leaves for randomized populations).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from biped_mpc_py_tpu.models.biped import BipedParams, LegGeometry
from biped_mpc_py_tpu.ops.rotations import eul2rotm


def leg_fk_body(q: jnp.ndarray, side, geom: LegGeometry) -> jnp.ndarray:
    """Foot position in the body frame from 5 joint angles.

    Parity: reference ``getFootPositionBody`` (``bipedalLocomotionMPC.py:
    367-404``) when ``geom = HECTOR_LEG_FK``.

    Args:
      q: (5,) joint angles [hip_yaw, hip_roll, hip_pitch, knee, ankle].
      side: +1 for leg 0, -1 for leg 1 (reference ``:415-418``).
      geom: leg constants.

    Returns:
      (3,) foot position in body frame.
    """
    q0, q1 = q[0], q[1]
    # cumulative pitch angles: hip pitch, +knee, +ankle
    th = jnp.cumsum(q[2:5])
    lengths = jnp.stack(
        [
            jnp.asarray(geom.l_thigh, q.dtype),
            jnp.asarray(geom.l_shank, q.dtype),
            jnp.asarray(geom.l_foot, q.dtype),
        ]
    )
    # pitch chain: sum of links hanging at cumulative pitch angles
    s = jnp.sum(lengths * jnp.sin(th))
    c = jnp.sum(lengths * jnp.cos(th))
    pitch_chain = jnp.stack([-s, jnp.zeros_like(s), -c])

    abd = jnp.stack(
        [
            jnp.zeros_like(s),
            jnp.asarray(geom.abd_y * side + geom.abd_y_const, q.dtype)
            * jnp.ones_like(s),
            jnp.zeros_like(s),
        ]
    )
    c1, s1 = jnp.cos(q1), jnp.sin(q1)
    v = abd + pitch_chain
    # Rx(q1) @ v
    v = jnp.stack([v[0], c1 * v[1] - s1 * v[2], s1 * v[1] + c1 * v[2]])
    hip = jnp.stack(
        [
            jnp.asarray(geom.hip_x, q.dtype) * jnp.ones_like(s),
            jnp.asarray(geom.hip_y * side, q.dtype) * jnp.ones_like(s),
            jnp.asarray(geom.hip_z, q.dtype) * jnp.ones_like(s),
        ]
    )
    w = hip + v
    c0, s0 = jnp.cos(q0), jnp.sin(q0)
    # Rz(q0) @ w
    return jnp.stack([c0 * w[0] - s0 * w[1], s0 * w[0] + c0 * w[1], w[2]])


def leg_joint_axes(q: jnp.ndarray) -> jnp.ndarray:
    """Rotation axes of the 5 joints in the body frame -> (3, 5).

    axis0 = z (hip yaw); axis1 = Rz(q0)·x (hip roll); axes 2..4 =
    Rz(q0)·Rx(q1)·y (the three pitch joints). These are exactly rows 3:6 of
    the reference ``Jm`` (``bipedalLocomotionMPC.py:319-362``).
    """
    c0, s0 = jnp.cos(q[0]), jnp.sin(q[0])
    c1, s1 = jnp.cos(q[1]), jnp.sin(q[1])
    zero = jnp.zeros_like(c0)
    one = jnp.ones_like(c0)
    a0 = jnp.stack([zero, zero, one])
    a1 = jnp.stack([c0, s0, zero])
    ap = jnp.stack([-s0 * c1, c0 * c1, s1])
    return jnp.stack([a0, a1, ap, ap, ap], axis=-1)


def leg_jacobians(q: jnp.ndarray, side, geom: LegGeometry):
    """Motor Jacobian Jm (6,5) and foot (position) Jacobian Jf (3,5).

    Parity: reference ``getLegKinematics`` (``bipedalLocomotionMPC.py:
    306-365``) when ``geom = HECTOR_LEG_JAC``. Rows 0:3 are the position
    Jacobian ∂p_foot/∂q (computed by forward-mode autodiff of
    :func:`leg_fk_body`), rows 3:6 the joint axes.
    """
    jf = jax.jacfwd(lambda qq: leg_fk_body(qq, side, geom))(q)
    jm = jnp.concatenate([jf, leg_joint_axes(q)], axis=0)
    return jm, jf


def foot_positions_world(
    x_fb: jnp.ndarray, q: jnp.ndarray, biped: BipedParams
) -> jnp.ndarray:
    """World-frame positions of both feet -> (6,).

    Parity: reference ``getFootPositionWorld`` (``bipedalLocomotionMPC.py:
    406-424``): ``pf_w = p_com + R.T @ (pf_body + hip_offset_mirrored)`` with
    ``R = eul2rotm(x_fb[0:3])`` (the reference applies ``R.T`` for
    body->world; preserved for parity). The reference's 2-leg Python loop
    becomes a vmap over the leg axis.

    Args:
      x_fb: (12,) or (13,) state, [roll,pitch,yaw, p, w, v(, 1)].
      q: (10,) joint angles, leg 0 then leg 1.
    """
    R = eul2rotm(x_fb[0:3])
    sides = jnp.array([1.0, -1.0], dtype=q.dtype)
    q_legs = q.reshape(2, 5)

    def one_leg(q5, side):
        pf_b = leg_fk_body(q5, side, biped.leg)
        hip = biped.hip_offset * jnp.stack(
            [jnp.ones_like(side), side, jnp.ones_like(side)]
        )
        return x_fb[3:6] + R.T @ (pf_b + hip)

    pf_w = jax.vmap(one_leg)(q_legs, sides)
    return pf_w.reshape(6)


def foot_velocities_world(
    x_fb: jnp.ndarray, q: jnp.ndarray, qd: jnp.ndarray, biped: BipedParams
) -> jnp.ndarray:
    """World-frame foot velocities via the leg Jacobians -> (2, 3).

    Parity: reference ``vf_w = R.T @ Jf @ qd_leg``
    (``bipedalLocomotionMPC.py:461``) — note the reference ignores base
    twist contributions; preserved.
    """
    R = eul2rotm(x_fb[0:3])
    sides = jnp.array([1.0, -1.0], dtype=q.dtype)

    def one_leg(q5, qd5, side):
        _, jf = leg_jacobians(q5, side, biped.jac_geometry)
        return R.T @ (jf @ qd5)

    return jax.vmap(one_leg)(q.reshape(2, 5), qd.reshape(2, 5), sides)
