"""Swing-leg cartesian PD control (L5/C12).

Parity: reference ``swingLegControl`` (``bipedalLocomotionMPC.py:426-442``):
Raibert foot target at half-horizon lookahead with a lateral ``0.04·side``
offset, sinusoidal swing height over the half-gait-cycle phase, and an
isotropic cartesian PD force. Pure jnp, batchable over legs and envs.
"""

from __future__ import annotations

import jax.numpy as jnp

from biped_mpc_py_tpu.config import MpcConfig
from biped_mpc_py_tpu.control.reference import _raibert_xy

Y_OFFSET = 0.04  # lateral swing-target offset [m] (reference ``:427``)


def swing_target_xy(x_fb: jnp.ndarray, mpc: MpcConfig, side):
    """Raibert swing-foot target (x, y) with the lateral stance-width offset
    rotated by the current yaw.

    The reference adds ``0.04*side`` to WORLD y (``bipedalLocomotionMPC.py:
    434``) — correct only at yaw=0 (its single exercised configuration).
    Here the offset is applied in the heading frame so turning gaits keep
    their stance width; set ``mpc.compat_swing_yaw_bug=True`` to replicate
    the reference literally.
    """
    fx, fy = _raibert_xy(x_fb, mpc, 0.5 * mpc.h * mpc.dt)
    if mpc.compat_swing_yaw_bug:
        return fx, fy + Y_OFFSET * side
    yaw = x_fb[2]
    return (
        fx - jnp.sin(yaw) * Y_OFFSET * side,
        fy + jnp.cos(yaw) * Y_OFFSET * side,
    )


def swing_leg_force(
    x_fb: jnp.ndarray,
    t,
    pf_w: jnp.ndarray,
    vf_w: jnp.ndarray,
    mpc: MpcConfig,
    side,
) -> jnp.ndarray:
    """PD force (3,) driving the swing foot to its Raibert target."""
    fx, fy = swing_target_xy(x_fb, mpc, side)
    t_phase = jnp.remainder(jnp.asarray(t, x_fb.dtype), mpc.dt * mpc.h / 2)
    fz = mpc.swing_height * jnp.sin(jnp.pi * t_phase / (mpc.dt * mpc.h / 2))
    foot_des = jnp.stack([fx, fy, fz])
    return mpc.kp_swing * (foot_des - pf_w) + mpc.kd_swing * (-vf_w)
