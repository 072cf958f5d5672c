"""Swing-leg cartesian PD control (L5/C12).

Parity: reference ``swingLegControl`` (``bipedalLocomotionMPC.py:426-442``):
Raibert foot target at half-horizon lookahead with a lateral ``0.04·side``
offset, sinusoidal swing height over the half-gait-cycle phase, and an
isotropic cartesian PD force. Pure jnp, batchable over legs and envs.
"""

from __future__ import annotations

import jax.numpy as jnp

from biped_mpc_py_tpu.config import GaitConfig, MpcConfig
from biped_mpc_py_tpu.control.gait import phase_time
from biped_mpc_py_tpu.control.reference import _raibert_xy

Y_OFFSET = 0.04  # lateral swing-target offset [m] (reference ``:427``)


def swing_target_xy(
    x_fb: jnp.ndarray, mpc: MpcConfig, side, gait: GaitConfig | None = None
):
    """Raibert swing-foot target (x, y) with the lateral stance-width offset
    rotated by the (touchdown-predicted) heading.

    The reference adds ``0.04*side`` to WORLD y (``bipedalLocomotionMPC.py:
    434``) — correct only at yaw=0 (its single exercised configuration).
    Here the offset is applied in the heading frame, advanced by half a
    stance phase of the commanded turn rate so the touchdown stance width is
    right while turning; set ``mpc.compat_swing_yaw_bug=True`` to replicate
    the reference literally.
    """
    t_p = phase_time(mpc, gait)
    fx, fy = _raibert_xy(x_fb, mpc, t_p)
    if mpc.compat_swing_yaw_bug:
        return fx, fy + Y_OFFSET * side
    yaw = x_fb[2] + mpc.x_cmd[8] * 0.5 * t_p  # heading at mid-touchdown
    return (
        fx - jnp.sin(yaw) * mpc.swing_y_offset * side,
        fy + jnp.cos(yaw) * mpc.swing_y_offset * side,
    )


def swing_phase_z(t, mpc: MpcConfig, gait: GaitConfig | None, dtype):
    """Sinusoidal swing-apex height at time t within the current phase.

    Reference ``:436-437`` with the hard-coded half-gait-cycle period
    ``dt*h/2`` generalized to ``steps_per_phase*dt`` (identical at the
    default cadence).
    """
    t_p = phase_time(mpc, gait)
    t_phase = jnp.remainder(jnp.asarray(t, dtype), t_p)
    return mpc.swing_height * jnp.sin(jnp.pi * t_phase / t_p)


def swing_leg_force(
    x_fb: jnp.ndarray,
    t,
    pf_w: jnp.ndarray,
    vf_w: jnp.ndarray,
    mpc: MpcConfig,
    side,
    gait: GaitConfig | None = None,
) -> jnp.ndarray:
    """PD force (3,) driving the swing foot to its Raibert target."""
    fx, fy = swing_target_xy(x_fb, mpc, side, gait)
    fz = swing_phase_z(t, mpc, gait, x_fb.dtype)
    foot_des = jnp.stack([fx, fy, fz])
    return mpc.kp_swing * (foot_des - pf_w) + mpc.kd_swing * (-vf_w)
