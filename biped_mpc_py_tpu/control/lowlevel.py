"""Low-level force/moment -> joint-torque mapping (L5/C13).

Parity: reference ``lowLevelControl`` (``bipedalLocomotionMPC.py:444-470``):
per leg, stance torque tau = Jmᵀ·(-[Rᵀf; Rᵀm]) gated by the first horizon
step's contact flag, plus swing torque tau = Jfᵀ·F_swing gated by its
complement. The reference's per-leg Python loop becomes a leg vmap; the
swing/stance branch is a multiply by the {0,1} contact flag exactly as in the
reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from biped_mpc_py_tpu.config import GaitConfig, MpcConfig
from biped_mpc_py_tpu.control.swing import swing_leg_force
from biped_mpc_py_tpu.models.biped import BipedParams
from biped_mpc_py_tpu.models.kinematics import leg_jacobians
from biped_mpc_py_tpu.ops.rotations import eul2rotm


def low_level_control(
    x_fb: jnp.ndarray,
    t,
    pf_w: jnp.ndarray,
    q: jnp.ndarray,
    qd: jnp.ndarray,
    mpc: MpcConfig,
    biped: BipedParams,
    contact: jnp.ndarray,
    u0: jnp.ndarray,
    gait: GaitConfig | None = None,
    cmd_ref: jnp.ndarray | None = None,
    terrain=None,
    v_int: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Joint torques (10,) from the first MPC control.

    Args:
      pf_w: (6,) world foot positions (both legs).
      q, qd: (10,) joint positions/velocities.
      contact: (h,2) horizon contact flags (only row 0 is used, reference
        ``:446``).
      u0: (12,) first-step MPC control [f_l, f_r, m_l, m_r].
      gait: sets the swing clock's phase period (None = reference h/2
        relation).
      cmd_ref: (3,) leak-anchored command pose [x, y, yaw]
        (controller.advance_cmd_ref); in body-frame command mode its yaw is
        the swing foot-heading target frame. None, or world-frame command
        mode = use mpc.x_cmd[2] (the commanded world yaw).
    """
    R = eul2rotm(x_fb[0:3])
    c0 = contact[0, 0:2]
    sides = jnp.array([1.0, -1.0], dtype=q.dtype)
    # Swing hip-yaw target: plant the foot aligned with the COMMANDED
    # heading, not with the (oscillating) body. Under stick friction the
    # planted foot is the yaw anchor the body pivots about, so foot
    # heading — set by hip yaw at touchdown — is the real heading control
    # channel; targeting q0 = 0 (body-aligned) instead couples the posture
    # torque's body reaction into the next touchdown and pumps a
    # gait-synchronous body-yaw oscillation (measured in the MuJoCo
    # closed loop: growing +-0.8 rad swings, fall within 2 s).
    # cmd_ref is a command ANCHOR only in body-frame mode (com_reference
    # gates on mpc.cmd_body_frame); in world-frame mode it merely trails
    # measured yaw via the leak, so using it there would erase a nonzero
    # world-frame yaw command x_cmd[2] from the foot-heading channel.
    if mpc.cmd_body_frame and cmd_ref is not None:
        yaw_des = cmd_ref[2]
    else:
        yaw_des = mpc.x_cmd[2]
    dyaw = yaw_des - x_fb[2]
    dyaw = jnp.arctan2(jnp.sin(dyaw), jnp.cos(dyaw))
    # touchdown pre-rotation against the measured yaw-rate error
    # (MpcConfig.hipyaw_rate_lead; 0 = round-4 behavior bit-for-bit)
    dyaw_tgt = dyaw - mpc.hipyaw_rate_lead * (x_fb[8] - mpc.x_cmd[8])
    q_yaw_des = jnp.clip(
        dyaw_tgt, -mpc.hipyaw_target_clip, mpc.hipyaw_target_clip
    )
    # flight flag (both feet scheduled airborne): gates the reaction-wheel
    # yaw damping (MpcConfig.flight_yaw_kd) — hip-yaw torque on BOTH legs
    # against the torso yaw-rate error, the only yaw channel with no foot
    # on the ground
    flight = (1.0 - c0[0]) * (1.0 - c0[1])
    tau_fly = flight * jnp.clip(
        mpc.flight_yaw_kd * (x_fb[8] - mpc.x_cmd[8]),
        -mpc.tau_yaw_clip, mpc.tau_yaw_clip,
    )

    def one_leg(q5, qd5, side, pf3, f3, m3, c):
        jm, jf = leg_jacobians(q5, side, biped.jac_geometry)
        # Leg Jacobians are BODY-frame operators, so world foot velocity
        # is R @ (Jf qd) and a world swing force maps through Jfᵀ Rᵀ. The
        # reference rotates both the WRONG way (``:461,468`` — exact only
        # at zero attitude; see config.compat_swing_frame_bug): replicable
        # via the compat flag, corrected by default. The stance branch
        # below is the reference's own (correct) mapping.
        if mpc.compat_swing_frame_bug:
            vf_w = R.T @ (jf @ qd5)
        else:
            vf_w = R @ (jf @ qd5)
        f_swing = swing_leg_force(
            x_fb, t, pf3, vf_w, mpc, side, gait, terrain, v_int
        )
        if not mpc.compat_swing_frame_bug:
            f_swing = R.T @ f_swing
        u_w = -jnp.concatenate([R.T @ f3, R.T @ m3])
        tau_stance = jm.T @ u_w
        # Stance-pivot heading drive (config.kp_pivot): rotate the body
        # about the PLANTED foot with the stance hip-yaw motor. Foot yaw =
        # body yaw + q0, so driving the body toward the commanded heading
        # is a direct torque on q0 with no state: -kp*dyaw (advancing body
        # yaw decreases q0) and rate damping toward the commanded turn
        # rate (target qd0 = -wz). Routing turning through the QP's m_z
        # alone backdrives this joint to its limit instead (measured).
        tau_pivot = (
            -mpc.kp_pivot * jnp.clip(dyaw, -0.3, 0.3)
            - mpc.kd_pivot * (qd5[0] + mpc.x_cmd[8])
        )
        tau_stance = tau_stance.at[0].add(tau_pivot)
        tau_swing = jf.T @ f_swing
        # Swing foot-heading regulation. The 3-dof Cartesian swing task
        # leaves foot YAW uncontrolled: it drifts under the task torque to
        # the hip-yaw joint limit within ~0.5 s of walking, and every
        # touchdown then fights the limit penalty — the dominant yaw
        # disturbance (turning slips, heading chaos). The reference has no
        # counterpart (its low-level never meets a real leg,
        # ``bipedalLocomotionMPC.py:444-470``); gains default to 0 for C13
        # parity and are enabled by art_mpc_config.
        # Foot-heading control as a FORCE-DOMAIN wrench: a world-z moment
        # on the swing foot, mapped through the angular Jacobian rows
        # (jm[3:6] = body-frame joint axes). Exact and projector-free —
        # J_wᵀ m applies precisely this wrench at the foot, so the
        # position task is undisturbed to first order. (Two rejected
        # designs, both measured: a raw hip-yaw joint PD disturbs the
        # swing task and destabilizes walking; a null-space-projected PD
        # cannot win — hip yaw is barely representable in the 2-dim task
        # null space, and the MuJoCo plant still wound up to the joint
        # limit and fell.) Foot world yaw = body yaw + q_hipyaw, so the
        # error is the clipped heading error minus the hip-yaw angle.
        m_yaw = mpc.kp_hipyaw * (q_yaw_des - q5[0]) - mpc.kd_hipyaw * qd5[0]
        tau_yaw = jm[3:6].T @ (R.T[:, 2] * m_yaw)
        # belt-and-braces: posture torque is a gentle secondary task — clamp
        # it well below the stance/swing task scale (|tau_swing| ~ 10 Nm)
        tau_yaw = jnp.clip(tau_yaw, -mpc.tau_yaw_clip, mpc.tau_yaw_clip)
        tau_swing = tau_swing.at[0].add(tau_fly)
        return tau_stance * c + (tau_swing + tau_yaw) * (1.0 - c)

    tau = jax.vmap(one_leg)(
        q.reshape(2, 5),
        qd.reshape(2, 5),
        sides,
        pf_w.reshape(2, 3),
        u0[0:6].reshape(2, 3),
        u0[6:12].reshape(2, 3),
        c0,
    )
    return tau.reshape(10)
