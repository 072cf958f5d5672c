"""Swing-leg cartesian PD control (L5/C12).

Parity: reference ``swingLegControl`` (``bipedalLocomotionMPC.py:426-442``):
Raibert foot target at half-horizon lookahead with a lateral ``0.04·side``
offset, sinusoidal swing height over the half-gait-cycle phase, and an
isotropic cartesian PD force. Pure jnp, batchable over legs and envs.
"""

from __future__ import annotations

import jax.numpy as jnp

from biped_mpc_py_tpu.config import GaitConfig, MpcConfig
from biped_mpc_py_tpu.control.gait import phase_time, swing_clock
from biped_mpc_py_tpu.control.reference import _raibert_xy

Y_OFFSET = 0.04  # lateral swing-target offset [m] (reference ``:427``)


def swing_target_xy(
    x_fb: jnp.ndarray, mpc: MpcConfig, side, gait: GaitConfig | None = None,
    v_int: jnp.ndarray | None = None,
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
    fx, fy = _raibert_xy(x_fb, mpc, t_p, v_int)
    if mpc.compat_swing_yaw_bug:
        return fx, fy + Y_OFFSET * side
    yaw = x_fb[2] + mpc.x_cmd[8] * 0.5 * t_p  # heading at mid-touchdown
    return (
        fx - jnp.sin(yaw) * mpc.swing_y_offset * side,
        fy + jnp.cos(yaw) * mpc.swing_y_offset * side,
    )


def swing_phase_z(t, mpc: MpcConfig, gait: GaitConfig | None, dtype, side=None):
    """Swing-apex height profile at time t within the current phase.

    Reference ``:436-437``: ``swingHeight * sin(pi t/T)`` with the
    hard-coded half-gait-cycle period ``dt*h/2`` generalized to
    ``steps_per_phase*dt`` (identical at the default cadence).

    ``mpc.swing_z_sin2=True`` uses ``sin^2(pi t/T)`` instead: same apex,
    but ZERO vertical velocity at liftoff and touchdown (the reference
    sine hits the ground at ``swingHeight*pi/T`` ~ 0.6 m/s — under
    MuJoCo's stick friction that impact couples into a tangential drag
    impulse, the named suspect for the chaotic-marginal walking branch,
    docs/DESIGN_NOTES.md).

    Running gaits (``gait.flight_steps > 0``) use the per-leg clock
    (gait.py::swing_clock) over the longer p+2f-step swing — pass
    ``side`` (+1 left / -1 right) there; the walking path below is the
    round-3 computation verbatim (bit-identical goldens).
    """
    if gait is not None and gait.flight_steps > 0:
        assert side is not None, "running gait needs the per-leg clock"
        frac, _ = swing_clock(t, mpc, gait, side, dtype)
        # complete the descent at swing_land_frac of the window (< 1 =
        # early touchdown, covering the PD's ~kd·v/kp tracking lag — see
        # MpcConfig.swing_land_frac)
        frac = jnp.clip(frac / mpc.swing_land_frac, 0.0, 1.0)
        s = jnp.sin(jnp.pi * frac)
        if mpc.swing_z_sin2:
            return mpc.swing_height * s * s
        return mpc.swing_height * s
    t_p = phase_time(mpc, gait)
    t_phase = jnp.remainder(jnp.asarray(t, dtype), t_p)
    s = jnp.sin(jnp.pi * t_phase / t_p)
    if mpc.swing_z_sin2:
        return mpc.swing_height * s * s
    return mpc.swing_height * s


def swing_phase_z_vel(t, mpc: MpcConfig, gait: GaitConfig | None, dtype,
                      side=None):
    """Time derivative of :func:`swing_phase_z` [m/s] (closed form).

    Consumed by the swing tracking feedforward (MpcConfig.swing_track_ff):
    the damping set-point becomes the profile's own descent/ascent rate
    instead of zero. Matches each branch of swing_phase_z exactly:
    walking ``d/dt H sin(pi u/T) = H pi/T cos(...)`` (sin²:
    ``H pi/T sin(2 pi u/T)``); running compresses the argument by
    swing_land_frac and holds 0 after the descent completes.
    """
    if gait is not None and gait.flight_steps > 0:
        assert side is not None, "running gait needs the per-leg clock"
        frac, T_sw = swing_clock(t, mpc, gait, side, dtype)
        g = frac / mpc.swing_land_frac
        rate = jnp.pi / (T_sw * mpc.swing_land_frac)
        gc = jnp.clip(g, 0.0, 1.0)
        if mpc.swing_z_sin2:
            dz = mpc.swing_height * rate * jnp.sin(2.0 * jnp.pi * gc)
        else:
            dz = mpc.swing_height * rate * jnp.cos(jnp.pi * gc)
        return jnp.where(g < 1.0, dz, jnp.zeros_like(dz))
    t_p = phase_time(mpc, gait)
    u = jnp.remainder(jnp.asarray(t, dtype), t_p)
    rate = jnp.pi / t_p
    if mpc.swing_z_sin2:
        return mpc.swing_height * rate * jnp.sin(2.0 * rate * u)
    return mpc.swing_height * rate * jnp.cos(rate * u)


def swing_leg_force(
    x_fb: jnp.ndarray,
    t,
    pf_w: jnp.ndarray,
    vf_w: jnp.ndarray,
    mpc: MpcConfig,
    side,
    gait: GaitConfig | None = None,
    terrain=None,
    v_int: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """PD force (3,) driving the swing foot to its Raibert target.

    ``mpc.swing_td_damp > 0`` adds horizontal damping that ramps in
    quadratically over the LAST 40% of the swing phase (touchdown
    retraction): the foot's tangential velocity is braked before impact,
    so the stick-friction drag impulse at touchdown — which scales with
    that velocity — is suppressed. 0 (default) = the reference's plain PD.
    """
    fx, fy = swing_target_xy(x_fb, mpc, side, gait, v_int)
    fz = swing_phase_z(t, mpc, gait, x_fb.dtype, side=side)
    if terrain is not None:
        # swing apex rides the LOCAL terrain surface under the target
        # (terrain-adaptive references, round 3)
        fz = fz + terrain.height(fx, fy)
    foot_des = jnp.stack([fx, fy, fz])
    if gait is not None and gait.flight_steps > 0:
        frac, _ = swing_clock(t, mpc, gait, side, x_fb.dtype)
    else:
        t_p = phase_time(mpc, gait)
        frac = jnp.remainder(jnp.asarray(t, x_fb.dtype), t_p) / t_p
    ramp = jnp.square(jnp.clip((frac - 0.6) / 0.4, 0.0, 1.0))
    # late-swing target retraction (MpcConfig.swing_retract): ramp the xy
    # target backward along the heading — the foot touches down moving
    # backward (smaller drag impulse) and a LATE touchdown lands closer to
    # the CoM (smaller braking lever). 0 = reference behavior.
    yaw = x_fb[2]
    foot_des = foot_des - (mpc.swing_retract * ramp) * jnp.stack(
        [jnp.cos(yaw), jnp.sin(yaw), jnp.zeros_like(yaw)]
    )
    # tracking velocity feedforward (MpcConfig.swing_track_ff): the Raibert
    # xy target rides the body (v_des_xy = v_com) and the z profile's rate
    # is closed-form; ff=0 reduces to the reference's absolute-velocity
    # damping kd·(0 − v_f) bit-for-bit.
    dfz = swing_phase_z_vel(t, mpc, gait, x_fb.dtype, side=side)
    v_des = mpc.swing_track_ff * jnp.stack([x_fb[9], x_fb[10], dfz])
    f = mpc.kp_swing * (foot_des - pf_w) + mpc.kd_swing * (v_des - vf_w)
    damp = mpc.swing_td_damp * ramp
    # touchdown overdrive (MpcConfig.swing_td_overdrive): pull the late-
    # swing z-target below the point-sampled ground so contact engages
    # at the scheduled time even where the true ground under the
    # realized landing xy is lower (the 4 cm missed-touchdown cascade,
    # DESIGN_NOTES "MuJoCo 4 cm terrain gap")
    f = f.at[2].add(-mpc.kp_swing * mpc.swing_td_overdrive * ramp)
    return f - damp * jnp.concatenate([vf_w[:2], jnp.zeros(1, x_fb.dtype)])
