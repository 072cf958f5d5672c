"""Reference-trajectory generation (L3/C4, C5).

CoM reference: the reference's per-element Python branch ``if x_cmd[i+6] != 0``
(``bipedalLocomotionMPC.py:61-70``) becomes an elementwise ``jnp.where`` over
the whole (13, h) block — one fused VPU op instead of a 54-iteration loop.

Foot reference: the reference's phase-dependent ``np.tile`` concatenation
(``:99-108``) becomes a per-column select on ``arange(h)`` — branch-free and
differentiable in everything but the (intentionally) discrete phase index.
"""

from __future__ import annotations

import jax.numpy as jnp

from biped_mpc_py_tpu.config import GaitConfig, MpcConfig
from biped_mpc_py_tpu.control.gait import phase_index, phase_time  # noqa: F401


def com_reference(
    x_fb: jnp.ndarray,
    mpc: MpcConfig,
    cmd_ref: jnp.ndarray | None = None,
    z_ground: jnp.ndarray | float = 0.0,
    v_int: jnp.ndarray | None = None,
    pitch_ref: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """CoM/state reference over the horizon -> (13, h).

    Behavior of reference ``get_reference_trajectory``
    (``bipedalLocomotionMPC.py:61-70``): for pose entries i<6, columns
    integrate the commanded velocity ``x_cmd[i+6]`` from the *measured* pose
    when that velocity is nonzero, else hold the commanded pose. Velocity
    entries hold ``x_cmd[6:12]``; the 13th (gravity) state is 1.

    Known reference defect (``:62-63``): the reference sets column 0 to the
    CURRENT feedback state and indexes the ramp by k, but decision state X_k
    in its own dynamics constraint (``:207-213``) is the state k+1 steps
    AHEAD — so the cost tells the optimizer to hold its current velocity,
    dragging every maneuver (measured: ~50% steady-state velocity-command
    tracking, total yaw-command stall). Corrected default: targets indexed
    by k+1 with no feedback column. ``mpc.compat_ref_col0_bug=True``
    replicates the reference bit-for-bit.

    ``mpc.cmd_body_frame=True`` (framework extension, no reference analog):
    x_cmd[9:11] is the velocity in the HEADING frame and x_cmd[8] the turn
    rate. The xy reference integrates the commanded circular arc in closed
    form, the yaw reference ramps at the turn rate, and the velocity
    reference rotates with the predicted heading — so walking turns have a
    consistent (position, velocity, yaw) target instead of the world-frame
    crab the reference commands imply.

    ``z_ground``: local ground height under the support feet [m]
    (terrain-adaptive height, round 3): the commanded CoM height
    ``x_cmd[5]`` is interpreted ABOVE the local ground, so on rough
    terrain the height target rides the surface instead of a fixed world
    plane (the fixed-plane reference was the measured binding factor on
    the rough-terrain envelope, docs/DESIGN_NOTES.md). 0 = reference
    behavior (flat world).

    ``cmd_ref`` (3,) = [x, y, yaw] anchor for the body-frame arc. Pass the
    ControllerState's leak-integrated command reference (see
    controller.advance_cmd_ref): anchoring at raw feedback instead (the
    ``None`` fallback) gives ZERO effective position/heading stiffness —
    the target follows the measurement — which chases the articulated
    robot's CoM swing oscillation into a fall (measured: attitude RMS
    0.028 -> 0.425 on the articulated in-place walk).
    """
    h = mpc.h
    if mpc.compat_ref_col0_bug:
        ks = jnp.arange(h, dtype=x_fb.dtype)  # (h,)
    else:
        ks = jnp.arange(1, h + 1, dtype=x_fb.dtype)
    v_cmd_raw = mpc.x_cmd[6:12]  # (6,)
    v_cmd = v_cmd_raw
    if v_int is not None:
        # integral boost of the xy velocity reference (see
        # MpcConfig.cmd_v_int_gain / controller.advance_v_int), scaled
        # by cmd_v_int_ref_scale (0 = accumulate for the Raibert
        # placement channel only, MpcConfig.raibert_vint); the
        # integrate-vs-hold gating below stays on the RAW command so a
        # zero-command axis keeps its position-hold stiffness
        v_cmd = v_cmd.at[3:5].add(v_int * mpc.cmd_v_int_ref_scale)
    pose_int = x_fb[:6, None] + v_cmd[:, None] * (ks[None, :] * mpc.dt)  # (6,h)
    # z_ground enters only the HELD z row: terrain-adaptive height assumes
    # a zero-vz height command. With v_cmd_raw[5] != 0 the z reference
    # integrates from absolute feedback (x_fb z is already terrain-
    # inclusive), where adding z_ground would double-count ground height.
    pose_cmd = mpc.x_cmd[:6].at[5].add(z_ground)
    if pitch_ref is not None:
        # leaky pitch reference (MpcConfig.pitch_ref_leak): target the
        # carried, measurement-leaked attitude instead of the fixed
        # command — branch-free so the leak can be a traced/batched leaf
        pose_cmd = pose_cmd.at[1].set(
            jnp.where(mpc.pitch_ref_leak > 0, pitch_ref, pose_cmd[1])
        )
    pose_hold = jnp.broadcast_to(pose_cmd[:, None], (6, h))
    pose = jnp.where(v_cmd_raw[:, None] != 0, pose_int, pose_hold)
    vel = jnp.broadcast_to(v_cmd[:, None], (6, h))
    if mpc.cmd_body_frame:
        dtk = ks * mpc.dt  # (h,)
        if cmd_ref is None:
            x0a, y0a, yaw0 = x_fb[3], x_fb[4], x_fb[2]
        else:
            x0a, y0a, yaw0 = cmd_ref[0], cmd_ref[1], cmd_ref[2]
        wz = mpc.x_cmd[8]
        vbx, vby = mpc.x_cmd[9], mpc.x_cmd[10]
        yaw_k = yaw0 + wz * dtk  # (h,)
        # closed-form arc integral of p_dot = Rz(yaw0 + wz s) @ v_body:
        #   ax = ∫cos = (sin(yaw_k) - sin(yaw0)) / wz, ay = ∫sin
        # with the wz -> 0 limit dtk*cos(yaw0) / dtk*sin(yaw0)
        small = jnp.abs(wz) < 1e-6
        w_safe = jnp.where(small, jnp.ones_like(wz), wz)
        ax = jnp.where(
            small, dtk * jnp.cos(yaw0), (jnp.sin(yaw_k) - jnp.sin(yaw0)) / w_safe
        )
        ay = jnp.where(
            small, dtk * jnp.sin(yaw0), (jnp.cos(yaw0) - jnp.cos(yaw_k)) / w_safe
        )
        px = x0a + ax * vbx - ay * vby
        py = y0a + ay * vbx + ax * vby
        vx = jnp.cos(yaw_k) * vbx - jnp.sin(yaw_k) * vby
        vy = jnp.sin(yaw_k) * vbx + jnp.cos(yaw_k) * vby
        pose = pose.at[2].set(yaw0 + wz * dtk).at[3].set(px).at[4].set(py)
        vel = vel.at[3].set(vx).at[4].set(vy)
    ones = jnp.ones((1, h), x_fb.dtype)
    x_ref = jnp.concatenate([pose, vel, ones], axis=0)
    if mpc.compat_ref_col0_bug:
        # column 0 = feedback state (reference ``:63``)
        x0 = jnp.concatenate([x_fb[:12], jnp.ones((1,), x_fb.dtype)])
        x_ref = x_ref.at[:, 0].set(x0)
    return x_ref


def _raibert_xy(x_fb: jnp.ndarray, mpc: MpcConfig, lookahead: float,
                v_int: jnp.ndarray | None = None):
    """Raibert-style foot target: p + v·T_eff + kv·(p - p_cmd), per axis.

    ``lookahead`` is the stance-time horizon T (reference uses h/2·dt and
    h·dt, ``bipedalLocomotionMPC.py:73-89``); the reference's velocity
    coefficient is T/2. With ``mpc.raibert_capture_gain > 0`` the
    coefficient becomes ``gain·sqrt(z_cmd/g)`` (capture point) instead —
    see config.py for the measured robustness difference.

    ``v_int``: optional (2,) xy velocity-error integral
    (controller.advance_v_int) — shifts the target by
    ``-mpc.raibert_vint * v_int`` (integral placement action; see the
    MpcConfig.raibert_vint docstring).
    """
    # reference's feedforward coefficient; ff_scale < 1 shifts the
    # landing behind the neutral point (see MpcConfig.raibert_ff_scale)
    ff = 0.5 * lookahead * mpc.raibert_ff_scale
    if mpc.cmd_body_frame:
        # heading-frame velocity command rotated into the world by the
        # CURRENT yaw; velocity mode has no world p_cmd, so the kv
        # station-keeping term is dropped (foot placement + Q damp drift)
        yaw = x_fb[2]
        vcx = jnp.cos(yaw) * mpc.x_cmd[9] - jnp.sin(yaw) * mpc.x_cmd[10]
        vcy = jnp.sin(yaw) * mpc.x_cmd[9] + jnp.cos(yaw) * mpc.x_cmd[10]
        kv_x = kv_y = 0.0
    else:
        vcx, vcy = mpc.x_cmd[9], mpc.x_cmd[10]
        kv_x = mpc.kv * (x_fb[3] - mpc.x_cmd[3])
        kv_y = mpc.kv * (x_fb[4] - mpc.x_cmd[4])
    # capture-point feedback on the velocity ERROR (raw-velocity capture
    # feedback brakes steady walking; error feedback leaves the neutral
    # point at the commanded speed). Gain 0 disables — computed branch-free
    # so MpcConfig can be a traced/batched argument (gain sweeps vmap over
    # whole configs, parallel/sweep.py).
    # clamp: a non-positive commanded height (e.g. zero-initialized x_cmd)
    # must not NaN-poison fx/fy through sqrt even when the gain is 0
    # shove-state capture scheduling (MpcConfig.capture_sched): boost the
    # capture coefficient with the xy velocity-error magnitude, capped at
    # the exact capture gain 1.0; 0 = the round-4 fixed gain bit-for-bit
    v_err = jnp.sqrt(
        (x_fb[9] - vcx) ** 2 + (x_fb[10] - vcy) ** 2
    )
    gain = jnp.minimum(
        mpc.raibert_capture_gain + mpc.capture_sched * v_err, 1.0
    )
    kc = gain * jnp.sqrt(
        jnp.maximum(mpc.x_cmd[5], 0.0) / 9.81
    )
    # ALIP-style momentum-equivalent velocity (MpcConfig.raibert_am_y/_am_x,
    # round 5): v_eff = L_contact/(m z) = v + (I/(m z)) * w — the pendulum
    # state that is continuous through touchdown impacts. Replaces v in
    # BOTH the feedforward and capture-error terms; 0 coefficients (the
    # default) reduce to the reference's velocity-only placement
    # bit-for-bit. Sign: +wy (pitch rate, nose-down positive under
    # R=Rz·Ry·Rx) adds forward momentum -> place further ahead; -wx
    # likewise for the lateral channel.
    vx_m = x_fb[9] + mpc.raibert_am_y * x_fb[7]
    vy_m = x_fb[10] - mpc.raibert_am_x * x_fb[6]
    # pitch-ANGLE placement feedback (MpcConfig.raibert_pitch_place):
    # pitch below its hop-natural value moves the foothold back (less
    # touchdown braking) — the running decay-spiral counter (round 5)
    pp = mpc.raibert_pitch_place * (x_fb[1] - mpc.raibert_pitch_nom)
    fx = x_fb[3] + vx_m * ff + kc * (vx_m - vcx) + kv_x + pp
    fy = x_fb[4] + vy_m * ff + kc * (vy_m - vcy) + kv_y
    if v_int is not None:
        # integral placement: persistent slowness (v_int > 0) moves the
        # foothold behind the neutral point -> propulsive stance
        fx = fx - mpc.raibert_vint * v_int[0]
        fy = fy - mpc.raibert_vint * v_int[1]
    return fx, fy


def foot_reference(
    x_fb: jnp.ndarray,
    t,
    foot: jnp.ndarray,
    mpc: MpcConfig,
    contact: jnp.ndarray,
    gait: GaitConfig | None = None,
    terrain=None,
    v_int: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Foot-position reference over the horizon -> (6, h).

    Parity: reference ``get_reference_foot_trajectory``
    (``bipedalLocomotionMPC.py:72-109``). Columns hold: the current feet for
    the remainder of this stance phase, the half-horizon Raibert target for
    the next phase, then the full-horizon target. Falls back to tiling the
    current feet when the first horizon step is not single-stance.

    Where the reference re-derives the phase position from modular time
    (``:99-101``, hard-coding the 5-step cadence), the selector here is the
    CUMULATIVE CONTACT-FLIP COUNT along the horizon window — identical for
    the reference gait, but correct for any cadence in GaitConfig.

    Known reference defect (``:87``): ``foot_des_y_2`` starts from
    ``x_fb[10]`` (lateral velocity) where the pattern implies ``x_fb[4]``
    (lateral position). Corrected by default; set
    ``mpc.compat_foot_ref_bug=True`` to replicate bit-for-bit.

    ``gait`` sets the Raibert lookaheads to one/two stance phases
    (``steps_per_phase*dt`` / twice that); ``None`` keeps the reference's
    hard-coded h/2·dt and h·dt (``:73-89``) — identical at the default
    cadence, correct for every other one.
    """
    h = mpc.h
    t_p = phase_time(mpc, gait)
    fx1, fy1 = _raibert_xy(x_fb, mpc, t_p, v_int)
    fx2, fy2 = _raibert_xy(x_fb, mpc, 2.0 * t_p, v_int)
    if mpc.compat_foot_ref_bug:
        # reference ``:87``: x_fb[10] in place of x_fb[4]
        fy2 = (
            x_fb[10]
            + x_fb[10] * 0.5 * mpc.h * mpc.dt
            + mpc.kv * (x_fb[4] - mpc.x_cmd[4])
        )
    # future foot targets land ON the terrain surface (round 3:
    # terrain-adaptive references; the reference hard-codes z=0, ``:84``)
    if terrain is None:
        z1 = z2 = jnp.zeros_like(fx1)
    else:
        z1 = terrain.height(fx1, fy1)
        z2 = terrain.height(fx2, fy2)
    foot_1 = jnp.stack([fx1, fy1, z1, fx1, fy1, z1])  # (6,)
    foot_2 = jnp.stack([fx2, fy2, z2, fx2, fy2, z2])

    # selector 0/1/2 = cumulative number of stance flips before column j
    flips = jnp.any(contact[1:] != contact[:-1], axis=1).astype(jnp.int32)
    sel = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(flips)])
    sel = jnp.minimum(sel, 2)
    stacked = jnp.stack([foot, foot_1, foot_2], axis=0)  # (3, 6)
    walking_ref = stacked[sel].T  # (6, h)
    tiled = jnp.broadcast_to(foot[:, None], (6, h))
    single_stance = jnp.sum(contact[0, :]) == 1
    return jnp.where(single_stance, walking_ref, tiled)
