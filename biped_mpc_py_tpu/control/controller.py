"""The fused control tick (L6): state feedback -> joint torques.

The reference's "main script" (``bipedalLocomotionMPC.py:473-495``) runs FK ->
contact schedule -> solve_mpc -> lowLevelControl once, at the host level, with
prints between stages. Here the same pipeline is ONE pure function
(:func:`control_tick`) designed to be jitted (whole tick = one XLA program,
zero host round-trips), vmapped (thousands of envs), and scanned (rollouts).

The controller is stateless except for the explicit :class:`ControllerState`
pytree (ADMM warm start). Checkpoint/resume of a rollout is therefore just
serializing pytrees (SURVEY.md §5).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from biped_mpc_py_tpu.config import GaitConfig, MpcConfig
from biped_mpc_py_tpu.control.gait import (
    advance_gait_clock,
    contact_sequence,
)
from biped_mpc_py_tpu.control.lowlevel import low_level_control
from biped_mpc_py_tpu.control.mpc import solve_mpc
from biped_mpc_py_tpu.models.biped import BipedParams
from biped_mpc_py_tpu.models.kinematics import foot_positions_world
from biped_mpc_py_tpu.ops.qp import QpSolution, m_step


@struct.dataclass
class ControllerState:
    """Carried across ticks: the previous QP solution (ADMM warm start) and
    the body-frame command-reference anchor (see :func:`advance_cmd_ref`)."""

    qp: QpSolution
    # [x, y, yaw] world anchor the body-frame velocity command integrates
    # from. Consumed ONLY when mpc.cmd_body_frame=True (com_reference and
    # the foot-heading channel in lowlevel.py both gate on it); in
    # world-frame command mode it is still advanced but read by nothing.
    cmd_ref: jnp.ndarray
    # (2,) world-frame xy velocity-error integral [m/s] boosting the
    # velocity reference (see MpcConfig.cmd_v_int_gain; zeros when the
    # gain is 0 — the default/parity path).
    v_int: jnp.ndarray
    # Contact-sensed gait clock (GaitConfig.contact_clock): the
    # gait-local time USED last tick. Read/advanced ONLY when the flag
    # is on (control/gait.py::advance_gait_clock — loops with the flag
    # off run on wall-clock t and leave these untouched). Default 0.0
    # here; ``init`` seeds -mpc.dt so the first advanced value is 0.
    t_gait: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.zeros(())
    )
    # consecutive held ticks (bounds the touchdown wait at
    # GaitConfig.clock_max_hold)
    hold_count: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.zeros((), jnp.int32)
    )
    # leaky pitch reference (MpcConfig.pitch_ref_leak; read by
    # com_reference only when the leak is > 0 — zero-leak paths carry it
    # untouched and are bit-identical)
    pitch_ref: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.zeros(())
    )

    @classmethod
    def init(cls, mpc: MpcConfig, dtype=jnp.float32) -> "ControllerState":
        h = mpc.h
        zero = jnp.zeros
        return cls(
            qp=QpSolution(
                controls=zero((h, 12), dtype),
                states=zero((h, 13), dtype),
                z=zero((h, m_step(mpc)), dtype),
                y=zero((h, m_step(mpc)), dtype),
                res_prim=jnp.asarray(0.0, dtype),
                res_dual=jnp.asarray(0.0, dtype),
            ),
            cmd_ref=zero((3,), dtype),
            v_int=zero((2,), dtype),
            t_gait=jnp.asarray(-mpc.dt, dtype),
            hold_count=zero((), jnp.int32),
            pitch_ref=jnp.asarray(
                jnp.where(mpc.pitch_ref_leak > 0, mpc.x_cmd[1], 0.0), dtype
            ),
        )


# Leak rate of the command anchor toward the measured pose, per 25 Hz tick
# (time constant ~0.8 s): slow enough to filter the CoM's step-frequency
# swing (raw-feedback anchoring feeds that oscillation back into a fall —
# measured attitude RMS 0.028 -> 0.425 on the articulated in-place walk),
# fast enough to bound reference windup when the robot is blocked/shoved.
# A deadzone + fast-leak variant was measured WORSE (dragging a persistent
# 0.1 rad yaw error destabilizes the gait: rate 0.036 vs 0.071 rad/s, att
# RMS 2x) — the proportional leak trades a bounded steady-state rate
# deficit (~30% on yaw at the articulated stack's authority limit) for
# gait stability.
CMD_REF_LEAK = 0.05


def advance_cmd_ref(
    cmd_ref: jnp.ndarray, x_fb: jnp.ndarray, mpc: MpcConfig
) -> jnp.ndarray:
    """One-tick update of the body-frame command anchor: integrate the
    commanded arc, then leak toward the measured pose (yaw leak separately
    configurable — see MpcConfig.cmd_leak_yaw)."""
    yaw = cmd_ref[2]
    vbx, vby = mpc.x_cmd[9], mpc.x_cmd[10]
    step = jnp.stack(
        [
            (jnp.cos(yaw) * vbx - jnp.sin(yaw) * vby) * mpc.dt,
            (jnp.sin(yaw) * vbx + jnp.cos(yaw) * vby) * mpc.dt,
            mpc.x_cmd[8] * mpc.dt,
        ]
    )
    ref = cmd_ref + step
    actual = jnp.stack([x_fb[3], x_fb[4], x_fb[2]])
    leak = jnp.stack(
        [
            jnp.asarray(CMD_REF_LEAK, ref.dtype),
            jnp.asarray(CMD_REF_LEAK, ref.dtype),
            jnp.asarray(mpc.cmd_leak_yaw, ref.dtype),
        ]
    )
    return ref + leak * (actual - ref)


def advance_pitch_ref(
    pitch_ref: jnp.ndarray, x_fb: jnp.ndarray, mpc: MpcConfig
) -> jnp.ndarray:
    """One-tick update of the leaky pitch reference (see
    MpcConfig.pitch_ref_leak): leak toward the measured pitch. Identity
    when the leak is 0 (the parity path)."""
    return pitch_ref + mpc.pitch_ref_leak * (x_fb[1] - pitch_ref)


def advance_v_int(
    v_int: jnp.ndarray, x_fb: jnp.ndarray, mpc: MpcConfig
) -> jnp.ndarray:
    """One-tick update of the xy velocity-error integrator (see
    MpcConfig.cmd_v_int_gain). World-frame error; body-frame commands are
    rotated by the measured yaw first. Axes with a zero command hold
    integral 0 (position-hold mode already has stiffness there), and the
    clip at cmd_v_int_max bounds windup.

    Effective in WORLD-frame command mode only: com_reference's
    body-frame branch overwrites the velocity rows with the commanded
    arc (the leak anchor supplies the integral-like action there), so
    the boost could never reach the QP in that mode — the integrator is
    therefore held structurally at zero there (no stale state carried
    across a cmd_body_frame flag flip)."""
    if mpc.cmd_body_frame:
        return jnp.zeros_like(v_int)
    vcx, vcy = mpc.x_cmd[9], mpc.x_cmd[10]
    v_cmd = jnp.stack([vcx, vcy])
    err = v_cmd - x_fb[9:11]
    nxt = jnp.clip(
        v_int + mpc.cmd_v_int_gain * err,
        -mpc.cmd_v_int_max, mpc.cmd_v_int_max,
    )
    gate = mpc.x_cmd[9:11] != 0
    return jnp.where(gate, nxt, jnp.zeros_like(nxt))


def control_tick(
    x_fb: jnp.ndarray,
    q: jnp.ndarray,
    qd: jnp.ndarray,
    t,
    mpc: MpcConfig,
    gait: GaitConfig,
    biped: BipedParams,
    ctrl_state: ControllerState | None = None,
    contact_meas: jnp.ndarray | None = None,
):
    """One full control tick.

    Equivalent to the reference main script's stage chain (``:477-494``).

    Args:
      x_fb: (12,) state [roll,pitch,yaw, p, w, v].
      q, qd: (10,) joint positions / velocities.
      t: scalar time [s].
      ctrl_state: previous tick's state for warm starting (None = cold).
      contact_meas: optional (2,) measured per-foot ground-contact flags
        (control/gait.py::measured_contact). Required when
        ``gait.contact_clock`` is on: the schedule then runs on the
        state-carried gait-local clock (held for late touchdowns)
        instead of wall-clock ``t``.

    Returns:
      (tau (10,), new ControllerState, QpSolution).
    """
    pf_w = foot_positions_world(x_fb, q, biped)
    warm = None if ctrl_state is None else ctrl_state.qp
    cmd_ref = None if ctrl_state is None else ctrl_state.cmd_ref
    v_int = None if ctrl_state is None else ctrl_state.v_int
    if gait.contact_clock:
        if contact_meas is None:
            raise ValueError(
                "gait.contact_clock=True requires contact_meas"
            )
        if ctrl_state is None:
            raise ValueError(
                "gait.contact_clock=True requires ctrl_state "
                "(ControllerState.init carries the gait clock)"
            )
        t_g, hold = advance_gait_clock(
            ctrl_state.t_gait, ctrl_state.hold_count, contact_meas,
            mpc, gait,
        )
    else:
        t_g = t
        hold = (
            ctrl_state.hold_count if ctrl_state is not None
            else jnp.zeros((), jnp.int32)
        )
    contact = contact_sequence(t_g, mpc, gait)
    foot_yaw = (
        x_fb[2] + q[jnp.array([0, 5])] if mpc.foot_frame_wrench else None
    )
    p_ref = None if ctrl_state is None else ctrl_state.pitch_ref
    sol = solve_mpc(
        x_fb, t_g, pf_w, mpc, biped, contact, warm=warm, gait=gait,
        cmd_ref=cmd_ref, foot_yaw=foot_yaw, v_int=v_int, pitch_ref=p_ref,
    )
    tau = low_level_control(
        x_fb, t_g, pf_w, q, qd, mpc, biped, contact, sol.controls[0],
        gait=gait, cmd_ref=cmd_ref, v_int=v_int,
    )
    ref_next = advance_cmd_ref(
        cmd_ref if cmd_ref is not None else jnp.zeros(3, x_fb.dtype),
        x_fb, mpc,
    )
    vi_next = advance_v_int(
        v_int if v_int is not None else jnp.zeros(2, x_fb.dtype),
        x_fb, mpc,
    )
    pr_next = advance_pitch_ref(
        p_ref if p_ref is not None else jnp.zeros((), x_fb.dtype),
        x_fb, mpc,
    )
    state_next = ControllerState(
        qp=sol, cmd_ref=ref_next, v_int=vi_next,
        t_gait=jnp.asarray(t_g, x_fb.dtype), hold_count=hold,
        pitch_ref=pr_next,
    )
    return tau, state_next, sol
