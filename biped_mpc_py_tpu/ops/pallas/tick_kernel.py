"""Fused articulated TICK kernel: low-level control IN-KERNEL (round 5).

After the fused substep kernel (ops/pallas/substep_kernel.py) moved the
physics chain into one launch per low-level period, the 1024-env tick
profile is ~15.5 ms: the 8-per-tick low-level control chain (FK feedback
+ swing PD + Jacobian-transpose torque mapping, each ~8 leg-vmapped XLA
launches) and the ADMM solve dominate what remains — still pure launch
latency (MFU < 0.2%, docs/DESIGN_NOTES.md round 5). This kernel fuses
the WHOLE 40 ms low-level+physics hierarchy into ONE ``pallas_call``:

    for each of n_lowlevel (8) periods:        # Python-unrolled
        x_fb, soles = in-kernel whole-body FK feedback
        tau        = in-kernel low-level control (swing PD + Jᵀ mapping)
        5x physics substep                      # lax.fori_loop, VMEM

so a tick costs one kernel launch for everything below the MPC layer.

TPU-first design notes (same SoA discipline as the substep kernel —
every physical scalar is one (8, 128) f32 tile of 1024 envs; 3-vectors
are Python tuples of tiles; ALL math is elementwise VPU ops):

- **The remote Mosaic compiler rejects ``atan2`` at lowering**
  (tools/probe_mosaic_ops.py), and the feedback path needs Euler angles
  from the quaternion (roll/yaw = atan2, pitch = asin). The kernel
  carries its own branch-free Cephes-style polynomial atan
  (two ``jnp.where`` range reductions + degree-4 poly in z = x², ~1 ulp
  f32) and builds atan2/asin from it.
- ``jnp.remainder`` is avoided defensively: the swing-phase clock uses
  ``t - T * floor(t / T)``.
- The controller-chain leg Jacobians (models/kinematics.leg_jacobians —
  ``jax.jacfwd`` of the closed-form FK on the XLA path) are re-derived
  here in closed form: the chain is Rz(q0)(hip + Rx(q1)(abd + pitch
  chain)), so each column is a short trig expression; parity with
  jacfwd is pinned by tests/test_tick_kernel.py.
- Config gains, gait cadence, leg geometry, and the articulated model
  fold into the instruction stream at trace time (factory-time
  ``float()`` extraction) — this path requires an env-constant MPC
  config/biped/model like the substep kernel; randomized populations
  keep the XLA path.

Scope (the bench operating point): walking gaits (flight_steps == 0),
flat ground, Minv held across the tick (minv_ll_hold == n_lowlevel).

Parity: reference low-level semantics are ``bipedalLocomotionMPC.py:
426-470`` (swing PD + Jmᵀ wrench mapping), already re-built in
control/lowlevel.py + control/swing.py; this kernel replicates THAT
path (the corrected-frame default) at f32 roundoff
(tests/test_tick_kernel.py). No reference counterpart for the fusion
itself: the reference has no simulator or real-time loop (README.md:6-7
TODOs).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from biped_mpc_py_tpu.ops.pallas.substep_kernel import (
    _AXIS_NAMES,
    _LANES,
    _ROWS,
    _axis_rot,
    _m3_T,
    _m3_m,
    _m3_v,
    _model_consts,
    _quat_to_rotm,
    _substep,
    _v_add,
    _v_cross,
    _v_scale,
    _xform_motion,
    BLOCK_ENVS,
)

# ---------------------------------------------------------------------------
# branch-free atan / atan2 / asin (Mosaic lacks the primitives)
# ---------------------------------------------------------------------------

_TAN_3PI_8 = 2.414213562373095  # tan(3*pi/8)
_TAN_PI_8 = 0.4142135623730951  # tan(pi/8)


def _atan(x):
    """Cephes-style f32 arctangent, elementwise, branch-free (~1 ulp)."""
    ax = jnp.abs(x)
    big = ax > _TAN_3PI_8
    mid = ax > _TAN_PI_8
    # range-reduce |x| to [0, tan(pi/8)]: big -> -1/x (+pi/2),
    # mid -> (x-1)/(x+1) (+pi/4)
    xr = jnp.where(
        big,
        -1.0 / jnp.maximum(ax, 1e-30),
        jnp.where(mid, (ax - 1.0) / (ax + 1.0), ax),
    )
    bias = jnp.where(
        big, math.pi / 2, jnp.where(mid, math.pi / 4, 0.0)
    )
    z = xr * xr
    y = (
        ((8.05374449538e-2 * z - 1.38776856032e-1) * z + 1.99777106478e-1)
        * z
        - 3.33329491539e-1
    ) * z * xr + xr
    y = y + bias
    return jnp.where(x < 0, -y, y)


def _atan2(y, x):
    """Four-quadrant arctangent from :func:`_atan` (numpy convention up
    to the y == 0, x < 0 edge, which returns +pi)."""
    safe_x = jnp.where(
        jnp.abs(x) < 1e-30, jnp.where(x < 0, -1e-30, 1e-30), x
    )
    base = _atan(y / safe_x)
    sgn_y = jnp.where(y < 0, -1.0, 1.0)
    return jnp.where(x < 0, base + math.pi * sgn_y, base)


def _asin(x):
    """arcsin on [-1, 1] via atan2(x, sqrt(1 - x²))."""
    xc = jnp.clip(x, -1.0, 1.0)
    return _atan2(xc, jnp.sqrt(jnp.maximum(1.0 - xc * xc, 0.0)))


# ---------------------------------------------------------------------------
# whole-body feedback (sim-chain FK): x_fb (12 tiles) + soles (2x3 tiles)
# ---------------------------------------------------------------------------


def _leg_chain_states(pos, R0, v_base, q, qd, C):
    """Per-leg lists of (R_w, p_w, v_local) down the 5-joint sim chain —
    the SoA mirror of sim/dynamics.leg_kinematics_lv."""
    legs = []
    for leg in range(2):
        R_prev, p_prev, v_prev = R0, pos, v_base
        Rws, pws, vls = [], [], []
        for l in range(5):
            j = 5 * leg + l
            off = tuple(float(x) for x in C["joint_offset"][j])
            cj, sj = jnp.cos(q[j]), jnp.sin(q[j])
            Rpc = _axis_rot(_AXIS_NAMES[j], cj, sj)
            Rt = _m3_T(Rpc)
            p_w = _v_add(p_prev, _m3_v(R_prev, off))
            R_w = _m3_m(R_prev, Rpc)
            v_l = _xform_motion(Rt, off, v_prev)
            ai = "xyz".index(_AXIS_NAMES[j])
            w = list(v_l[0])
            w[ai] = w[ai] + qd[j]
            v_l = (tuple(w), v_l[1])
            Rws.append(R_w)
            pws.append(p_w)
            vls.append(v_l)
            R_prev, p_prev, v_prev = R_w, p_w, v_l
        legs.append((Rws, pws, vls))
    return legs


def _feedback(carry, C, M):
    """(x_fb 12-tuple, soles [leg][xyz], R0) — the SoA mirror of
    sim/engine.feedback_and_soles (hybrid CoM-xy / torso-z feedback)."""
    pos, quat, vb_w, vb_l, q, qd = carry
    R0 = _quat_to_rotm(quat)
    legs = _leg_chain_states(pos, R0, (vb_w, vb_l), q, qd, C)
    mass, com = M["mass"], M["com"]
    inv_m = 1.0 / float(mass.sum())

    c0v = tuple(float(x) for x in com[0])
    p_acc = _v_scale(_v_add(pos, _m3_v(R0, c0v)), float(mass[0]))
    v0_ci = _v_add(vb_l, _v_cross(vb_w, c0v))
    v_acc = _v_scale(_m3_v(R0, v0_ci), float(mass[0]))
    for leg in range(2):
        Rws, pws, vls = legs[leg]
        for l in range(5):
            i = 1 + 5 * leg + l
            ci = tuple(float(x) for x in com[i])
            m = float(mass[i])
            p_acc = _v_add(
                p_acc, _v_scale(_v_add(pws[l], _m3_v(Rws[l], ci)), m)
            )
            v_ci = _v_add(vls[l][1], _v_cross(vls[l][0], ci))
            v_acc = _v_add(v_acc, _v_scale(_m3_v(Rws[l], v_ci), m))
    p_com = _v_scale(p_acc, inv_m)
    v_com = _v_scale(v_acc, inv_m)

    roll = _atan2(R0[2][1], R0[2][2])
    pitch = -_asin(R0[2][0])
    yaw = _atan2(R0[1][0], R0[0][0])
    w_w = _m3_v(R0, vb_w)
    v_tw = _m3_v(R0, vb_l)
    x_fb = (
        roll, pitch, yaw,
        p_com[0], p_com[1], pos[2],
        w_w[0], w_w[1], w_w[2],
        v_com[0], v_com[1], v_tw[2],
    )
    tip = M["tip_z"]
    soles = []
    for leg in range(2):
        Rf, pf = legs[leg][0][4], legs[leg][1][4]
        soles.append(
            (
                pf[0] + Rf[0][2] * tip,
                pf[1] + Rf[1][2] * tip,
                pf[2] + Rf[2][2] * tip,
            )
        )
    return x_fb, soles, R0


# ---------------------------------------------------------------------------
# controller-chain leg Jacobians, closed form
# ---------------------------------------------------------------------------


def _leg_jac_cols(q5, side: float, G):
    """(jf_cols, axis_cols): 5 position-Jacobian columns and 5 joint-axis
    columns (each a 3-tuple of tiles) of the CONTROLLER chain
    (models/kinematics.leg_jacobians, geometry ``G`` = jac_geometry
    floats). Closed-form d/dq of leg_fk_body:

        p(q) = Rz(q0) @ (hip + Rx(q1) @ (abd + pc(q2..q4)))
        pc   = (-Σ lᵢ sin θᵢ, 0, -Σ lᵢ cos θᵢ),  θ cumulative pitch.
    """
    q0, q1 = q5[0], q5[1]
    c0, s0 = jnp.cos(q0), jnp.sin(q0)
    c1, s1 = jnp.cos(q1), jnp.sin(q1)
    th0 = q5[2]
    th1 = th0 + q5[3]
    th2 = th1 + q5[4]
    L = (G["l_thigh"], G["l_shank"], G["l_foot"])
    sins = (jnp.sin(th0), jnp.sin(th1), jnp.sin(th2))
    coss = (jnp.cos(th0), jnp.cos(th1), jnp.cos(th2))
    s_sum = L[0] * sins[0] + L[1] * sins[1] + L[2] * sins[2]
    c_sum = L[0] * coss[0] + L[1] * coss[1] + L[2] * coss[2]

    abd_y = G["abd_y"] * side + G["abd_y_const"]  # Python float
    # u = abd + pc (u1 is a folded float)
    u0v, u1v, u2v = -s_sum, abd_y, -c_sum
    # v = Rx(q1) @ u
    v0v = u0v
    v1v = c1 * u1v - s1 * u2v
    v2v = s1 * u1v + c1 * u2v
    w0 = G["hip_x"] + v0v
    w1 = G["hip_y"] * side + v1v
    w2 = G["hip_z"] + v2v

    def rz(a):
        return (c0 * a[0] - s0 * a[1], s0 * a[0] + c0 * a[1], a[2])

    zero = jnp.zeros_like(s_sum)
    # column 0: dRz/dq0 @ w
    d0 = (-s0 * w0 - c0 * w1, c0 * w0 - s0 * w1, zero)
    # column 1: Rz @ (dRx/dq1 @ u)
    du = (zero, -s1 * u1v - c1 * u2v, c1 * u1v - s1 * u2v)
    d1 = rz(du)
    # columns 2..4: Rz @ Rx @ dpc/dqj, dpc = (-Σᵢ≥ⱼ lᵢcosθᵢ, 0, +Σᵢ≥ⱼ lᵢsinθᵢ)
    cols = [d0, d1]
    for j in range(3):
        ds = sum(L[i] * coss[i] for i in range(j, 3))
        dz = sum(L[i] * sins[i] for i in range(j, 3))
        dpc = (-ds, zero, dz)
        dv = (dpc[0], c1 * dpc[1] - s1 * dpc[2], s1 * dpc[1] + c1 * dpc[2])
        cols.append(rz(dv))
    one = jnp.ones_like(s_sum)
    a0 = (zero, zero, one)
    a1 = (c0, s0, zero)
    ap = (-s0 * c1, c0 * c1, s1)
    return tuple(cols), (a0, a1, ap, ap, ap)


# ---------------------------------------------------------------------------
# in-kernel low-level control (SoA mirror of control/lowlevel.py +
# control/swing.py, walking path)
# ---------------------------------------------------------------------------


def _dot3(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _control_tau(carry, u0, c0, t_ll, cmd_yaw, v_int, C, M, K):
    """Joint torques (10 tiles) for one low-level period.

    Mirrors control/lowlevel.low_level_control with terrain=None and the
    corrected (default) swing frames; reference semantics
    ``bipedalLocomotionMPC.py:444-470``."""
    pos, quat, vb_w, vb_l, q, qd = carry
    x, soles, R0 = _feedback(carry, C, M)
    Rt = _m3_T(R0)
    yaw = x[2]

    yaw_des = cmd_yaw if K["cmd_body_frame"] else K["xc2"]
    dy_raw = yaw_des - yaw
    dyaw = _atan2(jnp.sin(dy_raw), jnp.cos(dy_raw))
    dyaw_tgt = dyaw - K["hipyaw_rate_lead"] * (x[8] - K["xc8"])
    q_yaw_des = jnp.clip(
        dyaw_tgt, -K["hipyaw_target_clip"], K["hipyaw_target_clip"]
    )
    flight = (1.0 - c0[0]) * (1.0 - c0[1])
    tau_fly = flight * jnp.clip(
        K["flight_yaw_kd"] * (x[8] - K["xc8"]),
        -K["tau_yaw_clip"], K["tau_yaw_clip"],
    )

    # --- swing clock (walking: shared clock, floor-based mod) ---
    t_p = K["t_p"]
    u_mod = t_ll - t_p * jnp.floor(t_ll / t_p)
    frac = u_mod / t_p
    s_ph = jnp.sin(math.pi * frac)
    if K["sin2"]:
        fz = K["H"] * s_ph * s_ph
        dfz = K["H"] * (math.pi / t_p) * jnp.sin(2.0 * math.pi * frac)
    else:
        fz = K["H"] * s_ph
        dfz = K["H"] * (math.pi / t_p) * jnp.cos(math.pi * frac)
    ramp = jnp.square(jnp.clip((frac - 0.6) / 0.4, 0.0, 1.0))

    # --- Raibert target (control/reference._raibert_xy) ---
    if K["cmd_body_frame"]:
        cy, sy = jnp.cos(yaw), jnp.sin(yaw)
        vcx = cy * K["xc9"] - sy * K["xc10"]
        vcy = sy * K["xc9"] + cy * K["xc10"]
        kv_x = kv_y = 0.0
    else:
        vcx, vcy = K["xc9"], K["xc10"]
        kv_x = K["kv"] * (x[3] - K["xc3"])
        kv_y = K["kv"] * (x[4] - K["xc4"])
    v_err = jnp.sqrt((x[9] - vcx) ** 2 + (x[10] - vcy) ** 2)
    gain = jnp.minimum(
        K["raibert_capture_gain"] + K["capture_sched"] * v_err, 1.0
    )
    kc = gain * math.sqrt(max(K["xc5"], 0.0) / 9.81)
    vx_m = x[9] + K["raibert_am_y"] * x[7]
    vy_m = x[10] - K["raibert_am_x"] * x[6]
    pp = K["raibert_pitch_place"] * (x[1] - K["raibert_pitch_nom"])
    ff = 0.5 * t_p * K["raibert_ff_scale"]
    fx = x[3] + vx_m * ff + kc * (vx_m - vcx) + kv_x + pp
    fy = x[4] + vy_m * ff + kc * (vy_m - vcy) + kv_y
    fx = fx - K["raibert_vint"] * v_int[0]
    fy = fy - K["raibert_vint"] * v_int[1]

    yaw_td = yaw + K["xc8"] * 0.5 * t_p
    sin_td, cos_td = jnp.sin(yaw_td), jnp.cos(yaw_td)
    cyw, syw = jnp.cos(yaw), jnp.sin(yaw)
    retract = K["swing_retract"] * ramp
    damp = K["swing_td_damp"] * ramp
    over = K["kp"] * K["swing_td_overdrive"] * ramp
    v_des = (
        K["tff"] * x[9], K["tff"] * x[10], K["tff"] * dfz,
    )

    taus = []
    for leg in range(2):
        side = 1.0 if leg == 0 else -1.0
        q5 = tuple(q[5 * leg + i] for i in range(5))
        qd5 = tuple(qd[5 * leg + i] for i in range(5))
        sole = soles[leg]
        f3 = tuple(u0[3 * leg + i] for i in range(3))
        m3 = tuple(u0[6 + 3 * leg + i] for i in range(3))
        c = c0[leg]

        jf_cols, ax_cols = _leg_jac_cols(q5, side, K["geom"])
        jfqd = tuple(
            sum(jf_cols[j][i] * qd5[j] for j in range(5)) for i in range(3)
        )
        if K["compat_swing_frame_bug"]:
            vf_w = _m3_v(Rt, jfqd)
        else:
            vf_w = _m3_v(R0, jfqd)

        if K["compat_swing_yaw_bug"]:
            tx = fx
            ty = fy + 0.04 * side  # reference Y_OFFSET (:427)
        else:
            tx = fx - sin_td * K["swing_y_offset"] * side
            ty = fy + cos_td * K["swing_y_offset"] * side
        foot_des = (tx - retract * cyw, ty - retract * syw, fz)
        f_sw = tuple(
            K["kp"] * (foot_des[i] - sole[i]) + K["kd"] * (v_des[i] - vf_w[i])
            for i in range(3)
        )
        f_sw = (
            f_sw[0] - damp * vf_w[0],
            f_sw[1] - damp * vf_w[1],
            f_sw[2] - over,
        )
        if not K["compat_swing_frame_bug"]:
            f_sw = _m3_v(Rt, f_sw)

        u_f = _v_scale(_m3_v(Rt, f3), -1.0)
        u_m = _v_scale(_m3_v(Rt, m3), -1.0)
        tau_pivot = (
            -K["kp_pivot"] * jnp.clip(dyaw, -0.3, 0.3)
            - K["kd_pivot"] * (qd5[0] + K["xc8"])
        )
        m_yaw = K["kp_hipyaw"] * (q_yaw_des - q5[0]) - K["kd_hipyaw"] * qd5[0]
        vec_z = (R0[2][0] * m_yaw, R0[2][1] * m_yaw, R0[2][2] * m_yaw)

        tau_leg = []
        for j in range(5):
            t_st = _dot3(jf_cols[j], u_f) + _dot3(ax_cols[j], u_m)
            if j == 0:
                t_st = t_st + tau_pivot
            t_sw = _dot3(jf_cols[j], f_sw)
            if j == 0:
                t_sw = t_sw + tau_fly
            t_yaw = jnp.clip(
                _dot3(ax_cols[j], vec_z),
                -K["tau_yaw_clip"], K["tau_yaw_clip"],
            )
            tau_leg.append(t_st * c + (t_sw + t_yaw) * (1.0 - c))
        taus.extend(tau_leg)
    return tuple(taus)


# ---------------------------------------------------------------------------
# constants folding (factory time; everything must be CONCRETE)
# ---------------------------------------------------------------------------


def _tick_consts(model):
    M = dict(
        mass=np.asarray(model.mass, np.float64),
        com=np.asarray(model.com, np.float64),
        tip_z=float(np.asarray(model.contact_points)[0, 2]),
    )
    return M


def _control_consts(mpc, gait, biped):
    g = biped.jac_geometry
    xc = np.asarray(mpc.x_cmd, np.float64)
    p = gait.steps_per_phase if gait is not None else mpc.h // 2
    assert (gait is None or gait.flight_steps == 0), (
        "tick kernel: walking gaits only (flight_steps == 0); running "
        "keeps the substep-kernel path"
    )
    return dict(
        t_p=float(p * float(mpc.dt)),
        xc2=float(xc[2]), xc3=float(xc[3]), xc4=float(xc[4]),
        xc5=float(xc[5]), xc8=float(xc[8]), xc9=float(xc[9]),
        xc10=float(xc[10]),
        kv=float(mpc.kv),
        kp=float(mpc.kp_swing), kd=float(mpc.kd_swing),
        H=float(mpc.swing_height), sin2=bool(mpc.swing_z_sin2),
        tff=float(mpc.swing_track_ff),
        swing_td_damp=float(mpc.swing_td_damp),
        swing_td_overdrive=float(mpc.swing_td_overdrive),
        swing_retract=float(mpc.swing_retract),
        swing_y_offset=float(mpc.swing_y_offset),
        raibert_capture_gain=float(mpc.raibert_capture_gain),
        capture_sched=float(mpc.capture_sched),
        raibert_am_y=float(mpc.raibert_am_y),
        raibert_am_x=float(mpc.raibert_am_x),
        raibert_pitch_place=float(mpc.raibert_pitch_place),
        raibert_pitch_nom=float(mpc.raibert_pitch_nom),
        raibert_ff_scale=float(mpc.raibert_ff_scale),
        raibert_vint=float(mpc.raibert_vint),
        kp_hipyaw=float(mpc.kp_hipyaw), kd_hipyaw=float(mpc.kd_hipyaw),
        hipyaw_target_clip=float(mpc.hipyaw_target_clip),
        hipyaw_rate_lead=float(mpc.hipyaw_rate_lead),
        tau_yaw_clip=float(mpc.tau_yaw_clip),
        flight_yaw_kd=float(mpc.flight_yaw_kd),
        kp_pivot=float(mpc.kp_pivot), kd_pivot=float(mpc.kd_pivot),
        cmd_body_frame=bool(mpc.cmd_body_frame),
        compat_swing_frame_bug=bool(mpc.compat_swing_frame_bug),
        compat_swing_yaw_bug=bool(mpc.compat_swing_yaw_bug),
        geom=dict(
            l_thigh=float(g.l_thigh), l_shank=float(g.l_shank),
            l_foot=float(g.l_foot), abd_y=float(g.abd_y),
            abd_y_const=float(g.abd_y_const), hip_x=float(g.hip_x),
            hip_y=float(g.hip_y), hip_z=float(g.hip_z),
        ),
    )


# ---------------------------------------------------------------------------
# kernel + factory
# ---------------------------------------------------------------------------

N_CTRL = 18  # u0 (12) + c0 (2) + t0 (1) + cmd_yaw (1) + v_int (2)


def _kernel(
    s_ref, ctrl_ref, minv_ref, out_ref, *, C, M, K, ll_dt, n_lowlevel,
    n_substeps,
):
    comps = [s_ref[i] for i in range(33)]
    carry = (
        tuple(comps[0:3]),
        tuple(comps[3:7]),
        tuple(comps[7:10]),
        tuple(comps[10:13]),
        tuple(comps[13:23]),
        tuple(comps[23:33]),
    )
    u0 = tuple(ctrl_ref[i] for i in range(12))
    c0 = (ctrl_ref[12], ctrl_ref[13])
    t0 = ctrl_ref[14]
    cmd_yaw = ctrl_ref[15]
    v_int = (ctrl_ref[16], ctrl_ref[17])
    minv_rows = tuple(
        tuple(minv_ref[i * 16 + j] for j in range(16)) for i in range(16)
    )
    energy = jnp.zeros_like(t0)
    sub_dt = ll_dt / n_substeps
    for p in range(n_lowlevel):
        t_ll = t0 + p * ll_dt
        tau = _control_tau(carry, u0, c0, t_ll, cmd_yaw, v_int, C, M, K)
        qd = carry[5]
        for j in range(10):
            energy = energy + jnp.maximum(tau[j] * qd[j], 0.0) * ll_dt

        def body(_, c, tau=tau):
            return _substep(c, tau, minv_rows, C, sub_dt)

        carry = jax.lax.fori_loop(0, n_substeps, body, carry)
    flat = (
        list(carry[0]) + list(carry[1]) + list(carry[2]) + list(carry[3])
        + list(carry[4]) + list(carry[5]) + [energy]
    )
    for i in range(34):
        out_ref[i] = flat[i]


def make_fused_tick(
    model, biped, mpc, gait, n_lowlevel: int = 8, n_substeps: int = 5,
):
    """Build the fused low-level+physics tick:
    ``(state, u0, c0_flags, t0, cmd_yaw, v_int, Minv) -> (state', energy)``.

    All of ``model`` / ``biped`` / ``mpc`` / ``gait`` must be CONCRETE
    (un-traced) here — gains and geometry fold into the kernel's
    instruction stream. The returned function is jit-safe.

    Args mirror parallel/rollout_art.py's kernel path: ``u0`` (N, 12)
    first MPC control held for the tick, ``c0_flags`` (N, 2) first-row
    contact flags, ``t0`` (N,) the gait-local time at tick start
    (sim.t, or the held gait clock), ``cmd_yaw`` (N,) the cmd_ref yaw
    anchor, ``v_int`` (N, 2), ``Minv`` (N, 16, 16) held all tick
    (minv_ll_hold == n_lowlevel semantics). Returns the advanced batched
    ArtState and the per-env positive mechanical work [J] of the tick.
    """
    from biped_mpc_py_tpu.sim.engine import ArtState

    C = _model_consts(model)
    M = _tick_consts(model)
    K = _control_consts(mpc, gait, biped)
    ll_dt = float(mpc.dt) / n_lowlevel

    def fn(state, u0, c0_flags, t0, cmd_yaw, v_int, Minv,
           interpret: bool | None = None):
        N = state.q.shape[0]
        assert N % BLOCK_ENVS == 0, N
        if interpret is None:
            interpret = jax.default_backend() == "cpu"
        rows = N // _LANES

        def pack(arrs):
            x = jnp.concatenate(arrs, axis=1)
            return x.T.reshape(x.shape[1], rows, _LANES)

        S = pack([state.pos, state.quat, state.v_base, state.q, state.qd])
        ctrl = pack([
            u0, c0_flags, t0[:, None], cmd_yaw[:, None], v_int,
        ])
        minv_t = Minv.reshape(N, 256).T.reshape(256, rows, _LANES)

        import functools

        kern = functools.partial(
            _kernel, C=C, M=M, K=K, ll_dt=ll_dt, n_lowlevel=n_lowlevel,
            n_substeps=n_substeps,
        )
        out = pl.pallas_call(
            kern,
            grid=(rows // _ROWS,),
            in_specs=[
                pl.BlockSpec((33, _ROWS, _LANES), lambda g: (0, g, 0)),
                pl.BlockSpec((N_CTRL, _ROWS, _LANES), lambda g: (0, g, 0)),
                pl.BlockSpec((256, _ROWS, _LANES), lambda g: (0, g, 0)),
            ],
            out_specs=pl.BlockSpec((34, _ROWS, _LANES), lambda g: (0, g, 0)),
            out_shape=jax.ShapeDtypeStruct((34, rows, _LANES), S.dtype),
            interpret=interpret,
        )(S, ctrl, minv_t)
        flat = out.reshape(34, N).T
        new_state = ArtState(
            pos=flat[:, 0:3],
            quat=flat[:, 3:7],
            v_base=flat[:, 7:13],
            q=flat[:, 13:23],
            qd=flat[:, 23:33],
            t=state.t + float(mpc.dt),
        )
        return new_state, flat[:, 33]

    return fn
