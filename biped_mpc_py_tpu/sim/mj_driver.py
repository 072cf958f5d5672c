"""MuJoCo co-simulation driver: the framework controller closed-loop in
MuJoCo CPU on the exported MJCF.

The strongest available physics oracle for the articulated stack (the
reference names MuJoCo as its simulator TODO, ``README.md:7``; SURVEY.md §7
stage 8): the SAME 25 Hz MPC + 200 Hz low-level controller that drives the
JAX engine drives MuJoCo, and contact-force statistics / fall outcomes are
compared. Used by tests/test_mj_contact.py (fidelity oracle) and
tools/sweep_mj.py (robustness battery).

MuJoCo steps on the host; the controller stages are jitted once and called
per tick — this loop is for VALIDATION, not throughput (the batched TPU
path is parallel/rollout_art.py).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from biped_mpc_py_tpu.config import GaitConfig, MpcConfig
from biped_mpc_py_tpu.control.controller import (
    ControllerState,
    advance_cmd_ref,
    advance_pitch_ref,
    advance_v_int,
)
from biped_mpc_py_tpu.control.gait import (
    advance_gait_clock_host,
    contact_sequence,
)
from biped_mpc_py_tpu.control.lowlevel import low_level_control
from biped_mpc_py_tpu.control.mpc import solve_mpc
from biped_mpc_py_tpu.models.biped import BipedParams
from biped_mpc_py_tpu.ops.rotations import quat_to_rotm
from biped_mpc_py_tpu.sim.engine import ArtState, feedback_and_soles
from biped_mpc_py_tpu.sim.mjcf import (
    penalty_matched_solref,
    set_hfield_data,
    to_mjcf,
)
from biped_mpc_py_tpu.sim.model import ArticulatedModel, hector_model

MJ_DT = 5e-4
N_LL = 8  # low-level updates per MPC tick (200 Hz)
MJ_PER_LL = 10  # mujoco steps per low-level update (2 kHz)


def state_from_mj(d, t) -> ArtState:
    """MuJoCo qpos/qvel (free-joint linear velocity in world, angular in
    body) -> ArtState conventions."""
    quat = jnp.asarray(d.qpos[3:7], jnp.float32)
    R = quat_to_rotm(quat)
    v_lin_body = R.T @ jnp.asarray(d.qvel[0:3], jnp.float32)
    return ArtState(
        pos=jnp.asarray(d.qpos[0:3], jnp.float32),
        quat=quat,
        v_base=jnp.concatenate(
            [jnp.asarray(d.qvel[3:6], jnp.float32), v_lin_body]
        ),
        q=jnp.asarray(d.qpos[7:17], jnp.float32),
        qd=jnp.asarray(d.qvel[6:16], jnp.float32),
        t=jnp.asarray(t, jnp.float32),
    )


def mj_foot_forces(m, d) -> np.ndarray:
    """Per-foot normal force (2,) summed over active floor contacts."""
    import mujoco

    f = np.zeros(2)
    buf = np.zeros(6)
    floor_id = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_GEOM, "floor")
    for i in range(d.ncon):
        con = d.contact[i]
        if con.geom1 != floor_id and con.geom2 != floor_id:
            # foot-foot (leg-crossing) contact: not a floor reaction force,
            # must not pollute the stance-force fidelity statistics
            continue
        mujoco.mj_contactForce(m, d, i, buf)  # buf[0] = normal force
        g = con.geom2 if con.geom1 == floor_id else con.geom1
        name = mujoco.mj_id2name(m, mujoco.mjtObj.mjOBJ_GEOM, g)
        if name and name.startswith("l_foot"):
            f[0] += buf[0]
        elif name and name.startswith("r_foot"):
            f[1] += buf[0]
    return f


def run_mujoco_closed_loop(
    mpc: MpcConfig,
    gait: GaitConfig,
    n_ticks: int,
    model: ArticulatedModel | None = None,
    biped: BipedParams | None = None,
    dq0: np.ndarray | None = None,
    fall_z: float = 0.25,
    shove: tuple | None = None,
    terrain=None,
    gait_schedule: list | None = None,
    cmd_schedule: list | None = None,
):
    """Closed loop in MuJoCo under the framework controller.

    dq0: optional (10,) initial joint-angle perturbation (the robustness
    probe axis, matching parallel/sweep.py::perturbed_worlds).
    shove: optional ``(tick, dvx, dvy)`` — add a base-velocity impulse
    [m/s] at the START of the given MPC tick (BASELINE config 4's
    push-recovery probe, matching the engine tests' velocity shove).
    terrain: optional :class:`~biped_mpc_py_tpu.sim.contact.Terrain` —
    the MuJoCo floor becomes the SAME height field the controller's
    terrain-adaptive references read (BASELINE config 4 cross-sim).
    gait_schedule: optional ``[(start_tick, GaitConfig), ...]`` runtime
    gait switches (e.g. stand -> walk -> stand). ``gait_mode`` is
    consumed ONLY by the host-level ``contact_sequence``, so a mode
    switch needs no re-jit; switching ``steps_per_phase`` mid-run is NOT
    supported (it is baked into the jitted reference lookaheads).
    cmd_schedule: optional ``[(start_tick, x_cmd(12,)), ...]`` runtime
    command switches (the joystick channel): x_cmd rides the jitted
    control path as a dynamic argument, so swaps need no re-jit.

    Returns (per-tick per-foot forces (n,2), per-tick feedback states
    (n,12), fell).
    """
    import mujoco

    model = model or hector_model()
    biped = biped or BipedParams()
    # on height fields the sphere radius must exceed the penalty-matched
    # contact law's max penetration (see mjcf.to_mjcf sphere_r docs)
    sphere_r = 0.02 if terrain is not None else 0.005
    m = mujoco.MjModel.from_xml_string(
        to_mjcf(model, MJ_DT, contact=True,
                solref=penalty_matched_solref(model), terrain=terrain,
                sphere_r=sphere_r)
    )
    if terrain is not None:
        set_hfield_data(m, terrain)
    d = mujoco.MjData(m)
    s0 = ArtState.standing()
    d.qpos[0:3] = np.array(s0.pos)
    d.qpos[3:7] = np.array(s0.quat)
    d.qpos[7:17] = np.array(s0.q)
    if dq0 is not None:
        d.qpos[7:17] += np.asarray(dq0)

    fb = jax.jit(lambda s: feedback_and_soles(model, s))

    # x_cmd rides as a DYNAMIC argument so cmd_schedule swaps commands at
    # runtime without re-jitting (the joystick channel a real deployment
    # has; engine analog: parallel/sweep.py command segments)
    def _solve(x, t, pf, c, w, r, q, vi, pr, xc):
        mpc_t = dataclasses.replace(mpc, x_cmd=xc)
        fy = x[2] + q[jnp.array([0, 5])] if mpc.foot_frame_wrench else None
        return solve_mpc(
            x, t, pf, mpc_t, biped, c, warm=w, gait=gait, cmd_ref=r,
            foot_yaw=fy, v_int=vi, terrain=terrain, pitch_ref=pr,
        )

    solve = jax.jit(_solve)
    lowlvl = jax.jit(
        lambda x, t, pf, q, qd, c, u0, r, vi, xc: low_level_control(
            x, t, pf, q, qd, dataclasses.replace(mpc, x_cmd=xc), biped, c,
            u0, gait=gait, cmd_ref=r, terrain=terrain, v_int=vi,
        )
    )
    ctrl = ControllerState.init(mpc)
    forces, xs = [], []
    t = 0.0
    if cmd_schedule:
        cmd_schedule = sorted(cmd_schedule, key=lambda e: e[0])
    xc_now = mpc.x_cmd
    # contact-sensed gait clock (GaitConfig.contact_clock): host-side
    # mirror of control/gait.py::advance_gait_clock, with MuJoCo's REAL
    # contact normal forces as the touchdown signal (> 5 N)
    t_gait, hold = -mpc.dt, 0
    if gait_schedule:
        for _, g in gait_schedule:
            assert g.steps_per_phase == gait.steps_per_phase, (
                "gait_schedule can only switch gait_mode"
            )
        # latest start <= k wins regardless of list order
        gait_schedule = sorted(gait_schedule, key=lambda e: e[0])
    gait_now = gait
    for k in range(n_ticks):
        if gait_schedule:
            for start, g in gait_schedule:
                if k >= start:
                    gait_now = g
        if cmd_schedule:
            for start, xc in cmd_schedule:
                if k >= start:
                    xc_now = jnp.asarray(xc, jnp.float32)
        if shove is not None and k == shove[0]:
            # world-frame base-velocity impulse (MuJoCo free-joint linear
            # qvel is world-frame)
            d.qvel[0] += shove[1]
            d.qvel[1] += shove[2]
        s = state_from_mj(d, t)
        x_fb, pf_w = fb(s)
        if gait_now.contact_clock:
            # contact from MuJoCo's REAL normal forces (> 5 N); same
            # hold rule and biased-product step semantics as the jitted
            # clock (control/gait.py::advance_gait_clock)
            t_gait, hold = advance_gait_clock_host(
                t_gait, hold, mj_foot_forces(m, d) > 5.0, mpc, gait_now
            )
            t_used = t_gait
        else:
            t_used = t
        contact = contact_sequence(t_used, mpc, gait_now)
        sol = solve(
            x_fb, t_used, pf_w, contact, ctrl.qp, ctrl.cmd_ref, s.q,
            ctrl.v_int, ctrl.pitch_ref, xc_now,
        )
        # low-level uses the SAME pre-advance cmd_ref as the solve — the
        # engine tick's semantics (art_closed_loop_tick); the anchor
        # advances for the NEXT tick only
        cmd_ref_now = ctrl.cmd_ref
        v_int_now = ctrl.v_int
        mpc_now = dataclasses.replace(mpc, x_cmd=xc_now)
        ctrl = ControllerState(
            qp=sol, cmd_ref=advance_cmd_ref(ctrl.cmd_ref, x_fb, mpc_now),
            v_int=advance_v_int(ctrl.v_int, x_fb, mpc_now),
            pitch_ref=advance_pitch_ref(ctrl.pitch_ref, x_fb, mpc_now),
        )
        f_acc = np.zeros(2)
        for _ in range(N_LL):
            # gait-local time for the swing clocks (= t when the contact
            # clock is off; s.t is the tick-start wall time either way)
            s = state_from_mj(d, t_used)
            x_j, pf_j = fb(s)
            tau = lowlvl(
                x_j, s.t, pf_j, s.q, s.qd, contact, sol.controls[0],
                cmd_ref_now, v_int_now, xc_now,
            )
            d.qfrc_applied[6:16] = np.array(tau)
            for _ in range(MJ_PER_LL):
                mujoco.mj_step(m, d)
            f_acc += mj_foot_forces(m, d)
        forces.append(f_acc / N_LL)
        xs.append(np.array(x_fb))
        t += mpc.dt
        if d.qpos[2] < fall_z:
            return np.array(forces), np.array(xs), True
    return np.array(forces), np.array(xs), False
