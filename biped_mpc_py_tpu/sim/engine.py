"""The articulated-body simulation engine (the north star's big addition).

One :func:`art_step` advances the full 16-DoF HECTOR by one control period
using ``n_substeps`` semi-implicit Euler substeps of the Featherstone forward
dynamics (sim/dynamics.py) with compliant toe/heel contact (sim/contact.py).
Everything is pure, branch-free, and static-shaped: the step jits into one
XLA program, vmaps over envs, and scans over time — same contract as the SRB
stub (sim/srb_sim.py), so the controller stack is reused unchanged.

State <-> controller conversion: the torso frame origin is the nominal CoM
(sim/model.py), so ``x_fb = [euler, pos, R omega_b, R v_b]`` matches the
reference's SRB state definition (``bipedalLocomotionMPC.py:8-9``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from biped_mpc_py_tpu.ops.rotations import (
    quat_integrate,
    quat_to_eul,
    quat_to_rotm,
)
from biped_mpc_py_tpu.sim.contact import contact_force_world
from biped_mpc_py_tpu.sim.dynamics import forward_dynamics, forward_kinematics
from biped_mpc_py_tpu.sim.model import (
    FOOT_BODIES,
    N_BODIES,
    ArticulatedModel,
)


@struct.dataclass
class ArtState:
    """Full articulated state (one env; vmap for batches)."""

    pos: jnp.ndarray  # (3,) base (nominal-CoM) position, world
    quat: jnp.ndarray  # (4,) base orientation (w,x,y,z), body->world
    v_base: jnp.ndarray  # (6,) spatial base velocity [omega; v], BASE coords
    q: jnp.ndarray  # (10,) joint angles
    qd: jnp.ndarray  # (10,) joint velocities
    t: jnp.ndarray  # scalar time [s]

    @classmethod
    def standing(cls, z0: float = 0.551, dtype=jnp.float32) -> "ArtState":
        """Default pose: the reference's initial joint vector
        (``bipedalLocomotionMPC.py:15``) with feet just touching z=0."""
        import numpy as np

        q = jnp.asarray(
            [0, 0, -np.pi / 4, np.pi / 2, -np.pi / 4] * 2, dtype
        )
        return cls(
            pos=jnp.asarray([0.0, 0.0, z0], dtype),
            quat=jnp.asarray([1.0, 0.0, 0.0, 0.0], dtype),
            v_base=jnp.zeros(6, dtype),
            q=q,
            qd=jnp.zeros(10, dtype),
            t=jnp.asarray(0.0, dtype),
        )

    def torso_state(self) -> jnp.ndarray:
        """Torso-frame feedback state (12,) in the reference convention
        (use :func:`com_feedback_state` for the controller's hybrid CoM
        feedback; this is the raw torso state)."""
        R = quat_to_rotm(self.quat)
        eul = quat_to_eul(self.quat)
        w_world = R @ self.v_base[0:3]
        v_world = R @ self.v_base[3:6]
        return jnp.concatenate([eul, self.pos, w_world, v_world])


def com_feedback_state(model: ArticulatedModel, state: ArtState) -> jnp.ndarray:
    """Controller feedback (12,): whole-body CoM for x/y, torso frame for z.

    The torso-frame origin only approximates the CoM at the nominal pose;
    during swing the legs shift the real CoM by a few cm, and feeding the
    torso xy to the SRB MPC produces a systematic moment error (observed as
    a steady pitch drift in closed loop) — so the HORIZONTAL feedback is the
    exact CoM (mass-weighted FK position, momentum/mass velocity). The
    VERTICAL channel keeps torso-frame z so the height command retains its
    leg-extension meaning (commanding true-CoM height overextends the legs).
    Attitude and angular velocity are the torso's.
    """
    from biped_mpc_py_tpu.sim.dynamics import (
        crba_mass_matrix,
        forward_kinematics,
        joint_transforms,
    )
    from biped_mpc_py_tpu.sim.model import JOINT_AXES, PARENT
    from biped_mpc_py_tpu.sim.spatial import xform_motion

    R_wb, p_w = forward_kinematics(model, state.pos, state.quat, state.q)
    X_up = joint_transforms(model, state.q)
    v = [state.v_base]
    for i in range(1, N_BODIES):
        j = i - 1
        S = jnp.concatenate(
            [jnp.asarray(JOINT_AXES[j], state.q.dtype), jnp.zeros(3, state.q.dtype)]
        )
        v.append(xform_motion(X_up[j], v[PARENT[i]]) + S * state.qd[j])

    total_m = jnp.sum(model.mass)
    p_com = jnp.zeros(3, state.q.dtype)
    mom = jnp.zeros(3, state.q.dtype)
    for i in range(N_BODIES):
        ci = model.com[i]
        p_com = p_com + model.mass[i] * (p_w[i] + R_wb[i] @ ci)
        v_ci = v[i][3:6] + jnp.cross(v[i][0:3], ci)  # body coords
        mom = mom + model.mass[i] * (R_wb[i] @ v_ci)
    p_com = p_com / total_m
    v_com = mom / total_m

    R = R_wb[0]
    eul = quat_to_eul(state.quat)
    w_world = R @ state.v_base[0:3]
    # hybrid: CoM xy, torso z (see docstring)
    pos = jnp.stack([p_com[0], p_com[1], state.pos[2]])
    v_t = R @ state.v_base[3:6]
    vel = jnp.stack([v_com[0], v_com[1], v_t[2]])
    return jnp.concatenate([eul, pos, w_world, vel])


def sole_positions(model: ArticulatedModel, state: ArtState) -> jnp.ndarray:
    """World positions (6,) of both sole centers (the reference's "foot"
    points, FK chain tip at (0,0,-l_foot) in each foot frame)."""
    from biped_mpc_py_tpu.sim.dynamics import forward_kinematics

    R_wb, p_w = forward_kinematics(model, state.pos, state.quat, state.q)
    tip = jnp.array([0.0, 0.0, -0.036], state.q.dtype)
    out = []
    for b in FOOT_BODIES:
        out.append(p_w[b] + R_wb[b] @ tip)
    return jnp.concatenate(out)


def contact_point_states(model: ArticulatedModel, state: ArtState):
    """World positions and velocities of the 4 toe/heel contact points."""
    R_wb, p_w = forward_kinematics(model, state.pos, state.quat, state.q)
    # body spatial velocities in body coords (same recursion as RNEA)
    from biped_mpc_py_tpu.sim.dynamics import joint_transforms
    from biped_mpc_py_tpu.sim.model import JOINT_AXES, PARENT
    from biped_mpc_py_tpu.sim.spatial import xform_motion

    X_up = joint_transforms(model, state.q)
    v = [state.v_base]
    for i in range(1, N_BODIES):
        j = i - 1
        S = jnp.concatenate(
            [jnp.asarray(JOINT_AXES[j], state.q.dtype), jnp.zeros(3, state.q.dtype)]
        )
        v.append(xform_motion(X_up[j], v[PARENT[i]]) + S * state.qd[j])

    points, vels, bodies = [], [], []
    for c in range(4):
        b = FOOT_BODIES[c // 2]
        r_local = model.contact_points[c]
        p_point = p_w[b] + R_wb[b] @ r_local
        w_b, v_b = v[b][0:3], v[b][3:6]
        v_point = R_wb[b] @ (v_b + jnp.cross(w_b, r_local))
        points.append(p_point)
        vels.append(v_point)
        bodies.append(b)
    return jnp.stack(points), jnp.stack(vels), bodies, (R_wb, p_w)


def art_substep(
    model: ArticulatedModel, state: ArtState, tau: jnp.ndarray, dt: float,
    terrain=None,
) -> ArtState:
    """One semi-implicit Euler substep under joint torques tau (10,)."""
    dtype = state.q.dtype
    points, vels, bodies, (R_wb, _) = contact_point_states(model, state)
    f_world = contact_force_world(model, points, vels, terrain)  # (4,3)

    # external spatial forces per body, in each body's own frame
    f_ext = [jnp.zeros(6, dtype) for _ in range(N_BODIES)]
    for c in range(4):
        b = bodies[c]
        f_b = R_wb[b].T @ f_world[c]
        n_b = jnp.cross(model.contact_points[c], f_b)
        f_ext[b] = f_ext[b] + jnp.concatenate([n_b, f_b])

    # soft joint limits + viscous joint damping
    lim = model.joint_limits
    over = jnp.maximum(state.q - lim[:, 1], 0.0)
    under = jnp.maximum(lim[:, 0] - state.q, 0.0)
    in_violation = ((over > 0) | (under > 0)).astype(dtype)
    tau_lim = (
        -model.joint_limit_stiffness * (over - under)
        - model.joint_limit_damping * state.qd * in_violation
    )
    tau_eff = tau + tau_lim - model.joint_damping * state.qd
    qdd = forward_dynamics(
        model, state.pos, state.quat, state.q, state.v_base, state.qd,
        tau_eff, f_ext,
    )

    # semi-implicit: update velocities first, then positions
    v_base = state.v_base + qdd[0:6] * dt
    qd = state.qd + qdd[6:16] * dt
    R = quat_to_rotm(state.quat)
    omega_world = R @ v_base[0:3]
    pos = state.pos + (R @ v_base[3:6]) * dt
    quat = quat_integrate(state.quat, omega_world, dt)
    return ArtState(
        pos=pos, quat=quat, v_base=v_base, q=state.q + qd * dt, qd=qd,
        t=state.t + dt,
    )


def art_step(
    model: ArticulatedModel,
    state: ArtState,
    tau: jnp.ndarray,
    dt: float,
    n_substeps: int = 80,
    terrain=None,
) -> ArtState:
    """Advance one control period (tau held zero-order) with a substep scan."""
    sub_dt = dt / n_substeps

    def body(s, _):
        return art_substep(model, s, tau, sub_dt, terrain), None

    state, _ = jax.lax.scan(body, state, None, length=n_substeps)
    return state
