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

    ONE implementation of the math: this is :func:`feedback_and_soles`'
    feedback half (the sole einsum it also computes is negligible next
    to the shared FK pass).
    """
    return feedback_and_soles(model, state)[0]


def sole_positions(model: ArticulatedModel, state: ArtState) -> jnp.ndarray:
    """World positions (6,) of both sole centers (the reference's "foot"
    points, FK chain tip at (0,0,-l_foot) in each foot frame)."""
    from biped_mpc_py_tpu.sim.dynamics import leg_kinematics_lv

    R_w, p_w, _, _ = leg_kinematics_lv(
        model, state.pos, state.quat, state.q, state.v_base, state.qd
    )
    return _soles_from_fk(model, R_w, p_w, state.q.dtype)


def _soles_from_fk(model: ArticulatedModel, R_w, p_w, dtype) -> jnp.ndarray:
    # Sole tip (0,0,-l_foot) in the foot frame: single-sourced from the
    # model's toe contact row (z = -geom.l_foot, sim/model.py) so the
    # HECTOR_LEG_JAC preset / randomized leg geometry stays consistent
    # (round-3 VERDICT weak #3: a hard-coded -0.036 here silently broke
    # any non-default l_foot).
    tip = jnp.array([0.0, 0.0, 1.0], dtype) * model.contact_points[0, 2].astype(dtype)
    soles = p_w[:, 4] + jnp.einsum("lij,j->li", R_w[:, 4], tip)
    return soles.reshape(6)


def feedback_and_soles(model: ArticulatedModel, state: ArtState):
    """(x_fb (12,), pf_w (6,)) from ONE leg-kinematics pass.

    The CANONICAL implementation of the controller feedback —
    :func:`com_feedback_state` (see its docstring for the hybrid
    CoM-xy/torso-z semantics) delegates here, and
    :func:`sole_positions` shares :func:`_soles_from_fk`. One FK pass
    serves both outputs (separate calls each re-ran the full leg FK;
    equivalence is test-pinned,
    test_sim.py::test_feedback_and_soles_matches_separate_paths)."""
    from biped_mpc_py_tpu.sim.dynamics import leg_kinematics_lv

    dtype = state.q.dtype
    R_w, p_w, v_legs, R0 = leg_kinematics_lv(
        model, state.pos, state.quat, state.q, state.v_base, state.qd
    )
    m_legs = model.mass[1:].reshape(2, 5).astype(dtype)
    c_legs = model.com[1:].reshape(2, 5, 3).astype(dtype)
    total_m = jnp.sum(model.mass)

    com_pts = p_w + jnp.einsum("lkij,lkj->lki", R_w, c_legs)  # (2,5,3)
    v_ci = v_legs[..., 3:6] + jnp.cross(v_legs[..., 0:3], c_legs)
    mom_legs = jnp.einsum(
        "lk,lki->i", m_legs, jnp.einsum("lkij,lkj->lki", R_w, v_ci)
    )
    c0 = model.com[0].astype(dtype)
    p_com = (
        model.mass[0] * (state.pos + R0 @ c0)
        + jnp.einsum("lk,lki->i", m_legs, com_pts)
    ) / total_m
    v0_ci = state.v_base[3:6] + jnp.cross(state.v_base[0:3], c0)
    v_com = (model.mass[0] * (R0 @ v0_ci) + mom_legs) / total_m

    eul = quat_to_eul(state.quat)
    w_world = R0 @ state.v_base[0:3]
    pos = jnp.stack([p_com[0], p_com[1], state.pos[2]])
    v_t = R0 @ state.v_base[3:6]
    vel = jnp.stack([v_com[0], v_com[1], v_t[2]])
    x_fb = jnp.concatenate([eul, pos, w_world, vel])
    return x_fb, _soles_from_fk(model, R_w, p_w, dtype)


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
    terrain=None, Minv=None,
) -> ArtState:
    """One semi-implicit Euler substep under joint torques tau (10,).

    Uses the leg-vectorized dynamics fast path (sim/dynamics.py): both legs'
    kinematics/contact/forces carry a (2,) leg axis, halving the op count of
    the generic tree walk. ``Minv`` optionally supplies a precomputed mass
    matrix inverse (see :func:`art_step`).
    """
    from biped_mpc_py_tpu.sim.dynamics import (
        forward_dynamics_lv,
        leg_kinematics_lv,
    )

    dtype = state.q.dtype
    R_w, p_w, v_b, _ = leg_kinematics_lv(
        model, state.pos, state.quat, state.q, state.v_base, state.qd
    )
    # toe/heel contact points per foot: (2 legs, 2 points, 3)
    r_local = model.contact_points.reshape(2, 2, 3).astype(dtype)
    R_wf, p_wf, v_f = R_w[:, 4], p_w[:, 4], v_b[:, 4]
    pts = p_wf[:, None, :] + jnp.einsum("lij,lpj->lpi", R_wf, r_local)
    v_pts = jnp.einsum(
        "lij,lpj->lpi",
        R_wf,
        v_f[:, None, 3:6] + jnp.cross(v_f[:, None, 0:3], r_local),
    )
    f_world = contact_force_world(model, pts, v_pts, terrain)  # (2,2,3)
    f_b = jnp.einsum("lji,lpj->lpi", R_wf, f_world)  # world -> foot frame
    n_b = jnp.cross(r_local, f_b)
    wrench_foot = jnp.concatenate(
        [jnp.sum(n_b, axis=1), jnp.sum(f_b, axis=1)], axis=-1
    )  # (2,6)
    f_ext_legs = jnp.zeros((2, 5, 6), dtype).at[:, 4].set(wrench_foot)

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
    qdd = forward_dynamics_lv(
        model, state.pos, state.quat, state.q, state.v_base, state.qd,
        tau_eff, f_ext_legs, jnp.zeros(6, dtype), Minv=Minv,
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


def mass_matrix_inv(model: ArticulatedModel, q: jnp.ndarray) -> jnp.ndarray:
    """Newton-Schulz inverse of the CRBA mass matrix at q (16,16)."""
    from biped_mpc_py_tpu.ops.qp import ns_inverse
    from biped_mpc_py_tpu.sim.dynamics import crba_mass_matrix_lv

    return ns_inverse(crba_mass_matrix_lv(model, q), n_iters=12)


def art_step(
    model: ArticulatedModel,
    state: ArtState,
    tau: jnp.ndarray,
    dt: float,
    n_substeps: int = 80,
    terrain=None,
    m_refresh: int = 1,
    Minv: jnp.ndarray | None = None,
    unroll: int = 1,
) -> ArtState:
    """Advance one control period (tau held zero-order) with a substep scan.

    ``m_refresh`` > 1 recomputes the (q-only) mass-matrix inverse every
    m_refresh substeps instead of factorizing per substep — M moves ~1%
    over a 5 ms low-level period, and the MuJoCo closed-loop force oracle
    (tests/test_mj_contact.py) bounds the fidelity cost. The inverse uses
    ops/qp.py::ns_inverse (MXU-batched Newton-Schulz) rather than XLA's
    loop-lowered Cholesky. m_refresh=1 keeps the exact per-substep
    factorization (the oracle tests' setting).

    ``Minv``: optional externally-held mass-matrix inverse
    (:func:`mass_matrix_inv`) reused for the WHOLE step — the caller
    chooses the refresh cadence (e.g. once per 40 ms MPC tick).

    ``unroll``: substep-scan unroll factor (numerics-identical — the same
    ops in the same order; lets XLA fuse/schedule across substep
    boundaries instead of paying per-iteration loop overhead on a chain
    of tiny VPU ops).
    """
    sub_dt = dt / n_substeps

    if Minv is not None:
        def body_pre(s, _):
            return art_substep(model, s, tau, sub_dt, terrain, Minv), None

        state, _ = jax.lax.scan(
            body_pre, state, None, length=n_substeps, unroll=unroll
        )
        return state

    if m_refresh <= 1:
        def body(s, _):
            return art_substep(model, s, tau, sub_dt, terrain), None

        state, _ = jax.lax.scan(body, state, None, length=n_substeps)
        return state

    assert n_substeps % m_refresh == 0, (n_substeps, m_refresh)

    def outer(s, _):
        Minv_ = mass_matrix_inv(model, s.q)

        def inner(s2, _):
            return art_substep(model, s2, tau, sub_dt, terrain, Minv_), None

        s, _ = jax.lax.scan(inner, s, None, length=m_refresh)
        return s, None

    state, _ = jax.lax.scan(outer, state, None, length=n_substeps // m_refresh)
    return state
