"""Floating-base articulated dynamics: RNEA bias + CRBA mass matrix.

Featherstone's algorithms over the fixed 11-body HECTOR tree (sim/model.py),
written the TPU way: the tree loops are unrolled at trace time (static
topology), every op is a small fused VPU expression, and the final 16x16
linear solve is a batched Cholesky — the whole forward-dynamics evaluation
jits into one XLA computation and vmaps over envs.

EOM:  M(q) qdd = tau_gen - bias(q, qd, f_ext)
where bias includes Coriolis/centrifugal, gravity, and the generalized
projection of external (contact) forces — external forces enter the RNEA
backward pass directly, so no explicit contact Jacobians are materialized.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from biped_mpc_py_tpu.ops.rotations import quat_to_rotm
from biped_mpc_py_tpu.sim.model import (
    JOINT_AXES,
    N_BODIES,
    PARENT,
    ArticulatedModel,
)
from biped_mpc_py_tpu.sim.spatial import (
    SpatialTransform,
    crf,
    crm,
    spatial_inertia,
    xform_force_inv,
    xform_inertia,
    xform_motion,
)


def _axis_rotation(axis: jnp.ndarray, q):
    """Rotation matrix about a unit coordinate axis by angle q (3,3)."""
    c, s = jnp.cos(q), jnp.sin(q)
    K = jnp.array(
        [
            [0.0, -axis[2], axis[1]],
            [axis[2], 0.0, -axis[0]],
            [-axis[1], axis[0], 0.0],
        ],
        dtype=jnp.result_type(q),
    )
    return jnp.eye(3, dtype=K.dtype) + s * K + (1 - c) * (K @ K)


def joint_transforms(model: ArticulatedModel, q: jnp.ndarray):
    """Per-joint parent->child spatial transforms X_up[j] (list of 10)."""
    xs = []
    for j in range(10):
        axis = jnp.asarray(JOINT_AXES[j], q.dtype)
        R_pc = _axis_rotation(axis, q[j])  # child frame in parent coords
        # SpatialTransform.R transforms parent coords -> child coords = R_pcᵀ
        xs.append(
            SpatialTransform(R=R_pc.T, p=jnp.asarray(model.joint_offset[j], q.dtype))
        )
    return xs


def body_inertias(model: ArticulatedModel):
    """6x6 spatial inertias of all bodies in their own frames (list)."""
    return [
        spatial_inertia(model.mass[i], model.com[i], model.inertia[i])
        for i in range(N_BODIES)
    ]


def forward_kinematics(model: ArticulatedModel, pos, quat, q):
    """World pose of every body: (R_wb list, p_w list) (body->world)."""
    R_wb = [quat_to_rotm(quat)]
    p_w = [pos]
    X_up = joint_transforms(model, q)
    for i in range(1, N_BODIES):
        par = PARENT[i]
        X = X_up[i - 1]
        R_parent, p_parent = R_wb[par], p_w[par]
        p_w.append(p_parent + R_parent @ X.p)
        # X.R maps parent->child coords; child->world = R_parent @ X.Rᵀ
        R_wb.append(R_parent @ X.R.T)
    return R_wb, p_w


def rnea_bias(
    model: ArticulatedModel,
    q: jnp.ndarray,
    qd: jnp.ndarray,
    v_base: jnp.ndarray,
    R_base: jnp.ndarray,
    f_ext,
    g: float = 9.81,
):
    """Bias force b(q, qd, f_ext) (16,): RNEA with qdd = 0.

    Args:
      v_base: (6,) base spatial velocity [omega; v] in base coords.
      R_base: (3,3) base->world rotation.
      f_ext: list of 11 spatial forces (6,) in each body's own frame (zeros
        where no external load), applied positively to the body.
    """
    dtype = q.dtype
    X_up = joint_transforms(model, q)
    I_sp = body_inertias(model)

    # gravity trick: accelerate the base frame upward by g
    a0_lin = R_base.T @ jnp.array([0.0, 0.0, g], dtype)
    a = [jnp.concatenate([jnp.zeros(3, dtype), a0_lin])]
    v = [v_base]
    f = [None] * N_BODIES
    for i in range(1, N_BODIES):
        j = i - 1
        par = PARENT[i]
        S = jnp.concatenate([jnp.asarray(JOINT_AXES[j], dtype), jnp.zeros(3, dtype)])
        vJ = S * qd[j]
        vi = xform_motion(X_up[j], v[par]) + vJ
        ai = xform_motion(X_up[j], a[par]) + crm(vi, vJ)
        v.append(vi)
        a.append(ai)
    for i in range(N_BODIES):
        f[i] = I_sp[i] @ a[i] + crf(v[i], I_sp[i] @ v[i]) - f_ext[i]

    bias_joint = jnp.zeros(10, dtype)
    for i in range(N_BODIES - 1, 0, -1):
        j = i - 1
        S = jnp.concatenate([jnp.asarray(JOINT_AXES[j], dtype), jnp.zeros(3, dtype)])
        bias_joint = bias_joint.at[j].set(S @ f[i])
        f[PARENT[i]] = f[PARENT[i]] + xform_force_inv(X_up[j], f[i])
    return jnp.concatenate([f[0], bias_joint])


def crba_mass_matrix(model: ArticulatedModel, q: jnp.ndarray) -> jnp.ndarray:
    """Joint-space inertia matrix M(q) (16,16) via the composite-rigid-body
    algorithm; rows/cols 0:6 are the floating base (in base coordinates)."""
    dtype = q.dtype
    X_up = joint_transforms(model, q)
    Ic = body_inertias(model)

    M = jnp.zeros((16, 16), dtype)
    # accumulate composite inertias toward the root
    for i in range(N_BODIES - 1, 0, -1):
        Ic[PARENT[i]] = Ic[PARENT[i]] + xform_inertia(X_up[i - 1], Ic[i])
    M = M.at[0:6, 0:6].set(Ic[0])

    for i in range(1, N_BODIES):
        j = i - 1
        S = jnp.concatenate([jnp.asarray(JOINT_AXES[j], dtype), jnp.zeros(3, dtype)])
        F = Ic_body(Ic, i) @ S
        M = M.at[6 + j, 6 + j].set(S @ F)
        b = i
        while PARENT[b] != -1:
            F = xform_force_inv(X_up[b - 1], F)
            b = PARENT[b]
            if b == 0:
                M = M.at[0:6, 6 + j].set(F)
                M = M.at[6 + j, 0:6].set(F)
            else:
                k = b - 1
                Sb = jnp.concatenate(
                    [jnp.asarray(JOINT_AXES[k], dtype), jnp.zeros(3, dtype)]
                )
                M = M.at[6 + k, 6 + j].set(Sb @ F)
                M = M.at[6 + j, 6 + k].set(Sb @ F)
    # reflected actuator inertia on the joint diagonal (model.armature);
    # must come after the joint-block sets above
    M = M.at[jnp.arange(6, 16), jnp.arange(6, 16)].add(
        jnp.asarray(model.armature, dtype)
    )
    return M


def Ic_body(Ic, i):
    return Ic[i]


def forward_dynamics(
    model: ArticulatedModel,
    pos: jnp.ndarray,
    quat: jnp.ndarray,
    q: jnp.ndarray,
    v_base: jnp.ndarray,
    qd: jnp.ndarray,
    tau: jnp.ndarray,
    f_ext,
    g: float = 9.81,
) -> jnp.ndarray:
    """qdd (16,): [base spatial accel (base coords); joint accels].

    CRBA composite inertias must be built from the ORIGINAL body inertias, so
    rnea and crba each rebuild their lists (cheap: traced constants).
    """
    R_base = quat_to_rotm(quat)
    bias = rnea_bias(model, q, qd, v_base, R_base, f_ext, g)
    M = crba_mass_matrix(model, q)
    tau_gen = jnp.concatenate([jnp.zeros(6, q.dtype), tau])
    rhs = tau_gen - bias
    L = jnp.linalg.cholesky(M)
    return jax.scipy.linalg.cho_solve((L, True), rhs)


# --------------------------------------------------------------------------
# Leg-vectorized fast path (HECTOR-specialized).
#
# The generic tree loops above dispatch ~150 small XLA ops per evaluation —
# pure latency on TPU. HECTOR's two legs are structurally identical chains,
# so every per-body op below carries a leading (2,) leg axis and the
# sequential depth is 5 levels instead of 10 bodies. Validated against the
# generic path in tests/test_sim.py (exact to f32).
# --------------------------------------------------------------------------

from biped_mpc_py_tpu.ops.rotations import skew as _skew  # noqa: E402
from biped_mpc_py_tpu.sim.spatial import spatial_inertia as _spatial_inertia  # noqa: E402


def _leg_transforms(model: ArticulatedModel, q2: jnp.ndarray):
    """Joint transforms for both legs -> SpatialTransform with (2,5,·) leaves.

    q2: (2,5) joint angles.
    """
    dtype = q2.dtype
    axes = jnp.asarray(JOINT_AXES, dtype).reshape(2, 5, 3)
    offs = jnp.asarray(model.joint_offset, dtype).reshape(2, 5, 3)
    K = _skew(axes)  # (2,5,3,3)
    c = jnp.cos(q2)[..., None, None]
    s = jnp.sin(q2)[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), K.shape)
    R_pc = eye + s * K + (1 - c) * (K @ K)
    return SpatialTransform(R=jnp.swapaxes(R_pc, -1, -2), p=offs)


def _leg_S(dtype):
    axes = jnp.asarray(JOINT_AXES, dtype).reshape(2, 5, 3)
    return jnp.concatenate([axes, jnp.zeros_like(axes)], axis=-1)  # (2,5,6)


def _leg_inertias(model: ArticulatedModel):
    mass = model.mass[1:].reshape(2, 5)
    com = model.com[1:].reshape(2, 5, 3)
    rot = model.inertia[1:].reshape(2, 5, 3, 3)
    return _spatial_inertia(mass, com, rot)  # (2,5,6,6)


def _level(X, l):
    return SpatialTransform(R=X.R[:, l], p=X.p[:, l])


def leg_kinematics_lv(model: ArticulatedModel, pos, quat, q, v_base, qd):
    """World poses and body-frame spatial velocities, leg-vectorized.

    Returns (R_w (2,5,3,3), p_w (2,5,3), v (2,5,6), R0 (3,3)).
    """
    dtype = q.dtype
    q2, qd2 = q.reshape(2, 5), qd.reshape(2, 5)
    X = _leg_transforms(model, q2)
    S = _leg_S(dtype)
    R0 = quat_to_rotm(quat)
    R_prev = jnp.broadcast_to(R0, (2, 3, 3))
    p_prev = jnp.broadcast_to(pos, (2, 3))
    v_prev = jnp.broadcast_to(v_base, (2, 6))
    R_ws, p_ws, vs = [], [], []
    for l in range(5):
        Xl = _level(X, l)
        p_prev = p_prev + jnp.einsum("lij,lj->li", R_prev, Xl.p)
        R_prev = R_prev @ jnp.swapaxes(Xl.R, -1, -2)
        v_prev = xform_motion(Xl, v_prev) + S[:, l] * qd2[:, l, None]
        R_ws.append(R_prev)
        p_ws.append(p_prev)
        vs.append(v_prev)
    return (
        jnp.stack(R_ws, axis=1),
        jnp.stack(p_ws, axis=1),
        jnp.stack(vs, axis=1),
        R0,
    )


def rnea_bias_lv(
    model: ArticulatedModel,
    q: jnp.ndarray,
    qd: jnp.ndarray,
    v_base: jnp.ndarray,
    R_base: jnp.ndarray,
    f_ext_legs: jnp.ndarray,  # (2,5,6) spatial forces in body frames
    f_ext_base: jnp.ndarray,  # (6,)
    g: float = 9.81,
) -> jnp.ndarray:
    """Leg-vectorized RNEA bias (16,): equals :func:`rnea_bias`."""
    dtype = q.dtype
    q2, qd2 = q.reshape(2, 5), qd.reshape(2, 5)
    X = _leg_transforms(model, q2)
    S = _leg_S(dtype)
    I_legs = _leg_inertias(model).astype(dtype)

    a0_lin = R_base.T @ jnp.array([0.0, 0.0, g], dtype)
    a_base = jnp.concatenate([jnp.zeros(3, dtype), a0_lin])
    v_prev = jnp.broadcast_to(v_base, (2, 6))
    a_prev = jnp.broadcast_to(a_base, (2, 6))
    vs, fs = [], []
    for l in range(5):
        Xl = _level(X, l)
        vJ = S[:, l] * qd2[:, l, None]
        v_l = xform_motion(Xl, v_prev) + vJ
        a_l = xform_motion(Xl, a_prev) + crm(v_l, vJ)
        Iv = jnp.einsum("lij,lj->li", I_legs[:, l], v_l)
        f_l = (
            jnp.einsum("lij,lj->li", I_legs[:, l], a_l)
            + crf(v_l, Iv)
            - f_ext_legs[:, l]
        )
        vs.append(v_l)
        fs.append(f_l)
        v_prev, a_prev = v_l, a_l

    bias_cols = [None] * 5
    f_acc = fs[4]
    for l in range(4, -1, -1):
        bias_cols[l] = jnp.sum(S[:, l] * f_acc, axis=-1)  # (2,)
        f_acc = xform_force_inv(_level(X, l), f_acc)
        if l > 0:
            f_acc = f_acc + fs[l - 1]
    # torso
    I0 = _spatial_inertia(
        model.mass[0], model.com[0].astype(dtype), model.inertia[0].astype(dtype)
    )
    v0 = v_base
    f0 = I0 @ a_base + crf(v0, I0 @ v0) - f_ext_base + jnp.sum(f_acc, axis=0)
    bias_joints = jnp.stack(bias_cols, axis=1).reshape(-1)  # (10,) leg-major
    return jnp.concatenate([f0, bias_joints])


def crba_mass_matrix_lv(model: ArticulatedModel, q: jnp.ndarray) -> jnp.ndarray:
    """Leg-vectorized CRBA: equals :func:`crba_mass_matrix`."""
    dtype = q.dtype
    q2 = q.reshape(2, 5)
    X = _leg_transforms(model, q2)
    S = _leg_S(dtype)
    I_legs = _leg_inertias(model).astype(dtype)

    # composite subtree inertias per level
    Ic = [None] * 5
    Ic[4] = I_legs[:, 4]
    for l in range(4, 0, -1):
        Ic[l - 1] = I_legs[:, l - 1] + xform_inertia(_level(X, l), Ic[l])
    I0 = _spatial_inertia(
        model.mass[0], model.com[0].astype(dtype), model.inertia[0].astype(dtype)
    )
    base_block = I0 + jnp.sum(xform_inertia(_level(X, 0), Ic[0]), axis=0)

    Mj = jnp.zeros((2, 5, 5), dtype)  # per-leg joint-joint blocks
    coup = jnp.zeros((2, 5, 6), dtype)  # per-leg base couplings
    for j in range(4, -1, -1):
        F = jnp.einsum("lij,lj->li", Ic[j], S[:, j])  # (2,6)
        Mj = Mj.at[:, j, j].set(jnp.sum(S[:, j] * F, axis=-1))
        for k in range(j - 1, -1, -1):
            F = xform_force_inv(_level(X, k + 1), F)
            val = jnp.sum(S[:, k] * F, axis=-1)
            Mj = Mj.at[:, j, k].set(val)
            Mj = Mj.at[:, k, j].set(val)
        coup = coup.at[:, j].set(xform_force_inv(_level(X, 0), F))

    M = jnp.zeros((16, 16), dtype)
    M = M.at[0:6, 0:6].set(base_block)
    M = M.at[6:11, 6:11].set(Mj[0])
    M = M.at[11:16, 11:16].set(Mj[1])
    M = M.at[0:6, 6:11].set(coup[0].T)
    M = M.at[6:11, 0:6].set(coup[0])
    M = M.at[0:6, 11:16].set(coup[1].T)
    M = M.at[11:16, 0:6].set(coup[1])
    M = M.at[jnp.arange(6, 16), jnp.arange(6, 16)].add(
        jnp.asarray(model.armature, dtype)
    )
    return M


def forward_dynamics_lv(
    model: ArticulatedModel,
    pos: jnp.ndarray,
    quat: jnp.ndarray,
    q: jnp.ndarray,
    v_base: jnp.ndarray,
    qd: jnp.ndarray,
    tau: jnp.ndarray,
    f_ext_legs: jnp.ndarray,
    f_ext_base: jnp.ndarray,
    g: float = 9.81,
    Minv: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Leg-vectorized forward dynamics (same semantics as
    :func:`forward_dynamics`; external forces as (2,5,6)+(6,)).

    ``Minv``: optionally pass a precomputed inverse mass matrix (16,16) —
    M depends only on q, which moves ~1% over a 5 ms low-level period, so
    the integrator refreshes it every few substeps instead of factorizing
    per substep (see engine.art_step).
    """
    R_base = quat_to_rotm(quat)
    bias = rnea_bias_lv(
        model, q, qd, v_base, R_base, f_ext_legs, f_ext_base, g
    )
    tau_gen = jnp.concatenate([jnp.zeros(6, q.dtype), tau])
    if Minv is not None:
        return Minv @ (tau_gen - bias)
    M = crba_mass_matrix_lv(model, q)
    L = jnp.linalg.cholesky(M)
    return jax.scipy.linalg.cho_solve((L, True), tau_gen - bias)
