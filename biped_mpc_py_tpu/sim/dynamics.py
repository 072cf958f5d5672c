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
