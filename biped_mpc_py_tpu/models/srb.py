"""Single-rigid-body dynamics linearization (L4/C7).

Per-horizon-step linear model ``x_{k+1} = A_k x_k + B_k u_k`` of the
gravity-augmented SRB state. The reference builds A/B one step at a time in a
Python loop with LAPACK ``inv``/``solve`` calls
(``bipedalLocomotionMPC.py:148-200``); here :func:`linearize_horizon` vmaps
the closed-form construction over all h steps at once — one fused XLA kernel,
no factorizations (the 3×3 Euler-rate inverse is closed-form and the inertia
solve is a closed-form 3×3 inverse).

Documented deviations (all coincide at zero attitude, the reference's only
exercised configuration — see tests/test_srb.py):

- Euler state order: canonical [roll, pitch, yaw]; the reference's dynamics
  path reads [yaw, pitch, roll] (``:151-153``) while every other path reads
  [roll, pitch, yaw] — we canonicalize (config.py).
- The reference's rotation here is scipy *extrinsic* 'zyx' (``:154-156``)
  == Rx(roll)Ry(pitch)Rz(yaw); we use the canonical intrinsic ZYX.
- The world-inertia transform ``I_w = R.T @ I_body @ R`` (``:157``) is kept
  verbatim (note: the textbook form is R·I·Rᵀ; with R = body->world both
  agree at identity attitude — preserved for behavioral parity).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from biped_mpc_py_tpu.config import MpcConfig
from biped_mpc_py_tpu.models.biped import BipedParams
from biped_mpc_py_tpu.ops.linalg3 import inv3
from biped_mpc_py_tpu.ops.rotations import eul2rotm, euler_rate_matrix_inv, skew


def linearize(
    mpc: MpcConfig,
    biped: BipedParams,
    x_ref: jnp.ndarray,
    foot_ref: jnp.ndarray,
):
    """One-step linearization -> (A (13,13), B (13,12)).

    Parity: reference ``get_simplified_dynamics``
    (``bipedalLocomotionMPC.py:148-185``) modulo the documented convention
    deviations above.

    Args:
      x_ref: (13,) reference state [roll,pitch,yaw, p, w, v, 1].
      foot_ref: (6,) both feet world positions.
    """
    from biped_mpc_py_tpu.ops.linalg3 import mm3, mtm3

    dtype = x_ref.dtype
    pitch, yaw = x_ref[..., 1], x_ref[..., 2]
    Rot = eul2rotm(x_ref[..., 0:3])
    # reference form I_w = Rᵀ I_body R (``:157``); see module docstring.
    # diag(I_body) @ R is a row scale — no matmul needed.
    I_w = mtm3(Rot, jnp.asarray(biped.I_diag, dtype)[..., :, None] * Rot)
    I_w_inv = inv3(I_w)

    E_inv = euler_rate_matrix_inv(pitch, yaw)

    batch = x_ref.shape[:-1]
    eye3 = jnp.broadcast_to(jnp.eye(3, dtype=dtype), batch + (3, 3))
    z33 = jnp.zeros(batch + (3, 3), dtype)
    z31 = jnp.zeros(batch + (3, 1), dtype)
    g_col = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, -biped.g], dtype)[..., None], batch + (3, 1)
    )
    # assemble A = I + Ac dt by stacked blocks (no scatter ops: measured 3x
    # faster than .at[].set chains on TPU for horizon-batched builds)
    dt = jnp.asarray(mpc.dt, dtype)
    row0 = jnp.concatenate([eye3, z33, E_inv * dt, z33, z31], axis=-1)
    row1 = jnp.concatenate([z33, eye3, z33, eye3 * dt, z31], axis=-1)
    row2 = jnp.concatenate([z33, z33, eye3, z33, z31], axis=-1)
    row3 = jnp.concatenate([z33, z33, z33, eye3, g_col * dt], axis=-1)
    last = jnp.concatenate(
        [jnp.zeros(batch + (1, 12), dtype), jnp.ones(batch + (1, 1), dtype)],
        axis=-1,
    )
    A = jnp.concatenate([row0, row1, row2, row3, last], axis=-2)

    r1 = foot_ref[..., 0:3] - x_ref[..., 3:6]
    r2 = foot_ref[..., 3:6] - x_ref[..., 3:6]
    Iinv_dt = I_w_inv * dt
    m_eye = eye3 * (mpc.dt / biped.m)
    z3_12 = jnp.zeros(batch + (3, 12), dtype)
    brow2 = jnp.concatenate(
        [mm3(Iinv_dt, skew(r1)), mm3(Iinv_dt, skew(r2)), Iinv_dt, Iinv_dt],
        axis=-1,
    )
    brow3 = jnp.concatenate([m_eye, m_eye, z33, z33], axis=-1)
    B = jnp.concatenate(
        [z3_12, z3_12, brow2, brow3, jnp.zeros(batch + (1, 12), dtype)],
        axis=-2,
    )
    return A, B


def linearize_horizon(
    mpc: MpcConfig,
    biped: BipedParams,
    x_ref: jnp.ndarray,
    foot_ref: jnp.ndarray,
):
    """Linearize all h horizon steps at once -> (A (h,13,13), B (h,13,12)).

    Replaces the reference's per-step Python loop (``:197-200``);
    :func:`linearize` is shape-polymorphic over leading axes, so the whole
    horizon (and any env batch above it) is one fused stacked expression.

    Args:
      x_ref: (13, h) state reference.
      foot_ref: (6, h) foot reference.
    """
    return linearize(mpc, biped, x_ref.T, foot_ref.T)
