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
from biped_mpc_py_tpu.ops.rotations import eul2rotm, euler_rate_matrix_inv, skew


def _inv3(M: jnp.ndarray) -> jnp.ndarray:
    """Closed-form 3x3 inverse (adjugate / determinant) — fuses on the VPU."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    inv_det = 1.0 / det
    row0 = jnp.stack([A, -(b * i - c * h), b * f - c * e], -1)
    row1 = jnp.stack([B, a * i - c * g, -(a * f - c * d)], -1)
    row2 = jnp.stack([C, -(a * h - b * g), a * e - b * d], -1)
    return jnp.stack([row0, row1, row2], -2) * inv_det[..., None, None]


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
    dtype = x_ref.dtype
    roll, pitch, yaw = x_ref[0], x_ref[1], x_ref[2]
    Rot = eul2rotm(x_ref[0:3])
    I_body = jnp.diag(jnp.asarray(biped.I_diag, dtype))
    # reference form (``:157``); see module docstring
    I_w = Rot.T @ I_body @ Rot
    I_w_inv = _inv3(I_w)

    E_inv = euler_rate_matrix_inv(pitch, yaw)

    Ac = jnp.zeros((13, 13), dtype)
    Ac = Ac.at[0:3, 6:9].set(E_inv)
    Ac = Ac.at[3:6, 9:12].set(jnp.eye(3, dtype=dtype))
    Ac = Ac.at[11, 12].set(-biped.g)

    r1 = foot_ref[0:3] - x_ref[3:6]
    r2 = foot_ref[3:6] - x_ref[3:6]
    Bc = jnp.zeros((13, 12), dtype)
    Bc = Bc.at[6:9, 0:3].set(I_w_inv @ skew(r1))
    Bc = Bc.at[6:9, 3:6].set(I_w_inv @ skew(r2))
    Bc = Bc.at[6:9, 6:9].set(I_w_inv)
    Bc = Bc.at[6:9, 9:12].set(I_w_inv)
    m_inv = 1.0 / biped.m
    Bc = Bc.at[9:12, 0:3].set(jnp.eye(3, dtype=dtype) * m_inv)
    Bc = Bc.at[9:12, 3:6].set(jnp.eye(3, dtype=dtype) * m_inv)

    A = jnp.eye(13, dtype=dtype) + Ac * mpc.dt
    B = Bc * mpc.dt
    return A, B


def linearize_horizon(
    mpc: MpcConfig,
    biped: BipedParams,
    x_ref: jnp.ndarray,
    foot_ref: jnp.ndarray,
):
    """Linearize all h horizon steps at once -> (A (h,13,13), B (h,13,12)).

    Replaces the reference's per-step Python loop (``:197-200``) with a vmap
    over the horizon axis; XLA fuses the whole thing into one kernel.

    Args:
      x_ref: (13, h) state reference.
      foot_ref: (6, h) foot reference.
    """
    return jax.vmap(lambda x, f: linearize(mpc, biped, x, f))(x_ref.T, foot_ref.T)
