"""Low-level force/moment -> joint-torque mapping (L5/C13).

Parity: reference ``lowLevelControl`` (``bipedalLocomotionMPC.py:444-470``):
per leg, stance torque tau = Jmᵀ·(-[Rᵀf; Rᵀm]) gated by the first horizon
step's contact flag, plus swing torque tau = Jfᵀ·F_swing gated by its
complement. The reference's per-leg Python loop becomes a leg vmap; the
swing/stance branch is a multiply by the {0,1} contact flag exactly as in the
reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from biped_mpc_py_tpu.config import GaitConfig, MpcConfig
from biped_mpc_py_tpu.control.swing import swing_leg_force
from biped_mpc_py_tpu.models.biped import BipedParams
from biped_mpc_py_tpu.models.kinematics import leg_jacobians
from biped_mpc_py_tpu.ops.rotations import eul2rotm


def low_level_control(
    x_fb: jnp.ndarray,
    t,
    pf_w: jnp.ndarray,
    q: jnp.ndarray,
    qd: jnp.ndarray,
    mpc: MpcConfig,
    biped: BipedParams,
    contact: jnp.ndarray,
    u0: jnp.ndarray,
    gait: GaitConfig | None = None,
) -> jnp.ndarray:
    """Joint torques (10,) from the first MPC control.

    Args:
      pf_w: (6,) world foot positions (both legs).
      q, qd: (10,) joint positions/velocities.
      contact: (h,2) horizon contact flags (only row 0 is used, reference
        ``:446``).
      u0: (12,) first-step MPC control [f_l, f_r, m_l, m_r].
      gait: sets the swing clock's phase period (None = reference h/2
        relation).
    """
    R = eul2rotm(x_fb[0:3])
    c0 = contact[0, 0:2]
    sides = jnp.array([1.0, -1.0], dtype=q.dtype)

    def one_leg(q5, qd5, side, pf3, f3, m3, c):
        jm, jf = leg_jacobians(q5, side, biped.jac_geometry)
        vf_w = R.T @ (jf @ qd5)
        f_swing = swing_leg_force(x_fb, t, pf3, vf_w, mpc, side, gait)
        u_w = -jnp.concatenate([R.T @ f3, R.T @ m3])
        tau_stance = jm.T @ u_w
        tau_swing = jf.T @ f_swing
        return tau_stance * c + tau_swing * (1.0 - c)

    tau = jax.vmap(one_leg)(
        q.reshape(2, 5),
        qd.reshape(2, 5),
        sides,
        pf_w.reshape(2, 3),
        u0[0:6].reshape(2, 3),
        u0[6:12].reshape(2, 3),
        c0,
    )
    return tau.reshape(10)
