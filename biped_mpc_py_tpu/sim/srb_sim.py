"""Single-rigid-body stub simulator (build plan stage 7, SURVEY.md §7).

The reference has NO simulator (its README lists one as TODO,
``README.md:7``); the first closed-loop milestone integrates the MPC's own
nonlinear SRB model so the controller can be validated in-loop before the
articulated-body engine (sim/engine.py) lands:

  omega_dot = I_w^{-1} (sum_i skew(r_i) f_i + m_i)         (world frame)
  v_dot     = sum_i f_i / m - g e_z
  eul_dot   = E(pitch,yaw)^{-1} omega
  p_dot     = v

Swing feet are moved kinematically along the swing controller's own Raibert +
sinusoid trajectory (control/swing.py), stance feet stay planted — the
standard SRB walking abstraction. Everything is branch-free (contact gating
by jnp.where), so the whole sim+control tick fuses under jit/vmap/scan.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from biped_mpc_py_tpu.config import GaitConfig, MpcConfig
from biped_mpc_py_tpu.control.gait import contact_sequence, phase_index
from biped_mpc_py_tpu.control.reference import _raibert_xy
from biped_mpc_py_tpu.control.swing import Y_OFFSET
from biped_mpc_py_tpu.models.biped import BipedParams
from biped_mpc_py_tpu.ops.linalg3 import inv3
from biped_mpc_py_tpu.ops.rotations import eul2rotm, euler_rate_matrix_inv, skew


@struct.dataclass
class SrbState:
    """World state of the SRB abstraction (one env; vmap for batches)."""

    x_fb: jnp.ndarray  # (12,) [roll,pitch,yaw, p, w_world, v_world]
    foot: jnp.ndarray  # (6,) world foot positions [left, right]
    t: jnp.ndarray  # scalar time [s]

    @classmethod
    def standing(
        cls, z0: float = 0.53, foot_y: float = 0.09, dtype=jnp.float32
    ) -> "SrbState":
        # leg 0 is the +y leg (side=+1): the reference's default pose puts it
        # at pf_w ≈ [-0.02, +0.09, 0] (FK of bipedalLocomotionMPC.py:15)
        x = jnp.zeros(12, dtype).at[5].set(z0)
        foot = jnp.asarray([-0.02, foot_y, 0.0, -0.02, -foot_y, 0.0], dtype)
        return cls(x_fb=x, foot=foot, t=jnp.asarray(0.0, dtype))


def srb_step(
    state: SrbState,
    u: jnp.ndarray,
    mpc: MpcConfig,
    gait: GaitConfig,
    biped: BipedParams,
    n_substeps: int = 4,
) -> SrbState:
    """Advance the SRB world by one MPC period dt under control u (12,)."""
    dt_sub = mpc.dt / n_substeps
    x = state.x_fb
    f1, f2 = u[0:3], u[3:6]
    m1, m2 = u[6:9], u[9:12]

    def substep(x, _):
        R = eul2rotm(x[0:3])
        I_w = R.T @ jnp.diag(jnp.asarray(biped.I_diag, x.dtype)) @ R
        I_w_inv = inv3(I_w)
        r1 = state.foot[0:3] - x[3:6]
        r2 = state.foot[3:6] - x[3:6]
        torque = skew(r1) @ f1 + skew(r2) @ f2 + m1 + m2
        w_dot = I_w_inv @ torque
        v_dot = (f1 + f2) / biped.m - jnp.array(
            [0.0, 0.0, biped.g], x.dtype
        )
        E_inv = euler_rate_matrix_inv(x[1], x[2])
        eul_dot = E_inv @ x[6:9]
        x_new = jnp.concatenate(
            [
                x[0:3] + eul_dot * dt_sub,
                x[3:6] + x[9:12] * dt_sub,
                x[6:9] + w_dot * dt_sub,
                x[9:12] + v_dot * dt_sub,
            ]
        )
        return x_new, None

    x_new, _ = jax.lax.scan(substep, x, None, length=n_substeps)

    t_new = state.t + mpc.dt
    foot_new = _advance_feet(state, x_new, t_new, mpc, gait)
    return SrbState(x_fb=x_new, foot=foot_new, t=t_new)


def _advance_feet(
    state: SrbState, x_new: jnp.ndarray, t_new, mpc: MpcConfig, gait: GaitConfig
) -> jnp.ndarray:
    """Kinematic swing-foot motion; stance feet stay planted.

    A swing foot tracks the swing controller's target (Raibert xy + sinusoid
    z, control/swing.py); on touch-down (contact flag flips to stance) it is
    dropped to the ground plane.
    """
    from biped_mpc_py_tpu.control.swing import swing_phase_z, swing_target_xy

    contact_now = contact_sequence(t_new, mpc, gait)[0]  # (2,)

    sides = jnp.array([1.0, -1.0], x_new.dtype)  # leg 0 (+y offset), leg 1

    def one_foot(foot3, c, side):
        fx, fy = swing_target_xy(x_new, mpc, side, gait)
        # per-foot clock: identical for both feet while walking, per-leg
        # for running gaits (flight_steps > 0, both feet airborne)
        fz = swing_phase_z(t_new, mpc, gait, x_new.dtype, side=side)
        target = jnp.stack([fx, fy, fz])
        # swing: track target; stance: stay planted on the ground plane
        swing_pos = target
        stance_pos = foot3.at[2].set(0.0)
        return jnp.where(c > 0.5, stance_pos, swing_pos)

    feet = jax.vmap(one_foot)(
        state.foot.reshape(2, 3), contact_now, sides
    )
    return feet.reshape(6)
