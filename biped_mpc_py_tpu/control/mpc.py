"""MPC hot path (L4): references -> linearization -> condensed QP -> solve.

Equivalent of the reference's ``solve_mpc`` (``bipedalLocomotionMPC.py:
187-304``), as one pure jittable function. Differences by design:

- the per-step linearization loop (``:197-200``) is a horizon vmap;
- the 250-var sparse QP + cvxopt IPM (``:203-297``) is a 120-var condensed
  dense QP + fixed-iteration on-device ADMM (see ops/qp.py for why this is
  the TPU-correct formulation);
- no prints, no host transfers: the whole thing traces into the caller's XLA
  program and vmaps over env batches.
"""

from __future__ import annotations

import jax.numpy as jnp

from biped_mpc_py_tpu.config import GaitConfig, MpcConfig
from biped_mpc_py_tpu.control.reference import com_reference, foot_reference
from biped_mpc_py_tpu.models.biped import BipedParams
from biped_mpc_py_tpu.models.srb import linearize_horizon
from biped_mpc_py_tpu.ops.qp import CondensedQp, QpSolution, condense, solve_qp


def build_mpc_qp(
    x_fb: jnp.ndarray,
    t,
    foot: jnp.ndarray,
    mpc: MpcConfig,
    biped: BipedParams,
    contact: jnp.ndarray,
    gait: GaitConfig | None = None,
    cmd_ref: jnp.ndarray | None = None,
    foot_yaw: jnp.ndarray | None = None,
    terrain=None,
    v_int: jnp.ndarray | None = None,
    pitch_ref: jnp.ndarray | None = None,
) -> CondensedQp:
    """Assemble the condensed MPC QP for one tick (no solve).

    ``gait`` sets the foot-reference Raibert lookaheads to the configured
    cadence (None = the reference's hard-coded h/2 relation); ``cmd_ref``
    anchors the body-frame command arc (controller.advance_cmd_ref);
    ``foot_yaw`` (2,) = measured absolute foot headings for foot-frame
    wrench constraints (ops/qp.py::condense; None = the reference's
    body-aligned rows).
    """
    if terrain is None:
        z_ground = 0.0
    else:
        # local ground height = mean terrain height under the two feet —
        # the support surface the commanded CoM height x_cmd[5] rides on
        z_ground = 0.5 * (
            terrain.height(foot[0], foot[1]) + terrain.height(foot[3], foot[4])
        )
    x_ref = com_reference(
        x_fb, mpc, cmd_ref, z_ground=z_ground, v_int=v_int,
        pitch_ref=pitch_ref,
    )
    foot_ref = foot_reference(
        x_fb, t, foot, mpc, contact, gait, terrain, v_int=v_int
    )
    A, B = linearize_horizon(mpc, biped, x_ref, foot_ref)
    return condense(mpc, biped, x_fb, x_ref, A, B, contact, foot_yaw)


def solve_mpc(
    x_fb: jnp.ndarray,
    t,
    foot: jnp.ndarray,
    mpc: MpcConfig,
    biped: BipedParams,
    contact: jnp.ndarray,
    warm: QpSolution | None = None,
    gait: GaitConfig | None = None,
    cmd_ref: jnp.ndarray | None = None,
    foot_yaw: jnp.ndarray | None = None,
    terrain=None,
    v_int: jnp.ndarray | None = None,
    pitch_ref: jnp.ndarray | None = None,
) -> QpSolution:
    """One MPC solve -> :class:`QpSolution` with (h,13) states, (h,12)
    controls, ADMM iterates (reusable as next tick's warm start), and
    primal/dual residuals (the failure-detection signal the reference never
    checks — it reads cvxopt's ``['x']`` unconditionally, ``:300``)."""
    qp = build_mpc_qp(
        x_fb, t, foot, mpc, biped, contact, gait, cmd_ref, foot_yaw, terrain,
        v_int, pitch_ref,
    )
    return solve_qp(qp, mpc, warm)
