"""The fused control tick (L6): state feedback -> joint torques.

The reference's "main script" (``bipedalLocomotionMPC.py:473-495``) runs FK ->
contact schedule -> solve_mpc -> lowLevelControl once, at the host level, with
prints between stages. Here the same pipeline is ONE pure function
(:func:`control_tick`) designed to be jitted (whole tick = one XLA program,
zero host round-trips), vmapped (thousands of envs), and scanned (rollouts).

The controller is stateless except for the explicit :class:`ControllerState`
pytree (ADMM warm start). Checkpoint/resume of a rollout is therefore just
serializing pytrees (SURVEY.md §5).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from biped_mpc_py_tpu.config import GaitConfig, MpcConfig
from biped_mpc_py_tpu.control.gait import contact_sequence
from biped_mpc_py_tpu.control.lowlevel import low_level_control
from biped_mpc_py_tpu.control.mpc import solve_mpc
from biped_mpc_py_tpu.models.biped import BipedParams
from biped_mpc_py_tpu.models.kinematics import foot_positions_world
from biped_mpc_py_tpu.ops.qp import QpSolution


@struct.dataclass
class ControllerState:
    """Carried across ticks: the previous QP solution (ADMM warm start)."""

    qp: QpSolution

    @classmethod
    def init(cls, mpc: MpcConfig, dtype=jnp.float32) -> "ControllerState":
        h = mpc.h
        zero = jnp.zeros
        return cls(
            qp=QpSolution(
                controls=zero((h, 12), dtype),
                states=zero((h, 13), dtype),
                z=zero((h, 24), dtype),
                y=zero((h, 24), dtype),
                res_prim=jnp.asarray(0.0, dtype),
                res_dual=jnp.asarray(0.0, dtype),
            )
        )


def control_tick(
    x_fb: jnp.ndarray,
    q: jnp.ndarray,
    qd: jnp.ndarray,
    t,
    mpc: MpcConfig,
    gait: GaitConfig,
    biped: BipedParams,
    ctrl_state: ControllerState | None = None,
):
    """One full control tick.

    Equivalent to the reference main script's stage chain (``:477-494``).

    Args:
      x_fb: (12,) state [roll,pitch,yaw, p, w, v].
      q, qd: (10,) joint positions / velocities.
      t: scalar time [s].
      ctrl_state: previous tick's state for warm starting (None = cold).

    Returns:
      (tau (10,), new ControllerState, QpSolution).
    """
    pf_w = foot_positions_world(x_fb, q, biped)
    contact = contact_sequence(t, mpc, gait)
    warm = None if ctrl_state is None else ctrl_state.qp
    sol = solve_mpc(x_fb, t, pf_w, mpc, biped, contact, warm=warm, gait=gait)
    tau = low_level_control(
        x_fb, t, pf_w, q, qd, mpc, biped, contact, sol.controls[0], gait=gait
    )
    return tau, ControllerState(qp=sol), sol
