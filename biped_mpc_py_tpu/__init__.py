"""biped_mpc_py_tpu — a TPU-native biped locomotion-control framework.

A brand-new JAX/XLA/Pallas/pjit engine with the capabilities of the reference
``junhengl/biped_mpc_py`` (HECTOR force-and-moment MPC + low-level control,
reference file ``bipedalLocomotionMPC.py``), re-designed TPU-first:

- every stage (gait schedule, CoM/foot references, SRB linearization, QP
  assembly + solve, swing-leg PD, Jacobian-transpose torque mapping, simulator
  step) is a pure function of pytrees, jit-compiled into ONE XLA program per
  control tick with zero host round-trips;
- the MPC QP is *condensed* to a controls-only dense QP (lossless for the
  reference's constraint structure, see ``ops/qp.py``) and solved by an
  on-device ADMM (BoxOSQP-style) method whose iterations are batched matmuls
  on the MXU;
- thousands of environments batch via ``jax.vmap`` and shard across a TPU
  slice with ``jax.sharding``/``shard_map`` (see ``parallel/``).

Layer map (mirrors SURVEY.md §1):
  L0 config            -> :mod:`biped_mpc_py_tpu.config`, :mod:`biped_mpc_py_tpu.models.biped`
  L1 math utilities    -> :mod:`biped_mpc_py_tpu.ops.rotations`
  L2 kinematics        -> :mod:`biped_mpc_py_tpu.models.kinematics`
  L3 planning/refs     -> :mod:`biped_mpc_py_tpu.control.gait`, :mod:`biped_mpc_py_tpu.control.reference`
  L4 MPC (dyn + QP)    -> :mod:`biped_mpc_py_tpu.models.srb`, :mod:`biped_mpc_py_tpu.ops.qp`,
                          :mod:`biped_mpc_py_tpu.control.mpc`
  L5 low-level control -> :mod:`biped_mpc_py_tpu.control.swing`, :mod:`biped_mpc_py_tpu.control.lowlevel`
  L6 driver            -> :mod:`biped_mpc_py_tpu.control.controller`, :mod:`biped_mpc_py_tpu.sim`
"""

from biped_mpc_py_tpu.config import (
    GaitConfig,
    MpcConfig,
    default_mpc_config,
    fast_mpc_config,
    reference_compat_config,
)
from biped_mpc_py_tpu.models.biped import (
    BipedParams,
    HECTOR_LEG_FK,
    HECTOR_LEG_JAC,
    LegGeometry,
)

__version__ = "0.1.0"


def __getattr__(name):
    # lazy convenience re-exports (avoid importing the full stack eagerly)
    lazy = {
        "solve_mpc": ("biped_mpc_py_tpu.control.mpc", "solve_mpc"),
        "control_tick": ("biped_mpc_py_tpu.control.controller", "control_tick"),
        "rollout_fn": ("biped_mpc_py_tpu.parallel.rollout", "rollout_fn"),
        "art_rollout_fn": (
            "biped_mpc_py_tpu.parallel.rollout_art", "art_rollout_fn",
        ),
        "art_mpc_config": (
            "biped_mpc_py_tpu.parallel.rollout_art", "art_mpc_config",
        ),
        "gait_for_speed": ("biped_mpc_py_tpu.control.gait", "gait_for_speed"),
        "batched_rollout_fn": (
            "biped_mpc_py_tpu.parallel.rollout", "batched_rollout_fn",
        ),
        "solve_qp_batch": ("biped_mpc_py_tpu.ops.qp", "solve_qp_batch"),
        "ns_inverse": ("biped_mpc_py_tpu.ops.qp", "ns_inverse"),
        "art_config_for_speed": (
            "biped_mpc_py_tpu.parallel.rollout_art", "art_config_for_speed",
        ),
        "art_config_for_turn": (
            "biped_mpc_py_tpu.parallel.rollout_art", "art_config_for_turn",
        ),
        "Terrain": ("biped_mpc_py_tpu.sim.contact", "Terrain"),
        "run_mujoco_closed_loop": (
            "biped_mpc_py_tpu.sim.mj_driver", "run_mujoco_closed_loop",
        ),
    }
    if name in lazy:
        import importlib

        mod, attr = lazy[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(name)


__all__ = [
    "MpcConfig",
    "GaitConfig",
    "BipedParams",
    "LegGeometry",
    "HECTOR_LEG_FK",
    "HECTOR_LEG_JAC",
    "default_mpc_config",
    "fast_mpc_config",
    "reference_compat_config",
    "gait_for_speed",
    "batched_rollout_fn",
    "solve_qp_batch",
    "ns_inverse",
    "solve_mpc",
    "control_tick",
    "rollout_fn",
    "art_rollout_fn",
    "art_mpc_config",
    "art_config_for_speed",
    "art_config_for_turn",
    "Terrain",
    "run_mujoco_closed_loop",
    "__version__",
]
