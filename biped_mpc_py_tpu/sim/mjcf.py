"""MJCF export of the articulated HECTOR model.

Generates a MuJoCo XML mirroring sim/model.py exactly (same tree, offsets,
axes, inertials). Used by the test suite as an *oracle*: trajectories of the
in-framework Featherstone engine are validated against MuJoCo CPU forward
dynamics on the same model (SURVEY.md §7 stage 8 validation), and the file
doubles as a visualization/export artifact for users with MuJoCo viewers.
"""

from __future__ import annotations

import numpy as np

from biped_mpc_py_tpu.sim.model import (
    JOINT_AXES,
    LEFT,
    PARENT,
    RIGHT,
    TORSO,
    ArticulatedModel,
)

_BODY_NAMES = [
    "torso",
    "l_hip_yaw", "l_hip_roll", "l_thigh", "l_shank", "l_foot",
    "r_hip_yaw", "r_hip_roll", "r_thigh", "r_shank", "r_foot",
]


def _fmt(v) -> str:
    return " ".join(f"{float(x):.9g}" for x in np.asarray(v).reshape(-1))


def to_mjcf(model: ArticulatedModel, timestep: float = 1e-4) -> str:
    """MJCF XML string of the model (no collision geoms; flight dynamics)."""
    mass = np.asarray(model.mass)
    com = np.asarray(model.com)
    inertia = np.asarray(model.inertia)
    offs = np.asarray(model.joint_offset)

    def body_xml(i: int, indent: str) -> str:
        name = _BODY_NAMES[i]
        diag = np.diag(inertia[i])
        pos = offs[i - 1] if i != TORSO else np.zeros(3)
        lines = [f'{indent}<body name="{name}" pos="{_fmt(pos)}">']
        if i == TORSO:
            lines.append(f'{indent}  <freejoint name="root"/>')
        else:
            axis = JOINT_AXES[i - 1]
            lines.append(
                f'{indent}  <joint name="j_{name}" type="hinge" '
                f'axis="{_fmt(axis)}" damping="0" '
                f'armature="{float(model.armature):.9g}"/>'
            )
        lines.append(
            f'{indent}  <inertial pos="{_fmt(com[i])}" mass="{mass[i]:.9g}" '
            f'diaginertia="{_fmt(diag)}"/>'
        )
        for child in range(len(PARENT)):
            if PARENT[child] == i:
                lines.append(body_xml(child, indent + "  "))
        lines.append(f"{indent}</body>")
        return "\n".join(lines)

    return f"""<mujoco model="hector_tpu">
  <option timestep="{timestep}" gravity="0 0 -9.81"/>
  <compiler inertiafromgeom="false"/>
  <worldbody>
{body_xml(TORSO, "    ")}
  </worldbody>
</mujoco>
"""
