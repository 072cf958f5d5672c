"""HECTOR biped model parameters (L0).

Mirrors the reference ``class Biped`` (``bipedalLocomotionMPC.py:34-48``) as a
frozen pytree so a *population* of randomized robots is just a batched
``BipedParams`` (domain randomization = vmap over the leaves).

Leg geometry
------------
The reference ships TWO mutually inconsistent symbolically-generated leg
models:

- the forward kinematics ``getFootPositionBody``
  (``bipedalLocomotionMPC.py:367-404``) corresponds to a serial chain
  Rz(q0)·Rx(q1)·Ry(q2)·Ry(q3)·Ry(q4) with hip offset (-0.015, +0.020·side,
  -0.060), abduction offset (0, +0.023·side, 0), thigh/shank 0.22/0.22 and
  foot link 0.036;
- the motor Jacobian ``getLegKinematics`` (``:306-365``) corresponds to the
  same chain *structure* but with hip offset (-0.0135, -0.015·side, ·),
  abduction offset (0, -0.018·side - 0.0025, 0) and foot link 0.040.

Rather than transcribing either 60-line symbolic expansion, this framework
defines the chain ONCE (:mod:`biped_mpc_py_tpu.models.kinematics`) and derives
Jacobians by ``jax.jacfwd`` — so FK and Jacobians are always consistent *with
each other*. Both reference constant sets are provided as presets so parity
tests can match either reference function to machine precision:

- :data:`HECTOR_LEG_FK` reproduces ``getFootPositionBody`` exactly;
- :data:`HECTOR_LEG_JAC` makes ``jacfwd`` of our FK reproduce the reference's
  hand-exported ``Jm`` exactly (columns 0-4, rows 0-5).

The default geometry on :class:`BipedParams` is :data:`HECTOR_LEG_FK` (the FK
determines where the feet actually are, which is what the QP consumes).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class LegGeometry:
    """Constants of the 5-DoF HECTOR leg serial chain.

    Chain (all in body frame, leg ``side`` = +1 for leg 0, -1 for leg 1,
    matching reference ``bipedalLocomotionMPC.py:415-418``):

      p_hip  = hip_xyz with y mirrored by side            (before hip yaw q0)
      Rz(q0) -> translate abd_xyz (y mirrored + y_const)  (hip yaw)
      Rx(q1) -> Ry(q2) -> translate (0,0,-l_thigh)        (hip roll, hip pitch)
      Ry(q3) -> translate (0,0,-l_shank)                  (knee)
      Ry(q4) -> translate (0,0,-l_foot)                   (ankle)
    """

    # offset applied before the hip-yaw joint: (x, y·side, z)
    hip_x: float = -0.015
    hip_y: float = 0.020
    hip_z: float = -0.060
    # offset between hip yaw and hip roll: (0, abd_y·side + abd_y_const, 0)
    abd_y: float = 0.023
    abd_y_const: float = 0.0
    # link lengths [m]
    l_thigh: float = 0.22
    l_shank: float = 0.22
    l_foot: float = 0.036


# Reproduces reference getFootPositionBody (bipedalLocomotionMPC.py:367-404).
HECTOR_LEG_FK = LegGeometry()

# Makes jacfwd(FK) reproduce reference getLegKinematics Jm
# (bipedalLocomotionMPC.py:306-365). hip_z is unobservable in Jm (constant
# offsets vanish under differentiation); we keep the FK value.
HECTOR_LEG_JAC = LegGeometry(
    hip_x=-0.0135,
    hip_y=-0.015,
    hip_z=-0.060,
    abd_y=-0.018,
    abd_y_const=-0.0025,
    l_foot=0.040,
)


@struct.dataclass
class BipedParams:
    """Single-rigid-body + contact-geometry parameters of the HECTOR biped.

    Mirrors reference ``class Biped`` (``bipedalLocomotionMPC.py:34-48``).
    """

    # total mass [kg]
    m: float = 12.0
    # body-frame inertia diagonal [kg m^2]
    I_diag: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.array([0.932, 0.9420, 0.0711], jnp.float32)
    )
    # toe / heel lever arms of the line foot [m]
    lt: float = 0.09
    lh: float = 0.05
    # gravity [m/s^2]
    g: float = 9.81
    # hip offset from CoM, y mirrored per side (reference ``:43, 421``)
    hip_offset: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.array([-0.005, 0.047, -0.126], jnp.float32)
    )
    # friction coefficient
    mu: float = 0.5
    # per-foot force bounds [N] (applied per-axis, contact-gated)
    f_max: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.array([500.0, 500.0, 500.0], jnp.float32)
    )
    f_min: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.zeros((3,), jnp.float32)
    )
    # per-foot moment bounds [N m] (tau_min = -tau_max, reference ``:48``)
    tau_max: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.array([0.0, 67.0, 33.5], jnp.float32)
    )
    # leg geometry (static structure, dynamic leaves)
    leg: LegGeometry = struct.field(default_factory=lambda: HECTOR_LEG_FK)
    # optional separate geometry for Jacobians. None (default) = use ``leg``
    # (self-consistent). Parity tests set ``leg_jac=HECTOR_LEG_JAC`` to
    # replicate the reference's FK/Jacobian mismatch exactly.
    leg_jac: LegGeometry | None = None

    @property
    def jac_geometry(self) -> LegGeometry:
        return self.leg if self.leg_jac is None else self.leg_jac

    @property
    def I_body(self) -> jnp.ndarray:
        """Body-frame inertia tensor (3,3)."""
        return jnp.diag(self.I_diag)
