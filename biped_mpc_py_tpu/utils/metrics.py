"""On-device metric accumulators (SURVEY.md §5 observability).

The reference's only observability is print() (``bipedalLocomotionMPC.py:
190-192, 488-495``). Here metrics are a pytree accumulated on-device inside
the rollout scan and reduced across devices with psum — one host transfer at
the end of a rollout, not per tick.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class RolloutMetrics:
    """Running sums over a rollout (divide by n_steps at the end)."""

    n_steps: jnp.ndarray  # scalar count
    height_err_sq: jnp.ndarray  # sum of (z - z_cmd)^2
    attitude_err_sq: jnp.ndarray  # sum of ||[roll,pitch]||^2
    vel_err_sq: jnp.ndarray  # sum of ||v - v_cmd||^2
    fz_total: jnp.ndarray  # sum of total vertical contact force
    res_prim_max: jnp.ndarray  # max ADMM primal residual seen
    falls: jnp.ndarray  # number of fall/reset events
    # positive mechanical joint work [J] (sum of max(tau*qd, 0) dt over
    # the low-level steps — motors don't regenerate). Articulated
    # rollouts accumulate it; SRB rollouts have no joints and leave it 0.
    energy: jnp.ndarray

    @classmethod
    def zeros(cls, dtype=jnp.float32) -> "RolloutMetrics":
        z = jnp.asarray(0.0, dtype)
        return cls(
            n_steps=z, height_err_sq=z, attitude_err_sq=z, vel_err_sq=z,
            fz_total=z, res_prim_max=z, falls=z, energy=z,
        )

    def update(
        self, x_fb: jnp.ndarray, x_cmd: jnp.ndarray, u0: jnp.ndarray,
        res_prim: jnp.ndarray, fell: jnp.ndarray, energy=0.0,
    ) -> "RolloutMetrics":
        return RolloutMetrics(
            n_steps=self.n_steps + 1,
            height_err_sq=self.height_err_sq + (x_fb[5] - x_cmd[5]) ** 2,
            attitude_err_sq=self.attitude_err_sq
            + jnp.sum(x_fb[0:2] ** 2),
            vel_err_sq=self.vel_err_sq
            + jnp.sum((x_fb[9:12] - x_cmd[9:12]) ** 2),
            fz_total=self.fz_total + u0[2] + u0[5],
            res_prim_max=jnp.maximum(self.res_prim_max, res_prim),
            falls=self.falls + fell,
            energy=self.energy + energy,
        )


def cost_of_transport(energy_j, mass_kg, distance_m, g: float = 9.81):
    """Dimensionless mechanical cost of transport E / (m g d) — the
    standard locomotion-efficiency figure (human walking ~0.2, typical
    small bipeds 0.5-3 in positive mechanical work terms). ``distance_m``
    may be signed (backward walking uses its magnitude)."""
    return energy_j / (mass_kg * g * jnp.maximum(jnp.abs(distance_m), 1e-9))
