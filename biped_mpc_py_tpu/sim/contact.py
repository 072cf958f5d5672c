"""Soft (compliant) ground contact for the articulated engine.

MJX-style smooth contact: branch-free nonlinear spring-damper normal force
plus regularized Coulomb friction, so the whole step stays differentiable and
vmap/jit-friendly (no LCP branching — the TPU-correct choice for thousands of
parallel envs; SURVEY.md §7 stage 8):

  phi   = p_z                       (penetration depth when negative)
  f_n   = relu(-k·phi - d·phi_dot) · smooth_gate(phi)
  f_t   = -mu · f_n · v_t / sqrt(|v_t|^2 + v_slip^2)

The tangential law is a smooth (tanh-like) Coulomb cone: exact stiction is
approximated by a thin viscous band of width ``v_slip``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from biped_mpc_py_tpu.sim.model import ArticulatedModel


@struct.dataclass
class Terrain:
    """Height-field terrain z = h(x, y) on a regular grid, bilinear-sampled.

    A (H, W) grid spanning ``extent`` meters centered on the origin; outside
    the grid the terrain is flat at the edge value. ``Terrain.flat()`` is the
    z=0 plane (the default everywhere). Batched (vmapped) Terrains give
    per-env rough ground for domain-randomized rollouts (BASELINE config 4).

    Contact uses the TRUE surface normal from the height-field gradient
    (:meth:`normal`): the spring acts along the normal and the friction cone
    is projected into the local tangent plane, so a body resting on a slope
    feels a slope-normal reaction (tests/test_sim.py sloped-plane test).
    """

    heights: jnp.ndarray  # (H, W)
    extent: float = 8.0  # grid side length [m]

    @classmethod
    def flat(cls, res: int = 2, dtype=jnp.float32) -> "Terrain":
        return cls(heights=jnp.zeros((res, res), dtype))

    @classmethod
    def rough(
        cls, key: jax.Array, amplitude: float = 0.03, res: int = 64,
        smooth: int = 2, dtype=jnp.float32,
    ) -> "Terrain":
        """Random smooth bumps of the given amplitude (m)."""
        h = amplitude * jax.random.normal(key, (res, res), dtype)
        k = jnp.ones((smooth * 2 + 1, smooth * 2 + 1), dtype)
        k = k / jnp.sum(k)
        h = jax.scipy.signal.convolve2d(h, k, mode="same")
        return cls(heights=h)

    @classmethod
    def rough_batch(
        cls, key: jax.Array, n: int, amplitude: float = 0.03, res: int = 64,
        smooth: int = 2,
    ) -> "Terrain":
        """A batch of n independent rough terrains (leading env axis) — pair
        with randomize_params for fully domain-randomized rollouts."""
        keys = jax.random.split(key, n)
        return jax.vmap(
            lambda k: cls.rough(k, amplitude=amplitude, res=res, smooth=smooth)
        )(keys)

    def height(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        """Bilinear height sample at world (x, y) (broadcasting)."""
        H, W = self.heights.shape
        gx = (x / self.extent + 0.5) * (W - 1)
        gy = (y / self.extent + 0.5) * (H - 1)
        gx = jnp.clip(gx, 0.0, W - 1.001)
        gy = jnp.clip(gy, 0.0, H - 1.001)
        x0 = jnp.floor(gx).astype(jnp.int32)
        y0 = jnp.floor(gy).astype(jnp.int32)
        fx = gx - x0
        fy = gy - y0
        h00 = self.heights[y0, x0]
        h01 = self.heights[y0, x0 + 1]
        h10 = self.heights[y0 + 1, x0]
        h11 = self.heights[y0 + 1, x0 + 1]
        return (
            h00 * (1 - fx) * (1 - fy)
            + h01 * fx * (1 - fy)
            + h10 * (1 - fx) * fy
            + h11 * fx * fy
        )

    def normal(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        """Unit outward surface normal (..., 3) at world (x, y).

        n ∝ [-∂h/∂x, -∂h/∂y, 1] with the gradient from central finite
        differences of the bilinear height sample (half-cell step). For the
        flat default this is exactly e_z.
        """
        H, W = self.heights.shape
        eps_x = 0.5 * self.extent / (W - 1)
        eps_y = 0.5 * self.extent / (H - 1)
        dhdx = (self.height(x + eps_x, y) - self.height(x - eps_x, y)) / (
            2 * eps_x
        )
        dhdy = (self.height(x, y + eps_y) - self.height(x, y - eps_y)) / (
            2 * eps_y
        )
        n = jnp.stack([-dhdx, -dhdy, jnp.ones_like(dhdx)], axis=-1)
        return n / jnp.linalg.norm(n, axis=-1, keepdims=True)


def contact_force_world(
    model: ArticulatedModel,
    p_w: jnp.ndarray,
    v_w: jnp.ndarray,
    terrain: Terrain | None = None,
) -> jnp.ndarray:
    """World-frame contact force (…,3) at point(s) p_w with velocity v_w.

    Zero above the ground surface; smooth penalty below. ``terrain=None``
    means the z=0 plane. The normal spring/damper act along the LOCAL
    surface normal and the regularized Coulomb force lives in the tangent
    plane, so resting contact on a slope is slope-normal + in-plane
    friction (exactly vertical/horizontal on flat ground).
    """
    if terrain is None:
        ground = 0.0
        n = jnp.broadcast_to(
            jnp.array([0.0, 0.0, 1.0], p_w.dtype), p_w.shape
        )
    else:
        ground = terrain.height(p_w[..., 0], p_w[..., 1])
        n = terrain.normal(p_w[..., 0], p_w[..., 1])
    # signed gap along the normal: the vertical gap scaled by n_z (distance
    # from the tangent plane through the surface point below p)
    phi = (p_w[..., 2] - ground) * n[..., 2]
    phi_dot = jnp.sum(v_w * n, axis=-1)  # normal approach rate
    pen = jnp.maximum(-phi, 0.0)  # penetration depth >= 0
    # spring-damper, damping gated by contact; never adhesive
    f_n = jnp.maximum(
        model.contact_stiffness * pen
        - model.contact_damping * phi_dot * jnp.sign(pen),
        0.0,
    ) * (pen > 0)

    v_t = v_w - phi_dot[..., None] * n  # tangent-plane slip velocity (3,)
    speed = jnp.sqrt(jnp.sum(v_t * v_t, axis=-1) + model.contact_vslip**2)
    f_t = -model.contact_mu * f_n[..., None] * v_t / speed[..., None]
    return f_n[..., None] * n + f_t
