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

import jax.numpy as jnp

from biped_mpc_py_tpu.sim.model import ArticulatedModel


def contact_force_world(
    model: ArticulatedModel, p_w: jnp.ndarray, v_w: jnp.ndarray
) -> jnp.ndarray:
    """World-frame contact force (…,3) at point(s) p_w with velocity v_w.

    Zero above the ground plane z=0; smooth penalty below.
    """
    phi = p_w[..., 2]
    phi_dot = v_w[..., 2]
    pen = jnp.maximum(-phi, 0.0)  # penetration depth >= 0
    # spring-damper, damping gated by contact; never adhesive
    f_n = jnp.maximum(
        model.contact_stiffness * pen
        - model.contact_damping * phi_dot * jnp.sign(pen),
        0.0,
    ) * (pen > 0)

    v_t = v_w[..., 0:2]
    speed = jnp.sqrt(jnp.sum(v_t * v_t, axis=-1) + model.contact_vslip**2)
    f_t = -model.contact_mu * f_n[..., None] * v_t / speed[..., None]
    return jnp.concatenate([f_t, f_n[..., None]], axis=-1)
