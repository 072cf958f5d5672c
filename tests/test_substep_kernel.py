"""Parity pins for the fused articulated-substep Pallas kernel.

ops/pallas/substep_kernel.py runs the whole per-low-level-period physics
substep chain (contact -> joint limits -> RNEA bias -> Minv matvec ->
semi-implicit Euler) as ONE kernel launch on a VMEM-resident SoA env
block. These tests pin (a) chain-level parity against the XLA path
(sim/engine.py::art_substep) at f32 roundoff, and (b) closed-loop
equivalence of parallel/rollout_art.py::batched_art_rollout_kernel_fn
against the XLA bench path it replaces.

On CPU the kernel runs in Pallas interpret mode (same code path,
reference semantics); the Mosaic-compiled TPU run was validated on
hardware (27.0 -> 3.2 ms per 1024-env chain, docs/DESIGN_NOTES.md
round 5). No reference counterpart: the reference has no simulator
(``README.md:7`` TODO).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from biped_mpc_py_tpu.config import GaitConfig
from biped_mpc_py_tpu.models.biped import BipedParams
from biped_mpc_py_tpu.ops.pallas.substep_kernel import fused_substeps
from biped_mpc_py_tpu.parallel.rollout_art import (
    art_mpc_config,
    batched_art_rollout_fn,
    batched_art_rollout_kernel_fn,
    init_art_world,
)
from biped_mpc_py_tpu.sim.engine import ArtState, art_substep, mass_matrix_inv
from biped_mpc_py_tpu.sim.model import hector_model

N_ENVS = 1024  # the kernel's env-block tile (8 sublanes x 128 lanes)


def _perturbed_states(key, n):
    """Batch of perturbed near-standing states with feet in contact."""
    base = ArtState.standing()
    ks = jax.random.split(key, 6)
    pos = base.pos + 0.02 * jax.random.normal(ks[0], (n, 3))
    pos = pos.at[:, 2].add(-0.03)  # push soles into the plane
    quat = base.quat + 0.02 * jax.random.normal(ks[1], (n, 4))
    quat = quat / jnp.linalg.norm(quat, axis=1, keepdims=True)
    return ArtState(
        pos=pos,
        quat=quat,
        v_base=0.3 * jax.random.normal(ks[2], (n, 6)),
        q=base.q + 0.05 * jax.random.normal(ks[3], (n, 10)),
        qd=0.5 * jax.random.normal(ks[4], (n, 10)),
        t=jnp.zeros(n),
    ), 5.0 * jax.random.normal(ks[5], (n, 10))


def test_substep_kernel_parity():
    """5-substep chain, 1024 perturbed in-contact envs: kernel == XLA
    path at f32 roundoff (hardware-measured max |qd| error 1.2e-5)."""
    model = hector_model()
    st, tau = _perturbed_states(jax.random.PRNGKey(0), N_ENVS)
    Minv = jax.vmap(lambda q: mass_matrix_inv(model, q))(st.q)
    dt, n_steps = 0.005, 5

    def xla_chain(s, tau, Minv):
        for _ in range(n_steps):
            s = art_substep(model, s, tau, dt / n_steps, Minv=Minv)
        return s

    ref = jax.jit(jax.vmap(xla_chain))(st, tau, Minv)
    out = fused_substeps(model, st, tau, Minv, dt, n_steps)
    for name, tol in [
        ("pos", 5e-7), ("quat", 1e-6), ("v_base", 5e-6),
        ("q", 1e-6), ("qd", 1e-4),
    ]:
        err = float(
            jnp.abs(getattr(ref, name) - getattr(out, name)).max()
        )
        assert err < tol, (name, err)
    assert float(jnp.abs(ref.t - out.t).max()) < 1e-6


def test_substep_kernel_rejects_partial_block():
    model = hector_model()
    st, tau = _perturbed_states(jax.random.PRNGKey(1), 8)
    Minv = jax.vmap(lambda q: mass_matrix_inv(model, q))(st.q)
    with pytest.raises(AssertionError):
        fused_substeps(model, st, tau, Minv, 0.005, 5)


@pytest.mark.slow
def test_kernel_rollout_matches_xla():
    """3 closed-loop MPC ticks x 1024 envs: the kernel rollout variant
    tracks the XLA bench path (n_substeps=5, minv_ll_hold=8) within
    contact-chaos roundoff growth, with identical fall counts (0)."""
    mpc = art_mpc_config(x_cmd=jnp.zeros(12).at[5].set(0.55).at[9].set(0.2))
    gait = GaitConfig()
    n_ticks = 3
    worlds = jax.vmap(lambda _: init_art_world(mpc))(jnp.arange(N_ENVS))
    # desync the envs so the batch isn't 1024 identical rollouts
    key = jax.random.PRNGKey(2)
    worlds = dataclasses.replace(
        worlds,
        sim=dataclasses.replace(
            worlds.sim,
            qd=worlds.sim.qd + 0.01 * jax.random.normal(key, (N_ENVS, 10)),
        ),
    )
    bipeds = jax.vmap(lambda _: BipedParams())(jnp.arange(N_ENVS))
    ref_fn = jax.jit(batched_art_rollout_fn(
        n_ticks, mpc, gait, n_substeps=5, minv_ll_hold=8,
    ))
    ker_fn = jax.jit(batched_art_rollout_kernel_fn(n_ticks, mpc, gait))
    w_ref = ref_fn(worlds, bipeds)
    w_ker = ker_fn(worlds, bipeds)
    assert float(w_ref.metrics.falls.sum()) == 0
    assert float(w_ker.metrics.falls.sum()) == 0
    d_pos = float(jnp.abs(w_ref.sim.pos - w_ker.sim.pos).max())
    d_qd = float(jnp.abs(w_ref.sim.qd - w_ker.sim.qd).max())
    assert d_pos < 2e-2, d_pos
    assert d_qd < 2.0, d_qd
    # the controller state advanced identically (same XLA control path)
    d_tg = float(jnp.abs(w_ref.ctrl.t_gait - w_ker.ctrl.t_gait).max())
    assert d_tg < 1e-5, d_tg
