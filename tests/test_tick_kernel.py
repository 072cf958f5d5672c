"""Parity pins for the fused TICK kernel (low-level control in-kernel).

ops/pallas/tick_kernel.py runs the whole 40 ms low-level+physics
hierarchy (8x: FK feedback -> swing PD + Jacobian-transpose torque
mapping -> 5 physics substeps) as ONE kernel launch. These tests pin:

(a) the kernel's polynomial atan2/asin (Mosaic rejects the primitives,
    tools/probe_mosaic_ops.py) against numpy,
(b) the closed-form controller-chain Jacobian columns against the XLA
    path's ``jax.jacfwd`` Jacobians (models/kinematics.leg_jacobians),
(c) the in-kernel low-level control against
    control/lowlevel.low_level_control on batched random states (the
    SoA functions are shape-agnostic, so this runs WITHOUT pallas),
(d) one fused tick (interpret mode) against the XLA
    feedback->lowlevel->art_step sequence it replaces, and
(e) closed-loop equivalence of the tick-kernel rollout against the
    substep-kernel rollout (parallel/rollout_art.py).

Reference low-level semantics: ``bipedalLocomotionMPC.py:426-470``.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from biped_mpc_py_tpu.config import GaitConfig
from biped_mpc_py_tpu.control.lowlevel import low_level_control
from biped_mpc_py_tpu.models.biped import BipedParams
from biped_mpc_py_tpu.models.kinematics import leg_jacobians
from biped_mpc_py_tpu.ops.pallas.tick_kernel import (
    _asin,
    _atan2,
    _control_consts,
    _control_tau,
    _leg_jac_cols,
    _model_consts,
    _tick_consts,
    make_fused_tick,
)
from biped_mpc_py_tpu.parallel.rollout_art import art_mpc_config
from biped_mpc_py_tpu.sim.engine import (
    ArtState,
    art_step,
    feedback_and_soles,
    mass_matrix_inv,
)
from biped_mpc_py_tpu.sim.model import hector_model

N_ENVS = 1024


def _perturbed_states(key, n):
    base = ArtState.standing()
    ks = jax.random.split(key, 6)
    pos = base.pos + 0.02 * jax.random.normal(ks[0], (n, 3))
    pos = pos.at[:, 2].add(-0.03)
    quat = base.quat + 0.02 * jax.random.normal(ks[1], (n, 4))
    quat = quat / jnp.linalg.norm(quat, axis=1, keepdims=True)
    return ArtState(
        pos=pos,
        quat=quat,
        v_base=0.3 * jax.random.normal(ks[2], (n, 6)),
        q=base.q + 0.05 * jax.random.normal(ks[3], (n, 10)),
        qd=0.5 * jax.random.normal(ks[4], (n, 10)),
        t=0.4 * jax.random.uniform(ks[5], (n,)),
    )


def test_atan2_asin_poly():
    """Polynomial atan2/asin vs numpy over a dense grid (< 4e-7 rad)."""
    v = np.linspace(-3.0, 3.0, 301, dtype=np.float32)
    y, x = np.meshgrid(v, v)
    # skip the (0, 0) singular point and the y==0, x<0 branch-cut edge
    # (the kernel returns +pi there; numpy distinguishes -0.0)
    mask = (np.abs(x) + np.abs(y)) > 1e-6
    got = np.asarray(_atan2(jnp.asarray(y), jnp.asarray(x)))
    want = np.arctan2(y.astype(np.float64), x.astype(np.float64))
    assert np.abs(got - want)[mask].max() < 4e-7

    u = np.linspace(-1.0, 1.0, 2001, dtype=np.float32)
    got = np.asarray(_asin(jnp.asarray(u)))
    want = np.arcsin(u.astype(np.float64))
    assert np.abs(got - want).max() < 1e-6


def test_leg_jac_closed_form():
    """Closed-form Jacobian columns == jacfwd of the FK chain."""
    biped = BipedParams()
    g = biped.jac_geometry
    G = dict(
        l_thigh=float(g.l_thigh), l_shank=float(g.l_shank),
        l_foot=float(g.l_foot), abd_y=float(g.abd_y),
        abd_y_const=float(g.abd_y_const), hip_x=float(g.hip_x),
        hip_y=float(g.hip_y), hip_z=float(g.hip_z),
    )
    key = jax.random.PRNGKey(0)
    qs = 0.8 * jax.random.normal(key, (64, 5))
    for side in (1.0, -1.0):
        jm_ref, jf_ref = jax.vmap(
            lambda q: leg_jacobians(q, side, g)
        )(qs)
        q5 = tuple(qs[:, i] for i in range(5))
        jf_cols, ax_cols = _leg_jac_cols(q5, side, G)
        jf = jnp.stack(
            [jnp.stack(col, axis=-1) for col in jf_cols], axis=-1
        )  # (64, 3, 5)
        ax = jnp.stack(
            [jnp.stack(col, axis=-1) for col in ax_cols], axis=-1
        )
        np.testing.assert_allclose(jf, jf_ref, atol=2e-6)
        np.testing.assert_allclose(ax, jm_ref[:, 3:6, :], atol=2e-6)


def _tau_reference(mpc, gait, biped, model, state, u0, c0, t_ll, cmd_ref,
                   v_int):
    """XLA-path torques: feedback_and_soles -> low_level_control."""
    h = mpc.h

    def one(s_pos, s_quat, s_vb, s_q, s_qd, u, c, t, cr, vi):
        st = ArtState(
            pos=s_pos, quat=s_quat, v_base=s_vb, q=s_q, qd=s_qd,
            t=jnp.zeros(()),
        )
        x, pf = feedback_and_soles(model, st)
        contact = jnp.broadcast_to(c, (h, 2))
        return low_level_control(
            x, t, pf, s_q, s_qd, mpc, biped, contact, u, gait=gait,
            cmd_ref=cr, v_int=vi,
        )

    return jax.vmap(one)(
        state.pos, state.quat, state.v_base, state.q, state.qd, u0, c0,
        t_ll, cmd_ref, v_int,
    )


def _soa_tau(mpc, gait, biped, model, state, u0, c0, t_ll, cmd_yaw, v_int):
    """In-kernel control math applied directly to (N,) component arrays
    (the SoA functions are shape-agnostic — no pallas needed)."""
    C = _model_consts(model)
    M = _tick_consts(model)
    K = _control_consts(mpc, gait, biped)
    carry = (
        tuple(state.pos[:, i] for i in range(3)),
        tuple(state.quat[:, i] for i in range(4)),
        tuple(state.v_base[:, i] for i in range(3)),
        tuple(state.v_base[:, 3 + i] for i in range(3)),
        tuple(state.q[:, i] for i in range(10)),
        tuple(state.qd[:, i] for i in range(10)),
    )
    tau = _control_tau(
        carry,
        tuple(u0[:, i] for i in range(12)),
        (c0[:, 0], c0[:, 1]),
        t_ll,
        cmd_yaw,
        (v_int[:, 0], v_int[:, 1]),
        C, M, K,
    )
    return jnp.stack(tau, axis=1)


@pytest.mark.parametrize("preset", ["default", "loaded"])
def test_control_tau_parity(preset):
    """In-kernel low-level control == control/lowlevel.py on 256 random
    states, mixed stance/swing flags (f32 + atan-poly roundoff)."""
    n = 256
    if preset == "default":
        mpc = art_mpc_config()
    else:
        # exercise every folded knob the articulated stack uses
        mpc = art_mpc_config(
            x_cmd=jnp.zeros(12).at[5].set(0.55).at[9].set(0.3),
            swing_z_sin2=True, swing_track_ff=1.0, swing_retract=0.02,
            raibert_am_y=0.05, raibert_pitch_place=0.2,
            raibert_pitch_nom=0.15, capture_sched=0.5,
            raibert_vint=0.05, kp_pivot=1.5, kd_pivot=0.2,
            hipyaw_rate_lead=0.1, flight_yaw_kd=2.0,
            swing_td_overdrive=0.01, cmd_body_frame=True,
        )
    gait = GaitConfig(steps_per_phase=3)
    biped = BipedParams()
    model = hector_model()
    key = jax.random.PRNGKey(1)
    state = _perturbed_states(key, n)
    ks = jax.random.split(jax.random.PRNGKey(2), 5)
    u0 = 30.0 * jax.random.normal(ks[0], (n, 12))
    c0 = jax.random.bernoulli(ks[1], 0.5, (n, 2)).astype(jnp.float32)
    t_ll = 0.4 * jax.random.uniform(ks[2], (n,))
    cmd_yaw = 0.3 * jax.random.normal(ks[3], (n,))
    v_int = 0.1 * jax.random.normal(ks[4], (n, 2))
    cmd_ref = jnp.concatenate(
        [jnp.zeros((n, 2)), cmd_yaw[:, None]], axis=1
    )

    want = _tau_reference(
        mpc, gait, biped, model, state, u0, c0, t_ll, cmd_ref, v_int
    )
    got = _soa_tau(
        mpc, gait, biped, model, state, u0, c0, t_ll, cmd_yaw, v_int
    )
    err = jnp.abs(got - want).max()
    assert err < 2e-3, err  # Nm; |tau| scale ~ 30 Nm


def test_fused_tick_parity():
    """One fused tick (interpret) == the XLA feedback->lowlevel->art_step
    sequence with the tick-held Minv."""
    mpc = art_mpc_config(
        x_cmd=jnp.zeros(12).at[5].set(0.55).at[9].set(0.3)
    )
    gait = GaitConfig(steps_per_phase=5)
    biped = BipedParams()
    model = hector_model()
    n_ll, n_sub = 8, 5
    ll_dt = mpc.dt / n_ll

    state = _perturbed_states(jax.random.PRNGKey(3), N_ENVS)
    state = dataclasses.replace(state, t=jnp.zeros(N_ENVS))
    ks = jax.random.split(jax.random.PRNGKey(4), 3)
    u0 = 30.0 * jax.random.normal(ks[0], (N_ENVS, 12))
    c0 = jax.random.bernoulli(ks[1], 0.5, (N_ENVS, 2)).astype(jnp.float32)
    t0 = state.t
    cmd_yaw = jnp.zeros(N_ENVS)
    v_int = jnp.zeros((N_ENVS, 2))
    Minv = jax.vmap(lambda q: mass_matrix_inv(model, q))(state.q)

    tick = make_fused_tick(model, biped, mpc, gait, n_ll, n_sub)
    got, energy = jax.jit(
        lambda *a: tick(*a, interpret=True)
    )(state, u0, c0, t0, cmd_yaw, v_int, Minv)

    # XLA reference loop
    h = mpc.h

    def one(s0, u, c, cy, vi, mi):
        contact = jnp.broadcast_to(c, (h, 2))
        cr = jnp.stack([jnp.zeros(()), jnp.zeros(()), cy])
        s = s0
        e = jnp.zeros(())
        for p in range(n_ll):
            x, pf = feedback_and_soles(model, s)
            tau = low_level_control(
                x, s.t, pf, s.q, s.qd, mpc, biped, contact, u,
                gait=gait, cmd_ref=cr, v_int=vi,
            )
            e = e + jnp.sum(jnp.maximum(tau * s.qd, 0.0)) * ll_dt
            s = art_step(model, s, tau, ll_dt, n_sub, None, Minv=mi)
        return s, e

    want, e_want = jax.vmap(one)(state, u0, c0, cmd_yaw, v_int, Minv)
    # torque differences at the atan-poly/f32 level integrate through 40
    # substeps; compare states to the matching tolerance
    np.testing.assert_allclose(got.q, want.q, atol=5e-4)
    np.testing.assert_allclose(got.pos, want.pos, atol=5e-4)
    np.testing.assert_allclose(got.qd, want.qd, atol=2e-2)
    np.testing.assert_allclose(got.quat, want.quat, atol=5e-4)
    np.testing.assert_allclose(energy, e_want, rtol=2e-3, atol=1e-3)


@pytest.mark.slow
def test_tick_kernel_closed_loop():
    """25-tick walking closed loop: tick-kernel rollout == substep-kernel
    rollout at the population level (zero falls both; matching means)."""
    from biped_mpc_py_tpu.parallel.rollout_art import (
        batched_art_rollout_kernel_fn,
        batched_art_rollout_tick_kernel_fn,
        init_art_world,
    )

    mpc = art_mpc_config(
        x_cmd=jnp.zeros(12).at[5].set(0.55).at[9].set(0.3),
        n_admm_iters=40, admm_rho_phases=1, admm_polish=False,
    )
    gait = GaitConfig(steps_per_phase=5)
    biped = BipedParams()
    worlds = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (N_ENVS,) + jnp.shape(x)),
        init_art_world(mpc),
    )
    bipeds = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (N_ENVS,) + jnp.shape(x)), biped
    )
    ref_fn = jax.jit(
        batched_art_rollout_kernel_fn(25, mpc, gait, minv_ll_hold=8)
    )
    new_fn = jax.jit(batched_art_rollout_tick_kernel_fn(25, mpc, gait))
    w_ref = ref_fn(worlds, bipeds)
    w_new = new_fn(worlds, bipeds)
    assert float(w_ref.metrics.falls.sum()) == 0.0
    assert float(w_new.metrics.falls.sum()) == 0.0
    # same walking statistics (chaotic per-env divergence is expected;
    # population means must agree)
    z_ref = float(w_ref.sim.pos[:, 2].mean())
    z_new = float(w_new.sim.pos[:, 2].mean())
    assert abs(z_ref - z_new) < 0.01, (z_ref, z_new)
    x_ref = float(w_ref.sim.pos[:, 0].mean())
    x_new = float(w_new.sim.pos[:, 0].mean())
    assert abs(x_ref - x_new) < 0.03, (x_ref, x_new)
    att_ref = float(w_ref.metrics.attitude_err_sq.mean())
    att_new = float(w_new.metrics.attitude_err_sq.mean())
    assert abs(att_ref - att_new) < 0.3 * max(att_ref, 1e-3), (
        att_ref, att_new,
    )
