"""Closed-loop BASELINE configs on the FULL articulated stack
(25 Hz MPC / 200 Hz low-level / 2 kHz Featherstone physics)."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from biped_mpc_py_tpu.config import GaitConfig
from biped_mpc_py_tpu.models.biped import BipedParams
from biped_mpc_py_tpu.parallel.rollout_art import (
    art_mpc_config,
    art_rollout_fn,
    batched_art_rollout_fn,
    init_art_world,
)
from biped_mpc_py_tpu.sim.model import hector_model


@pytest.fixture(scope="module")
def setup():
    return BipedParams(), hector_model()


def test_articulated_standing(setup):
    biped, model = setup
    mpc = art_mpc_config()
    f = jax.jit(art_rollout_fn(50, mpc, GaitConfig(gait_mode=0), model=model))
    w = f(init_art_world(mpc), biped)
    x = np.array(w.sim.torso_state())
    assert float(w.metrics.falls) == 0
    assert abs(x[5] - 0.55) < 0.02
    assert np.abs(x[0:2]).max() < 0.05


def test_articulated_walking_10s(setup):
    """BASELINE config 2 on the articulated robot: 10 s, zero falls, tight
    attitude regulation."""
    biped, model = setup
    mpc = art_mpc_config()
    f = jax.jit(art_rollout_fn(250, mpc, GaitConfig(), model=model))
    w = f(init_art_world(mpc), biped)
    x = np.array(w.sim.torso_state())
    assert float(w.metrics.falls) == 0
    assert float(jnp.sqrt(w.metrics.attitude_err_sq / 250)) < 0.05
    assert abs(x[5] - 0.55) < 0.03


def test_articulated_velocity_command(setup):
    """0.15 m/s forward command with speed-scaled cadence (p=4).

    The reference cadence p=5 sits on a chaotic stability boundary at this
    speed (roundoff-level solver changes flip it between walking and a
    fall); the measured cadence envelope is in gait.gait_for_speed."""
    from biped_mpc_py_tpu.control.gait import gait_for_speed

    biped, model = setup
    x_cmd = jnp.zeros(12).at[5].set(0.55).at[9].set(0.15)
    mpc = art_mpc_config(x_cmd=x_cmd)
    f = jax.jit(art_rollout_fn(250, mpc, gait_for_speed(0.15), model=model))
    w = f(init_art_world(mpc), biped)
    x = np.array(w.sim.torso_state())
    assert float(w.metrics.falls) == 0
    assert x[3] > 0.8  # ~1.1 m forward progress in 10 s
    assert float(jnp.sqrt(w.metrics.attitude_err_sq / 250)) < 0.08


def test_articulated_fast_walk_cadence_scaled(setup):
    """0.3 m/s articulated walking (round-1 VERDICT item 6 target): the
    3-step (0.12 s) cadence walks 10 s at 0.3 m/s with zero falls — the
    fixed 0.4 s gait cycle was the round-1 binding constraint."""
    from biped_mpc_py_tpu.control.gait import gait_for_speed

    biped, model = setup
    x_cmd = jnp.zeros(12).at[5].set(0.55).at[9].set(0.3)
    mpc = art_mpc_config(x_cmd=x_cmd)
    f = jax.jit(art_rollout_fn(250, mpc, gait_for_speed(0.3), model=model))
    w = f(init_art_world(mpc), biped)
    x = np.array(w.sim.torso_state())
    assert float(w.metrics.falls) == 0
    assert x[3] > 1.5  # measured ~1.85 m in 10 s
    assert float(jnp.sqrt(w.metrics.attitude_err_sq / 250)) < 0.08
    assert float(w.metrics.res_prim_max) < 1.0


@pytest.mark.parametrize("vx,min_x", [(0.4, 2.5), (0.8, 5.2), (1.0, 5.5)])
@pytest.mark.slow
def test_articulated_fast_speed_envelope(setup, vx, min_x):
    """0.4, 0.8 and 1.0 m/s articulated walking. The p=2 (0.08 s phase)
    cadence unlocked 0.4-0.8 in round 2; round 3 added the sin^2
    zero-touchdown-velocity z profile (the corrected swing frames made
    the plain sine's touchdown impact flip the 0.8 branch) and the 1.0
    command point (apex 0.06 + capture gain 0.3 — zero-fall at 5
    perturbations, tools/sweep_speed10.py). Realized speed saturates
    ~0.67 m/s at the 1.0 command (Raibert steady-state lag; cranking the
    velocity weight destabilizes instead of closing the gap —
    art_config_for_speed docstring)."""
    from biped_mpc_py_tpu.parallel.rollout_art import art_config_for_speed

    biped, model = setup
    mpc, gait = art_config_for_speed(vx)
    f = jax.jit(art_rollout_fn(250, mpc, gait, model=model))
    w = f(init_art_world(mpc), biped)
    x = np.array(w.sim.torso_state())
    assert float(w.metrics.falls) == 0
    assert x[3] > min_x  # commanded vx*10 m; Raibert steady-state lag
    assert float(jnp.sqrt(w.metrics.attitude_err_sq / 250)) < 0.06


def test_articulated_body_frame_walk_stable(setup):
    """Body-frame command mode on the articulated stack: the leak-anchored
    command reference (controller.advance_cmd_ref) keeps the in-place walk
    as tight as world mode (raw-feedback anchoring measured attitude RMS
    0.425 and a fall — the anchor is load-bearing)."""
    biped, model = setup
    mpc = art_mpc_config(
        x_cmd=jnp.zeros(12).at[5].set(0.55), cmd_body_frame=True
    )
    w = jax.jit(art_rollout_fn(250, mpc, GaitConfig(), model=model))(
        init_art_world(mpc), biped
    )
    assert float(w.metrics.falls) == 0
    assert float(jnp.sqrt(w.metrics.attitude_err_sq / 250)) < 0.05


@pytest.mark.slow
def test_articulated_turning(setup):
    """Articulated turn-in-place at 0.3 rad/s — the round-2 VERDICT's
    done-bar (round-2 ceiling was 0.1 rad/s and believed structural).

    Round 3 found the actual root cause — the reference's swing-frame
    defect (config.compat_swing_frame_bug; yaw-proportional swing-PD
    disturbance) — and with the corrected frames the turning operating
    point (art_config_for_turn: cadence p=3, no foot-heading wrench, yaw
    leak 0.12, touchdown damping) turns 0.3-0.5 rad/s with zero falls
    under perturbation (sweep battery in tools/sweep_validate3.py).
    Pinned here: 0.3 rad/s, 10 s, >= 60% rate tracking, tight attitude.
    """
    from biped_mpc_py_tpu.parallel.rollout_art import art_config_for_turn

    biped, model = setup
    mpc, gait = art_config_for_turn(0.3)
    f = jax.jit(art_rollout_fn(250, mpc, gait, model=model))
    w = f(init_art_world(mpc), biped)
    x = np.array(w.sim.torso_state())
    assert float(w.metrics.falls) == 0
    # commanded 3.0 rad over 10 s; leak-anchor tradeoff bounds tracking
    assert 1.8 < x[2] < 3.3, x[2]
    assert float(jnp.sqrt(w.metrics.attitude_err_sq / 250)) < 0.05


@pytest.mark.slow
def test_articulated_turning_fast_and_curved(setup):
    """The round-3 turning envelope edge, batched in one rollout: 0.5
    rad/s turn-in-place (p=3) — sweep-validated zero-fall — plus curved
    walking 0.4 m/s + 0.3 rad/s (p=2) in a second jit."""
    from biped_mpc_py_tpu.parallel.rollout_art import art_config_for_turn

    biped, model = setup
    mpc, gait = art_config_for_turn(0.5)
    # 150 ticks (6 s): the commanded 3.0 rad stays inside the euler yaw
    # range (+-pi) so the tracking assertion is wrap-free
    w = jax.jit(art_rollout_fn(150, mpc, gait, model=model))(
        init_art_world(mpc), biped
    )
    assert float(w.metrics.falls) == 0
    x = np.array(w.sim.torso_state())
    assert 1.5 < x[2] < 3.1, x[2]  # >= 50% of the commanded 3.0 rad

    mpc2, gait2 = art_config_for_turn(0.3, vx=0.4)
    w2 = jax.jit(art_rollout_fn(250, mpc2, gait2, model=model))(
        init_art_world(mpc2), biped
    )
    assert float(w2.metrics.falls) == 0
    x2 = np.array(w2.sim.torso_state())
    assert x2[2] > 1.8, x2[2]  # curving: heading advanced
    # real arc traversal (sweeps: xy ~ (1, 2) m at this command)
    assert np.hypot(x2[3], x2[4]) > 1.5, x2[3:5]


@pytest.mark.slow
def test_articulated_sloped_turning_foot_frame_wrench(setup):
    """Sloped-terrain turning: the tilt-composed foot-frame rollover rows
    (round 5) help rather than hurt on a slope — the done-bar that
    removed the round-3 flat-ground caveat (``ops/qp.line_foot_rows``).

    Turn-in-place at 0.3 rad/s on a 15 % ramp tilts the planted feet with
    the surface while hip-yaw rotates them relative to the body — exactly
    the regime where the round-3 pure-Rz(psi) frame mis-oriented the
    toe/heel axes. The round-5 form composes the heading ON the measured
    attitude (Rz(psi−yaw)·R), keeping the tilt. Battery
    (tools/sweep_slope_turn.py): ffw=on is 4/4 zero-fall with realized
    wz ≈ +0.27 of the commanded +0.30; ffw=off falls in 2/4 perturbed
    seeds at this slope. Pinned: on-flag capability (zero falls, ≥70 %
    rate tracking) plus the comparative "helps, not hurts" direction.
    Reference rows being re-framed: ``bipedalLocomotionMPC.py:253-263``.
    """
    from biped_mpc_py_tpu.parallel.rollout_art import art_config_for_turn
    from biped_mpc_py_tpu.parallel.sweep import (
        art_sweep_fn,
        perturbed_worlds,
        stack_configs,
    )
    from biped_mpc_py_tpu.sim.contact import Terrain
    from biped_mpc_py_tpu.utils.precision import f32_precision

    biped, _ = setup
    slope, n_pert, seg = 0.15, 4, 125  # 2 x 5 s segments per flag
    xs = np.linspace(-4.0, 4.0, 33)
    terr = Terrain(
        heights=jnp.asarray(np.tile(slope * xs, (33, 1)), jnp.float32),
        extent=8.0,
    )

    def run(flag):
        configs = [
            art_config_for_turn(0.3, foot_frame_wrench=flag)[0]
            for _ in range(n_pert)
        ]
        gait = art_config_for_turn(0.3, foot_frame_wrench=flag)[1]
        mpc_batch, in_axes = stack_configs(configs)
        worlds = perturbed_worlds(configs[0], n_pert, jax.random.PRNGKey(11))
        fn = jax.jit(f32_precision(art_sweep_fn(seg, gait, in_axes,
                                                terrain=terr)))
        yaw0 = np.array(jax.vmap(lambda s: s.torso_state()[2])(worlds.sim))
        for _ in range(2):
            worlds = fn(worlds, biped, mpc_batch)
        yaw = np.array(jax.vmap(lambda s: s.torso_state()[2])(worlds.sim))
        return np.array(worlds.metrics.falls), (yaw - yaw0) / (2 * seg * 0.04)

    falls_on, wz_on = run(True)
    assert falls_on.sum() == 0, falls_on
    assert (wz_on > 0.21).all(), wz_on  # >= 70% of the 0.30 rad/s command

    falls_off, _ = run(False)
    assert falls_on.sum() <= falls_off.sum(), (falls_on, falls_off)


@pytest.mark.slow
def test_articulated_lateral_stepping(setup):
    """BASELINE config 3's lateral half on the FULL articulated stack
    (round-3; round 2 only exercised lateral shoves): sustained sideways
    velocity commands track with zero falls (probe results: y = 0.6-0.9 m
    in 10 s at 0.1-0.15 m/s, att RMS 0.014-0.015)."""
    biped, model = setup
    for vy, body in ((0.15, False), (0.1, True)):
        x_cmd = jnp.zeros(12).at[5].set(0.55).at[10].set(vy)
        mpc = art_mpc_config(x_cmd=x_cmd, cmd_body_frame=body)
        w = jax.jit(art_rollout_fn(250, mpc, GaitConfig(4), model=model))(
            init_art_world(mpc), biped
        )
        assert float(w.metrics.falls) == 0, (vy, body)
        x = np.array(w.sim.torso_state())
        assert x[4] > 0.45, (vy, body, x[4])
        assert float(jnp.sqrt(w.metrics.attitude_err_sq / 250)) < 0.05


@pytest.mark.slow
def test_articulated_bench_budget_accuracy(setup):
    """The benched fast path keeps the articulated 0.3 m/s walk as clean
    as the default-budget stack (the SRB analog is
    test_rollout.py::test_bench_budget_accuracy). Two rollouts:

    1. fast solver budget (40/1/no-polish/NS(10)) at the default physics
       (2 kHz, per-period mass-matrix refresh);
    2. the EXACT bench art fast path (bench.py BENCH_MODE=art defaults):
       fast budget + 1 kHz substeps + minv_ll_hold=8 (one NS mass-matrix
       inverse per 40 ms tick, the round-3 3.2x throughput lever —
       tools/sweep_minv.py)."""
    from biped_mpc_py_tpu.control.gait import gait_for_speed

    biped, model = setup
    x_cmd = jnp.zeros(12).at[5].set(0.55).at[9].set(0.3)
    mpc = art_mpc_config(
        x_cmd=x_cmd, n_admm_iters=40, admm_rho_phases=1, admm_polish=False,
        kinv_ns_iters=10,
    )
    for tick_kw in ({}, dict(n_substeps=5, minv_ll_hold=8)):
        w = jax.jit(
            art_rollout_fn(250, mpc, gait_for_speed(0.3), model=model,
                           **tick_kw)
        )(init_art_world(mpc), biped)
        assert float(w.metrics.falls) == 0, tick_kw
        assert float(w.sim.pos[0]) > 1.5, tick_kw
        assert float(jnp.sqrt(w.metrics.attitude_err_sq / 250)) < 0.08, tick_kw
        assert float(w.metrics.res_prim_max) < 1.0, tick_kw


@pytest.mark.slow
def test_articulated_push_recovery(setup):
    """0.5 m/s shove in ALL FOUR directions, recovered in one batched
    rollout (the sweep-measured envelope: 0.5 m/s omnidirectional,
    0.7 m/s lateral-only; 0.9 falls in every direction — faster cadence
    does NOT raise the push ceiling, unlike the speed envelope)."""
    biped, model = setup
    mpc = art_mpc_config()
    f1 = jax.jit(art_rollout_fn(50, mpc, GaitConfig(), model=model))
    w = f1(init_art_world(mpc), biped)
    dirs = np.array([[1, 0], [0, 1], [-1, 0], [0, -1]], np.float32) * 0.5
    worlds = jax.tree.map(lambda x: jnp.stack([x] * 4), w)
    vb = worlds.sim.v_base.at[:, 3].add(dirs[:, 0]).at[:, 4].add(dirs[:, 1])
    worlds = dataclasses.replace(
        worlds, sim=dataclasses.replace(worlds.sim, v_base=vb)
    )
    f2 = jax.jit(batched_art_rollout_fn(150, mpc, GaitConfig(), model=model))
    bipeds = jax.tree.map(lambda x: jnp.stack([x] * 4), biped)
    out = f2(worlds, bipeds)
    assert np.asarray(out.metrics.falls).max() == 0
    v = np.asarray(out.sim.v_base)[:, 3:5]
    assert np.abs(v).max() < 0.3  # recovered, not still sliding


@pytest.mark.slow
def test_articulated_batched(setup):
    """Batched articulated rollouts run and match the single-env rollout."""
    biped, model = setup
    mpc = art_mpc_config()
    n = 3
    single = jax.jit(art_rollout_fn(10, mpc, GaitConfig(), model=model))(
        init_art_world(mpc), biped
    )
    worlds = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (n,) + jnp.shape(x)), init_art_world(mpc)
    )
    bipeds = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (n,) + jnp.shape(x)), biped
    )
    batched = jax.jit(batched_art_rollout_fn(10, mpc, GaitConfig(), model=model))(
        worlds, bipeds
    )
    # f32 fusion-order noise amplified by 10 chaotic closed-loop ticks
    np.testing.assert_allclose(
        np.array(batched.sim.pos[0]), np.array(single.sim.pos), atol=3e-3
    )
    assert float(batched.metrics.falls.sum()) == 0


def test_articulated_rough_terrain_per_env(setup):
    """BASELINE config 4 at batch scale: each env walks on its own random
    rough ground, FULL 250-tick (10 s) rollouts at the 4 cm edge of the
    round-3 envelope, no falls.

    The round-3 amplitude envelope (TPU sweep, 8 random fields x 10 s
    each, tools/sweep_terrain.py) with TERRAIN-ADAPTIVE height references
    (CoM z target rides the local ground, swing apex and MPC foot targets
    ride the surface): 3 and 4 cm walk fall-free on 8/8 fields, 5 and
    6 cm on 7/8 — vs the round-2 fixed-plane references, where 4 cm fell
    on 6/8 fields (3 cm ceiling)."""
    from biped_mpc_py_tpu.parallel.rollout_art import (
        batched_art_rollout_terrain_fn,
    )
    from biped_mpc_py_tpu.sim.contact import Terrain

    biped, model = setup
    mpc = art_mpc_config()
    n = 2
    terrains = Terrain.rough_batch(jax.random.PRNGKey(7), n, amplitude=0.04)
    worlds = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (n,) + jnp.shape(x)), init_art_world(mpc)
    )
    bipeds = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (n,) + jnp.shape(x)), biped
    )
    f = jax.jit(
        batched_art_rollout_terrain_fn(250, mpc, GaitConfig(), model=model)
    )
    w = f(worlds, bipeds, terrains)
    assert float(w.metrics.falls.sum()) == 0
    assert np.isfinite(np.array(w.sim.pos)).all()
    # the two envs see different ground -> different trajectories
    assert float(jnp.abs(w.sim.pos[0] - w.sim.pos[1]).max()) > 1e-4


@pytest.mark.slow
def test_sharded_articulated_rollout(setup):
    """The articulated stack shards over the 8-device CPU mesh (env DP +
    psum metrics), matching the vmap result."""
    from biped_mpc_py_tpu.parallel.sharding import (
        env_mesh, shard_world, sharded_art_rollout_fn,
    )

    biped, model = setup
    mpc = art_mpc_config()
    n = 8
    mesh = env_mesh()
    worlds = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (n,) + jnp.shape(x)), init_art_world(mpc)
    )
    worlds = shard_world(worlds, mesh)
    bipeds = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (n,) + jnp.shape(x)), biped
    )
    bipeds = shard_world(bipeds, mesh)
    f = jax.jit(sharded_art_rollout_fn(5, mpc, GaitConfig(), mesh, model=model))
    w, summary = f(worlds, bipeds)
    assert float(summary["n_steps"]) == 5 * n
    assert float(summary["falls"]) == 0
    v = jax.jit(batched_art_rollout_fn(5, mpc, GaitConfig(), model=model))(
        jax.tree.map(lambda x: jnp.broadcast_to(x, (n,) + jnp.shape(x)),
                     init_art_world(mpc)),
        jax.tree.map(lambda x: jnp.broadcast_to(x, (n,) + jnp.shape(x)), biped),
    )
    np.testing.assert_allclose(
        np.array(w.sim.pos), np.array(v.sim.pos), atol=3e-3
    )


@pytest.mark.slow
def test_articulated_gait_transitions(setup):
    """Runtime stand -> walk -> stand on the FULL articulated stack (the
    SRB analog is test_rollout.py::test_gait_transitions_stand_walk_stand;
    round-3 closes the gap where the README's articulated envelope
    claimed transitions but only the SRB layer tested them). gait_mode is
    a dynamic leaf (control/gait.py uses jnp.where), so the switch reuses
    one compiled rollout; controller state carries across."""
    biped, model = setup
    mpc = art_mpc_config()
    stand = jax.jit(
        art_rollout_fn(50, mpc, GaitConfig(gait_mode=0), model=model)
    )
    walk = jax.jit(
        art_rollout_fn(100, mpc, GaitConfig(gait_mode=1), model=model)
    )
    stand2 = jax.jit(
        art_rollout_fn(100, mpc, GaitConfig(gait_mode=0), model=model)
    )
    w = stand(init_art_world(mpc), biped)
    w = walk(w, biped)
    w = stand2(w, biped)
    assert float(w.metrics.falls) == 0
    x = np.array(w.sim.torso_state())
    assert abs(x[5] - 0.548) < 0.03  # settled at stance height
    assert np.abs(x[9:12]).max() < 0.12  # residual sway decayed


@pytest.mark.slow
def test_articulated_checkpoint_resume_bit_exact(setup, tmp_path):
    """ArtWorld checkpoints like any pytree: save -> load -> resume ==
    straight run on the FULL articulated stack (SRB analog:
    test_rollout.py::test_checkpoint_resume_bit_exact)."""
    from biped_mpc_py_tpu.utils.checkpoint import load_pytree, save_pytree

    biped, model = setup
    mpc = art_mpc_config()
    f20 = jax.jit(art_rollout_fn(20, mpc, GaitConfig(), model=model))
    f10 = jax.jit(art_rollout_fn(10, mpc, GaitConfig(), model=model))
    w_mid = f20(init_art_world(mpc), biped)
    path = tmp_path / "art_ckpt.npz"
    save_pytree(str(path), w_mid)
    w_loaded = load_pytree(str(path), jax.tree.map(jnp.zeros_like, w_mid))
    w_resumed = f10(w_loaded, biped)
    w_straight = f10(w_mid, biped)
    np.testing.assert_array_equal(
        np.array(w_resumed.sim.q), np.array(w_straight.sim.q)
    )
    np.testing.assert_array_equal(
        np.array(w_resumed.sim.pos), np.array(w_straight.sim.pos)
    )


@pytest.mark.slow
def test_articulated_cost_of_transport(setup):
    """Mechanical cost of transport at 0.3 m/s lands in the plausible
    small-biped band (positive joint work E/(m g d); human walking ~0.2,
    small electric bipeds ~0.5-3). Guards the energy accumulator
    (metrics.energy) against unit slips more than it pins efficiency."""
    from biped_mpc_py_tpu.control.gait import gait_for_speed
    from biped_mpc_py_tpu.utils.metrics import cost_of_transport

    biped, model = setup
    x_cmd = jnp.zeros(12).at[5].set(0.55).at[9].set(0.3)
    mpc = art_mpc_config(x_cmd=x_cmd)
    w = jax.jit(art_rollout_fn(250, mpc, gait_for_speed(0.3), model=model))(
        init_art_world(mpc), biped
    )
    assert float(w.metrics.falls) == 0
    d = float(w.sim.pos[0])
    cot = float(cost_of_transport(w.metrics.energy, 12.0, d))
    assert 0.2 < cot < 5.0, (cot, float(w.metrics.energy), d)


@pytest.mark.slow
def test_articulated_running_gait(setup):
    """RUNNING (flight-phase) gait on the full articulated stack (round 4,
    GaitConfig.flight_steps): the art_config_for_run operating point at a
    1.2 m/s command runs 10 s with zero falls and GENUINE aerial phases
    (both soles airborne ~24% of steady-state ticks; scheduled flight
    duty is 1/3, reduced by the deliberate early landings). Peak speed
    exceeds 1.0 m/s transiently; sustained realized ~0.65 — the running
    transport analysis is in DESIGN_NOTES round 4. Battery: 5 perturbed
    seeds zero-fall at 1.0 AND 1.2 in tools/sweep_run.py; PINNED here:
    one deterministic rollout + a 50-tick flight-fraction sample."""
    from biped_mpc_py_tpu.parallel.rollout_art import (
        art_closed_loop_tick,
        art_config_for_run,
    )
    from biped_mpc_py_tpu.sim.engine import sole_positions

    biped, model = setup
    mpc, gait = art_config_for_run(1.2)
    f = jax.jit(art_rollout_fn(200, mpc, gait, model=model))
    w = f(init_art_world(mpc), biped)
    assert float(w.metrics.falls) == 0
    x = np.array(w.sim.torso_state())
    assert x[3] > 4.5, x[3]  # > 0.56 m/s realized over the first 8 s

    # steady-state flight fraction: both soles > 5 mm
    tick = jax.jit(
        lambda ww: art_closed_loop_tick(ww, mpc, gait, biped, model)
    )
    flight = 0
    for _ in range(50):
        w = tick(w)
        s = np.array(sole_positions(model, w.sim)).reshape(2, 3)
        if s[0, 2] > 0.005 and s[1, 2] > 0.005:
            flight += 1
    assert float(w.metrics.falls) == 0
    assert flight >= 8, flight  # genuine aerial phases (~12/50 expected)
