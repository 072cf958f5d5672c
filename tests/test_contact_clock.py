"""Contact-sensed gait clock (GaitConfig.contact_clock, round 4).

Unit semantics of control/gait.py::advance_gait_clock / measured_contact,
the control_tick plumbing, and the always-in-contact equivalence (a clock
that never holds reproduces the fixed wall-clock schedule exactly).

No reference counterpart: the reference's scheduler is a fixed wall-clock
table (``bipedalLocomotionMPC.py:50-59``); the contact clock is the
touchdown-triggered re-anchoring the round-4 running transport analysis
called for (docs/DESIGN_NOTES.md "Where flight breaks").
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from biped_mpc_py_tpu.config import GaitConfig, MpcConfig
from biped_mpc_py_tpu.control.gait import (
    advance_gait_clock,
    contact_sequence,
    measured_contact,
)

DOWN = jnp.array([True, True])
UP = jnp.array([False, False])


def _step(t, mpc):
    """Integer gait step from a clock time (times are biased products
    (k + 1/16) * dt — see control/gait.py::_CLOCK_STEP_BIAS)."""
    return int(np.floor(float(t) / mpc.dt + 0.4375))


def _mk(p=2, f=1, **kw):
    return GaitConfig(
        steps_per_phase=p, flight_steps=f, contact_clock=True, **kw
    )


def _advance_to(k, mpc, gait, down=DOWN):
    """Advance a fresh clock k times with the given contact flags."""
    t, hold = jnp.asarray(-mpc.dt), jnp.zeros((), jnp.int32)
    for _ in range(k):
        t, hold = advance_gait_clock(t, hold, down, mpc, gait)
    return t, hold


def test_clock_advances_every_tick_when_in_contact():
    mpc, gait = MpcConfig(), _mk()
    t, hold = _advance_to(7, mpc, gait)
    assert _step(t, mpc) == 6
    assert int(hold) == 0


def test_clock_holds_at_stance_entry_until_touchdown():
    """p=2 f=1 cycle: right stance enters at step 3. With the right foot
    airborne the clock holds at step 2 (incrementing hold_count), then
    advances the tick the foot reports down."""
    mpc, gait = MpcConfig(), _mk()
    # advance to using step 2 (the flight step before right stance)
    t, hold = _advance_to(3, mpc, gait)
    assert _step(t, mpc) == 2
    right_up = jnp.array([True, False])
    t1, h1 = advance_gait_clock(t, hold, right_up, mpc, gait)
    assert _step(t1, mpc) == 2  # held
    assert int(h1) == 1
    t2, h2 = advance_gait_clock(t1, h1, right_up, mpc, gait)
    assert _step(t2, mpc) == 2  # still held
    assert int(h2) == 2
    # touchdown -> advances into stance, hold resets
    t3, h3 = advance_gait_clock(t2, h2, DOWN, mpc, gait)
    assert _step(t3, mpc) == 3
    assert int(h3) == 0
    # the realized schedule at the held time is the flight step
    c_held = np.array(contact_sequence(t1, mpc, gait))
    np.testing.assert_array_equal(c_held[0], [0.0, 0.0])
    c_adv = np.array(contact_sequence(t3, mpc, gait))
    np.testing.assert_array_equal(c_adv[0], [0.0, 1.0])


def test_clock_hold_caps_at_max_hold():
    mpc, gait = MpcConfig(), _mk(clock_max_hold=2)
    t, hold = _advance_to(3, mpc, gait)
    right_up = jnp.array([True, False])
    for expect_hold in (1, 2):
        t, hold = advance_gait_clock(t, hold, right_up, mpc, gait)
        assert int(hold) == expect_hold
    # cap reached: advances even with the foot still airborne
    t2, h2 = advance_gait_clock(t, hold, right_up, mpc, gait)
    assert _step(t2, mpc) == 3
    assert int(h2) == 0


def test_clock_never_holds_mid_phase_or_standing():
    mpc = MpcConfig()
    # mid-stance step (step 0 -> 1 stays inside left stance): no hold
    gait = _mk()
    t, hold = _advance_to(1, mpc, gait)  # using step 0
    t1, h1 = advance_gait_clock(t, hold, UP, mpc, gait)
    assert _step(t1, mpc) == 1
    assert int(h1) == 0
    # standing never holds even at a boundary
    gait0 = _mk(gait_mode=0)
    t, hold = _advance_to(3, mpc, gait0)
    t1, h1 = advance_gait_clock(t, hold, UP, mpc, gait0)
    assert _step(t1, mpc) == 3
    assert int(h1) == 0


def test_measured_contact_flat_and_terrain():
    from biped_mpc_py_tpu.sim.contact import Terrain

    gait = _mk()
    pf = jnp.array([0.0, 0.09, 0.005, 0.0, -0.09, 0.08])
    down = np.array(measured_contact(pf, None, gait))
    np.testing.assert_array_equal(down, [True, False])
    # terrain-relative: a sole resting ON a 5 cm bump counts as contact
    terr = Terrain(
        heights=jnp.full((8, 8), 0.05), extent=4.0
    )
    pf2 = jnp.array([0.0, 0.09, 0.055, 0.0, -0.09, 0.10])
    down2 = np.array(measured_contact(pf2, terr, gait))
    np.testing.assert_array_equal(down2, [True, False])


def test_always_down_clock_matches_integer_schedule():
    """A clock that never holds (feet always 'down') produces exactly the
    integer step sequence k=0,1,2,... — contact_sequence on the biased
    clock time equals the schedule built from integer math at every tick
    (the floor-boundary robustness the bias buys; a raw accumulated f32
    clock fails this within 25 ticks)."""
    mpc, gait = MpcConfig(), _mk(p=5, f=0)
    p = gait.steps_per_phase
    t, hold = jnp.asarray(-mpc.dt), jnp.zeros((), jnp.int32)
    for k in range(200):
        t, hold = advance_gait_clock(t, hold, DOWN, mpc, gait)
        assert _step(t, mpc) == k
        s = (k + np.arange(mpc.h)) % (2 * p)
        expect = np.stack([s < p, s >= p], axis=-1).astype(np.float32)
        np.testing.assert_array_equal(
            np.array(contact_sequence(t, mpc, gait)), expect
        )


def test_control_tick_requires_contact_meas_and_state():
    from biped_mpc_py_tpu.control.controller import (
        ControllerState,
        control_tick,
    )
    from biped_mpc_py_tpu.models.biped import BipedParams

    mpc, gait, biped = MpcConfig(), _mk(), BipedParams()
    x = jnp.zeros(12).at[5].set(0.55)
    q = jnp.array([0, 0, -np.pi / 4, np.pi / 2, -np.pi / 4] * 2, jnp.float32)
    qd = jnp.zeros(10)
    with pytest.raises(ValueError, match="contact_meas"):
        control_tick(
            x, q, qd, 0.0, mpc, gait, biped,
            ctrl_state=ControllerState.init(mpc),
        )
    # with contact flags supplied the tick runs and threads the clock
    st = ControllerState.init(mpc)
    tau, st2, _ = control_tick(
        x, q, qd, 0.0, mpc, gait, biped, ctrl_state=st, contact_meas=DOWN,
    )
    assert np.isfinite(np.array(tau)).all()
    assert _step(st2.t_gait, mpc) == 0
    tau, st3, _ = control_tick(
        x, q, qd, mpc.dt, mpc, gait, biped, ctrl_state=st2,
        contact_meas=DOWN,
    )
    assert _step(st3.t_gait, mpc) == 1


@pytest.mark.slow
def test_running_contact_clock_sustains_fast_cycle_10s():
    """Integration pin (engine): the contact clock at the running operating
    point (art_config_for_run(1.2), clock_max_hold=2) holds the FAST hop
    cycle through a 10 s rollout — zero falls and realized speed > 0.7 m/s
    (fixed-clock sustained ceiling: ~0.65; battery: 0/5 perturbed falls,
    mean realized 0.806 at 1.2 and 0.686 at 1.0, tools/sweep_run.py group
    "clock"). Longer horizons decay into the slow braking attractor — the
    measured landscape is in DESIGN_NOTES round 4 ("the contact clock
    triples the fast-cycle dwell")."""
    from biped_mpc_py_tpu.models.biped import BipedParams
    from biped_mpc_py_tpu.parallel.rollout_art import (
        art_config_for_run,
        art_rollout_fn,
        init_art_world,
    )
    from biped_mpc_py_tpu.sim.model import hector_model
    from biped_mpc_py_tpu.utils.precision import f32_precision

    biped, model = BipedParams(), hector_model()
    mpc, gait = art_config_for_run(1.2)
    gait = dataclasses.replace(gait, contact_clock=True, clock_max_hold=2)
    fn = jax.jit(f32_precision(art_rollout_fn(250, mpc, gait, model=model)))
    w = fn(init_art_world(mpc), biped)
    assert float(w.metrics.falls) == 0
    x = np.array(w.sim.torso_state())
    assert x[3] > 7.0, x[3]  # > 0.70 m/s realized over 10 s


def test_host_clock_mirrors_jitted_clock():
    """advance_gait_clock_host (the MuJoCo-driver / realtime-loop mirror)
    tracks the jitted clock step-for-step over a random contact stream."""
    from biped_mpc_py_tpu.control.gait import advance_gait_clock_host

    mpc, gait = MpcConfig(), _mk(p=2, f=1, clock_max_hold=2)
    rng = np.random.default_rng(3)
    t_j, h_j = jnp.asarray(-mpc.dt), jnp.zeros((), jnp.int32)
    t_h, h_h = -mpc.dt, 0
    for _ in range(120):
        down = rng.random(2) < 0.7
        t_j, h_j = advance_gait_clock(
            t_j, h_j, jnp.asarray(down), mpc, gait
        )
        t_h, h_h = advance_gait_clock_host(t_h, h_h, down, mpc, gait)
        assert _step(t_j, mpc) == _step(t_h, mpc)
        assert int(h_j) == h_h


@pytest.mark.slow
def test_running_stabilized_population_statistics():
    """Round-5 stabilized running op point (art_config_for_run
    stabilized=True: ffs 0.77 + pitch-angle placement 0.2/0.15 + land
    frac 0.7, on the contact clock). At running cadence INDIVIDUAL
    outcomes flip on batch-composition f32 roundoff (measured: the same
    seed zero-falls in one batch shape and falls in another), so the pin
    is statistical: over 24 perturbed seeds x 30 s, the zero-fall count
    must stay >= 12 (measured rate 22/32 = 69%, vs 8/32 = 25%
    un-stabilized — the triple ~tripling the zero-fall rate is the
    large-effect bar that survives chaos; tools/sweep_alip.py p5-p8 +
    the 64-env battery in DESIGN_NOTES round 5), and the zero-fall
    survivors must cover >= 11.5 m in the first 15 s (measured mean
    12.8, min 12.7 — realized >= 0.77 sustained through 15 s, vs the
    10.0 m base). The deterministic post-15 s decay into the slow
    attractor remains — the architecture-equilibrium account is in
    DESIGN_NOTES round 5."""
    import dataclasses as dc

    from biped_mpc_py_tpu.models.biped import BipedParams
    from biped_mpc_py_tpu.parallel.rollout_art import art_config_for_run
    from biped_mpc_py_tpu.parallel.sweep import (
        art_sweep_fn,
        perturbed_worlds,
        stack_configs,
    )
    from biped_mpc_py_tpu.utils.precision import f32_precision

    n = 24
    configs = [art_config_for_run(1.2, stabilized=True)[0]] * n
    gait = dc.replace(
        GaitConfig(steps_per_phase=2, flight_steps=1),
        contact_clock=True, clock_max_hold=2,
    )
    biped = BipedParams()
    mb, ax = stack_configs(configs)
    w = perturbed_worlds(configs[0], n, jax.random.PRNGKey(29))
    fn = jax.jit(f32_precision(art_sweep_fn(125, gait, ax)))
    pos0 = np.array(jax.vmap(lambda s: s.torso_state()[3])(w.sim))
    x15 = None
    for seg in range(6):
        w = fn(w, biped, mb)
        if seg == 2:
            x15 = np.array(jax.vmap(lambda s: s.torso_state()[3])(w.sim))
    falls = np.array(w.metrics.falls)
    ok = falls == 0
    assert ok.sum() >= 12, (int(ok.sum()), falls)
    assert (x15[ok] - pos0[ok]).min() > 11.5, x15[ok] - pos0[ok]


@pytest.mark.slow
def test_srb_running_gait():
    """Running on the SRB abstraction (the reference's own layer): p=2 f=1
    at a 0.8 m/s command covers > 6 m in 10 s with zero falls (probe grid:
    0.72 realized at 0.8, 0.93 at 1.2, f=2 falls everywhere — the MPC's
    longer ballistic model again). The end-state velocity DECAYS toward the
    slow braking attractor here too — the attractor is a property of the
    control architecture, not of leg mass (DESIGN_NOTES round 4)."""
    import dataclasses as dc

    from biped_mpc_py_tpu.models.biped import BipedParams
    from biped_mpc_py_tpu.parallel.rollout import init_world, rollout_fn
    from biped_mpc_py_tpu.utils.precision import f32_precision

    mpc = dc.replace(
        MpcConfig(),
        x_cmd=jnp.zeros(12).at[5].set(0.55).at[9].set(0.8),
        swing_height=0.08, swing_z_sin2=True,
    )
    gait = GaitConfig(steps_per_phase=2, flight_steps=1)
    w = jax.jit(f32_precision(rollout_fn(250, mpc, gait)))(
        init_world(mpc), BipedParams()
    )
    assert float(w.metrics.falls) == 0
    assert float(w.sim.x_fb[3]) > 6.0, float(w.sim.x_fb[3])
