"""Cross-sim capability TRANSFER pins (round 3): the SAME controller
closed-loop in stick-friction MuJoCo reproduces the engine's turning,
lateral, push, transition, curve, speed, and rough-terrain envelopes
(split from test_mj_contact.py so the two heaviest MuJoCo modules
parallelize; that module keeps the contact-force oracle + the 10-seed
robustness battery)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from biped_mpc_py_tpu.config import GaitConfig
from biped_mpc_py_tpu.models.biped import BipedParams
from biped_mpc_py_tpu.parallel.rollout_art import (
    art_closed_loop_tick,
    art_mpc_config,
    init_art_world,
)
from biped_mpc_py_tpu.sim.mj_driver import run_mujoco_closed_loop
from biped_mpc_py_tpu.sim.model import hector_model

try:
    import mujoco  # noqa: F401

    HAVE_MUJOCO = True
except Exception:  # pragma: no cover
    HAVE_MUJOCO = False

pytestmark = [
    pytest.mark.skipif(not HAVE_MUJOCO, reason="mujoco missing"),
    # the suite's dominant cost (~30 of 40 min): quick correctness
    # pass = pytest -m "not slow" (see conftest marker registration)
    pytest.mark.slow,
]

MODEL = hector_model()
BIPED = BipedParams()

# the robust stick-friction operating point (see test_mj_contact.py)
ORACLE_MPC = dict(
    kp_hipyaw=3.0, kd_hipyaw=0.4, tau_z_max=4.0, swing_td_damp=8.0,
    swing_z_sin2=True,
)


class TestTurningTransfer:
    """The UNIFIED cross-sim turning operating point (round 3): body-frame
    0.3 rad/s command, foot-heading wrench 3.0/0.4, sin^2 + td-damp, p=3
    cadence — 5/5 perturbed seeds survive in MuJoCo AND on the engine,
    with the SAME realized rate ~0.28 rad/s (93% tracking) in both
    (tools/sweep_mj_turn.py, tools/sweep_turn_unify.py). Beyond 0.3 the
    realized rate saturates ~0.3 rad/s in both sims regardless of
    command. This pins 3 seeds in MuJoCo (runtime) and the realized-rate
    agreement with the engine."""

    WZ = 0.3
    TURN_MPC = dict(
        kp_hipyaw=3.0, kd_hipyaw=0.4, tau_z_max=4.0, swing_td_damp=8.0,
        swing_z_sin2=True, cmd_body_frame=True,
    )

    def _mpc(self):
        x_cmd = jnp.zeros(12).at[5].set(0.55).at[8].set(self.WZ)
        return art_mpc_config(x_cmd=x_cmd, **self.TURN_MPC)

    def test_mujoco_turn_03_matches_engine(self):
        from biped_mpc_py_tpu.sim.engine import com_feedback_state

        mpc, gait = self._mpc(), GaitConfig(3)
        rates_mj = []
        for seed in range(3):
            dq = 2e-3 * np.random.default_rng(seed).standard_normal(10)
            _, xs, fell = run_mujoco_closed_loop(
                mpc, gait, 250, model=MODEL, biped=BIPED, dq0=dq
            )
            assert not fell, f"MuJoCo turn fell (seed {seed})"
            rates_mj.append(xs[-1, 2] / (250 * mpc.dt))
        rate_mj = float(np.mean(rates_mj))

        tick = jax.jit(
            lambda w: art_closed_loop_tick(w, mpc, gait, BIPED, MODEL)
        )
        w = init_art_world(mpc)
        for _ in range(250):
            w = tick(w)
        assert float(w.metrics.falls) == 0
        rate_fw = float(
            com_feedback_state(MODEL, w.sim)[2] / (250 * mpc.dt)
        )
        # both track ~93% of the 0.3 command and agree with each other
        assert rate_mj > 0.24, rate_mj
        assert rate_fw > 0.24, rate_fw
        assert abs(rate_mj - rate_fw) < 0.05, (rate_mj, rate_fw)


class TestLateralTransfer:
    """BASELINE config 3's lateral half under stick friction (round 3):
    a sustained 0.15 m/s lateral command walks 5/5 perturbed seeds in
    MuJoCo with the SAME displacement as the engine (0.86-0.91 m vs
    0.89 m in 10 s — tools/sweep_mj_lat.py). Pins 3 MuJoCo seeds at the
    stick-physical oracle point and the displacement-agreement band vs
    the engine at ITS physical operating point (tau_z_max 8 vs 4 — the
    documented compliant-vs-stick yaw-couple split; the engine falls at
    tz=4 on sustained velocity commands)."""

    def test_mujoco_lateral_015_matches_engine(self):
        from biped_mpc_py_tpu.sim.engine import com_feedback_state

        x_cmd = jnp.zeros(12).at[5].set(0.55).at[10].set(0.15)
        gait = GaitConfig(4)
        mpc_mj = art_mpc_config(x_cmd=x_cmd, **ORACLE_MPC)
        ys = []
        for seed in range(3):
            dq = 2e-3 * np.random.default_rng(seed).standard_normal(10)
            _, xs, fell = run_mujoco_closed_loop(
                mpc_mj, gait, 250, model=MODEL, biped=BIPED, dq0=dq
            )
            assert not fell, f"MuJoCo lateral fell (seed {seed})"
            ys.append(xs[-1, 4])
        y_mj = float(np.mean(ys))

        mpc_fw = art_mpc_config(x_cmd=x_cmd)  # engine defaults (tz=8)
        tick = jax.jit(
            lambda w: art_closed_loop_tick(w, mpc_fw, gait, BIPED, MODEL)
        )
        w = init_art_world(mpc_fw)
        for _ in range(250):
            w = tick(w)
        assert float(w.metrics.falls) == 0
        y_fw = float(com_feedback_state(MODEL, w.sim)[4])
        assert y_mj > 0.6, y_mj
        assert y_fw > 0.6, y_fw
        assert abs(y_mj - y_fw) < 0.25, (y_mj, y_fw)


class TestPushTransfer:
    """BASELINE config 4's shove half under stick friction (round 3):
    base-velocity impulses at t=2 s into in-place walking, recovered by
    stepping. The measured MuJoCo envelope (tools/sweep_mj_push*.py,
    3 seeds/cell) is direction-asymmetric: +x 0.4, -x 0.25, +y 0.5,
    -y 0.3 m/s at THIS shove phase. The lateral asymmetry is PROVEN
    stance-phase coupling, not a y-direction weakness: shoving at the
    opposite stance phase flips it exactly (+y 0/3 and -y 3/3 at ticks
    55/57, vs +y 3/3 / -y 0/3 at tick 50) — a 0.4 m/s shove toward the
    STANCE side fails because the recovery step would cross the stance
    leg (the classic biped leg-crossing limit). Backward is
    phase-independent: no gain variant tried (td-damp off, rg 0.7,
    ffs 1.2, 4 shove phases) lifts -x past 0.3 — a stick-friction
    backward-stepping limit, documented in DESIGN_NOTES.

    ROUND 4 closed the -x mechanism (tools/sweep_mj_push3.py): the
    stance foot's line-foot HEEL row sits ACTIVE every tick of a
    backward recovery — the QP saturates nose-up CoP authority at the
    reference's shrunk 0.03 m heel lever (toe keeps 0.08: the +x/-x
    asymmetry). Widening the margin (lf_heel_shrink 0.02 -> 0.015,
    lever 0.035) lifts -x 0.3 from 1/3 to 3/3 seeds; more (0.005-0.01)
    tips the foot during plain walking, and -x 0.35 remains 0-1/3 under
    every rebound knob — the surviving limit is the post-recovery
    forward-overshoot oscillation, also instrumented in DESIGN_NOTES.

    ROUND 5 closed the -x 0.35 question (tools/sweep_push_sched*.py):
    the post-recovery forward-overshoot limit cycle is NOT damped by
    any placement-side mechanism — capture scheduling (capture_sched
    0.3/0.6), ALIP pitch-momentum placement (raibert_am_y 0.05/0.10),
    pitch-angle placement (0.10), and their combos are all 0/3, and
    scheduling even kills the otherwise-passing +x 0.45 recovery
    (3/3 -> 0/3). The measured envelope at the round-5 defaults (heel
    margin 0.015 folded into art_mpc_config): **+x 0.45 / -x 0.30**
    (+0.50 is 1/3) — the -x cap is the heel-CoP geometry plus the
    overshoot cycle, recorded as the architecture boundary.

    Round 5 also RE-MEASURED the lateral edge at the shipped defaults
    (6 seeds): +y 0.50 is now a 3/6 coin-flip — the heel-margin default
    shuffles which seeds survive (the f32 chaos documented for running
    cadence operates at the push edge too) — while +y 0.45 is 6/6.
    The robust lateral envelope is 0.45, pinned below.

    Battery: 3 seeds/cell in tools/sweep_mj_push*.py; PINNED here: 2
    seeds/cell for suite runtime (forward and lateral cases pinned at
    the round-5 robust edges)."""

    CASES = [(0.45, 0.0), (-0.25, 0.0), (0.0, 0.45), (0.0, -0.3)]

    def test_push_recovery_envelope(self):
        mpc = art_mpc_config(
            x_cmd=jnp.zeros(12).at[5].set(0.55), **ORACLE_MPC
        )
        for dvx, dvy in self.CASES:
            for seed in range(2):
                dq = 2e-3 * np.random.default_rng(seed).standard_normal(10)
                _, _, fell = run_mujoco_closed_loop(
                    mpc, GaitConfig(), 150, model=MODEL, biped=BIPED,
                    dq0=dq, shove=(50, dvx, dvy),
                )
                assert not fell, (dvx, dvy, seed)

    def test_backward_push_03_with_heel_margin(self):
        """-x 0.3 at the round-4 heel margin (battery 3/3; pinned 2
        seeds): the heel-CoP mechanism fix in action — the same shove
        that recovers 1/3 at the reference margin."""
        mpc = art_mpc_config(
            x_cmd=jnp.zeros(12).at[5].set(0.55), lf_heel_shrink=0.015,
            **ORACLE_MPC,
        )
        for seed in range(2):
            dq = 2e-3 * np.random.default_rng(seed).standard_normal(10)
            _, _, fell = run_mujoco_closed_loop(
                mpc, GaitConfig(), 150, model=MODEL, biped=BIPED,
                dq0=dq, shove=(50, -0.3, 0.0),
            )
            assert not fell, seed


class TestTransitionTransfer:
    """Runtime stand -> walk -> stand under stick friction (the engine
    analogs: test_articulated_gait_transitions /
    test_rollout.py::test_gait_transitions_stand_walk_stand). gait_mode
    is consumed only by the host-level contact schedule, so the MuJoCo
    driver switches it mid-run with no re-jit (gait_schedule)."""

    def test_mujoco_stand_walk_stand(self):
        mpc = art_mpc_config(
            x_cmd=jnp.zeros(12).at[5].set(0.55), **ORACLE_MPC
        )
        for seed in range(2):
            dq = 2e-3 * np.random.default_rng(seed).standard_normal(10)
            _, xs, fell = run_mujoco_closed_loop(
                mpc, GaitConfig(gait_mode=0), 200, model=MODEL, biped=BIPED,
                dq0=dq,
                gait_schedule=[(50, GaitConfig(gait_mode=1)),
                               (150, GaitConfig(gait_mode=0))],
            )
            assert not fell, seed
            # settled back at stance height with decayed sway
            assert abs(xs[-1, 5] - 0.548) < 0.03, (seed, xs[-1, 5])
            assert np.abs(xs[-1, 9:12]).max() < 0.12, seed


class TestCurveTransfer:
    """Curved walking under stick friction (round 3): the engine's curve
    operating point (body-frame, no foot-heading wrench, yaw leak 0.12 —
    art_config_for_turn's vx branch) at the stick-physical tau_z_max=4
    walks wz=0.2 + vx=0.3 on 3/3 perturbed seeds in MuJoCo (yaw ~1.4 rad
    over 10 s, ~2.3 m of arc); wz=0.3 + vx=0.4 at p=2 is also 3/3.
    The fh3 unified point is curve-UNSTABLE in MuJoCo too (1/3) —
    matching the engine, where the wrench destabilizes curves.

    Battery: 3 seeds in tools/sweep_mj_turn.py's curve block; PINNED
    here: 2 seeds for suite runtime."""

    def test_mujoco_curve_02_03(self):
        x_cmd = jnp.zeros(12).at[5].set(0.55).at[8].set(0.2).at[9].set(0.3)
        mpc = art_mpc_config(
            x_cmd=x_cmd, cmd_body_frame=True, kp_hipyaw=0.0, kd_hipyaw=0.0,
            cmd_leak_yaw=0.12, tau_z_max=4.0, swing_td_damp=8.0,
            swing_z_sin2=True,
        )
        for seed in range(2):
            dq = 2e-3 * np.random.default_rng(seed).standard_normal(10)
            _, xs, fell = run_mujoco_closed_loop(
                mpc, GaitConfig(3), 250, model=MODEL, biped=BIPED, dq0=dq
            )
            assert not fell, seed
            assert xs[-1, 2] > 1.0, (seed, xs[-1, 2])  # heading advanced
            assert np.hypot(xs[-1, 3], xs[-1, 4]) > 1.8, seed  # real arc


class TestSpeedTransfer:
    """Stick-friction walking SPEED transfer (round 3): the speed-scaled
    p=2 cadence walks 0.3 and 0.5 m/s commands in MuJoCo on 4/4
    perturbed seeds (90%/86% tracking); 0.6 needs the soft-capture
    tuning and still realizes ~0.42, and 0.7+ falls — the MuJoCo
    realized ceiling is ~0.43 m/s, which is ALSO what the engine
    realizes at a 0.5 command (tools/sweep_vint.py: 0.43) — the two
    sims share the transport-loss curve. Pins 0.5 m/s, 3 seeds, with
    the engine-agreement band."""

    def test_mujoco_05_speed_matches_engine(self):
        from biped_mpc_py_tpu.sim.engine import com_feedback_state

        x_cmd = jnp.zeros(12).at[5].set(0.55).at[9].set(0.5)
        gait = GaitConfig(2)
        mpc_mj = art_mpc_config(x_cmd=x_cmd, **ORACLE_MPC)
        xs_end = []
        for seed in range(3):
            dq = 2e-3 * np.random.default_rng(seed).standard_normal(10)
            _, xs, fell = run_mujoco_closed_loop(
                mpc_mj, gait, 250, model=MODEL, biped=BIPED, dq0=dq
            )
            assert not fell, f"MuJoCo 0.5 m/s fell (seed {seed})"
            xs_end.append(xs[-1, 3])
        x_mj = float(np.mean(xs_end))

        mpc_fw = art_mpc_config(
            x_cmd=x_cmd, swing_z_sin2=True
        )  # engine defaults (tz=8)
        tick = jax.jit(
            lambda w: art_closed_loop_tick(w, mpc_fw, gait, BIPED, MODEL)
        )
        w = init_art_world(mpc_fw)
        for _ in range(250):
            w = tick(w)
        assert float(w.metrics.falls) == 0
        x_fw = float(com_feedback_state(MODEL, w.sim)[3])
        assert x_mj > 3.5, x_mj
        assert x_fw > 3.5, x_fw
        assert abs(x_mj - x_fw) < 0.8, (x_mj, x_fw)


class TestRunningTransfer:
    """MuJoCo RUNNING (round 5: the yaw spin-out defeated). The round-4
    stack hopped 1.5-3 s in stick-friction MuJoCo then spun out in yaw;
    the round-5 batteries (tools/sweep_mj_run.py r5-r5g) isolated THREE
    composable mechanisms, each necessary (single-knob ablations fall at
    1.5-3 s):

      swing_land_frac 0.7   the swing descent lag left the sole 2-3 cm
                            airborne at scheduled touchdown under stick
                            contact — the terrain round's missed-
                            touchdown cascade, at running cadence
      flight_yaw_kd 1.0     flight-phase reaction-wheel hip-yaw damping
                            (config.flight_yaw_kd): the only yaw channel
                            with no foot down
      ramped spin-up        0.4 -> 0.6 -> 0.8 m/s over 4 s (the
                            cmd_schedule joystick channel): cold-start
                            overdrive at a fixed 0.8 command excites the
                            stick-friction yaw ratchet on 2/5 seeds
                            before the gait is established

    Battery: 5/5 perturbed seeds x 10 s zero-fall, heading held to
    |yaw| <= 0.06 rad while GENUINELY hopping (p2f1 flight gait,
    contact-sensed clock); unramped 20 s windows hold 3/3 (speed decays
    to the slow-hop attractor but never falls). Pinned: 3 seeds x 10 s.
    Reference bar: simulator compatibility, ``README.md:5-7``."""

    RUN_MPC = dict(
        tau_z_max=4.0, kp_hipyaw=3.0, kd_hipyaw=0.4, swing_td_damp=8.0,
        swing_height=0.06, flight_yaw_kd=1.0, swing_land_frac=0.7,
    )

    def test_mujoco_running_10s_ramped(self):
        from biped_mpc_py_tpu.parallel.rollout_art import art_config_for_run
        import dataclasses as dc

        mpc, gait = art_config_for_run(0.8, **self.RUN_MPC)
        gait = dc.replace(gait, contact_clock=True, clock_max_hold=2)

        def xc(v):
            return np.array(jnp.zeros(12).at[5].set(0.55).at[9].set(v))

        sched = [(0, xc(0.4)), (50, xc(0.6)), (100, xc(0.8))]
        for seed in range(3):
            dq = 2e-3 * np.random.default_rng(seed).standard_normal(10)
            _, xs, fell = run_mujoco_closed_loop(
                mpc, gait, 250, model=MODEL, biped=BIPED, dq0=dq,
                cmd_schedule=sched,
            )
            assert not fell, f"MuJoCo running fell (seed {seed})"
            assert xs[-1, 3] > 4.5, (seed, xs[-1, 3])  # ~0.54 m/s net
            assert abs(xs[-1, 2]) < 0.3, (seed, xs[-1, 2])  # heading held


class TestTerrainTransfer:
    """BASELINE config 4's rough-terrain half under stick friction
    (round 3): the engine's height field exported as a MuJoCo hfield
    (sim/mjcf.py::to_mjcf terrain + set_hfield_data), the SAME
    terrain-adaptive references driving both sims. Battery
    (tools/sweep_mj_terrain.py, random field + joint perturbation per
    seed): 3 cm amplitude walks 4/4 in-place AND at 0.15 m/s; 4 cm is
    marginal (2/4; the engine does 8/8 — its compliant contact forgives
    bump impacts stick friction does not). Requires the enlarged 2 cm
    contact spheres: the penalty-matched soft contact penetrates past a
    5 mm sphere's center at touchdown and WEDGES in MuJoCo's hfield
    prism collider (1.7 kN garbage side-contacts — the round-3 terrain
    block, see mjcf.py sphere_r docs).

    Round 4 closed the 4 cm gap (tools/sweep_mj_terrain2.py): the diag
    trace shows the falls are a missed-touchdown cascade (scheduled
    stance ticks with ZERO contact force — the sole hangs over locally
    lower ground than the height sampled at the target xy — pitch
    diverges, then multi-kN hfield wedge spikes finish it), and
    swing_td_overdrive=0.02 (late-swing z-target driven 2 cm below the
    sampled ground) lifts 4 cm from 3/4 to 4/4. It is an operating-
    point knob (0.02 at 3 cm regresses to 2/4), so the 3 cm test keeps
    overdrive 0 and only the 4 cm test enables it.

    Battery: 4 seeds/cell in tools/sweep_mj_terrain*.py; PINNED here: 2
    seeds/cell for suite runtime."""

    def test_mujoco_3cm_terrain_10s(self):
        from biped_mpc_py_tpu.sim.contact import Terrain

        for vx, gait in ((0.0, GaitConfig()), (0.15, GaitConfig(4))):
            x_cmd = jnp.zeros(12).at[5].set(0.55).at[9].set(vx)
            mpc = art_mpc_config(x_cmd=x_cmd, **ORACLE_MPC)
            for seed in range(2):
                terr = Terrain.rough(
                    jax.random.PRNGKey(100 + seed), amplitude=0.03
                )
                dq = 2e-3 * np.random.default_rng(seed).standard_normal(10)
                _, _, fell = run_mujoco_closed_loop(
                    mpc, gait, 250, model=MODEL, biped=BIPED, dq0=dq,
                    terrain=terr,
                )
                assert not fell, (vx, seed)

    def test_mujoco_4cm_terrain_contact_clock_10s(self):
        """4 cm in-place with the contact-sensed gait clock
        (GaitConfig.contact_clock, clock_max_hold=2) and NO overdrive:
        the schedule waits for the real touchdown (MuJoCo contact
        forces), closing the missed-touchdown cascade amplitude-
        uniformly — battery 4/4 at BOTH 3 cm and 4 cm with this one
        setting (vs the overdrive's 4cm-vs-3cm tradeoff). Pinned: seeds
        0 and 1 (seed 1 is the baseline fall)."""
        import dataclasses

        from biped_mpc_py_tpu.sim.contact import Terrain

        mpc = art_mpc_config(
            x_cmd=jnp.zeros(12).at[5].set(0.55), **ORACLE_MPC,
        )
        gait = dataclasses.replace(
            GaitConfig(), contact_clock=True, clock_max_hold=2
        )
        for seed in range(2):
            terr = Terrain.rough(
                jax.random.PRNGKey(100 + seed), amplitude=0.04
            )
            dq = 2e-3 * np.random.default_rng(seed).standard_normal(10)
            _, _, fell = run_mujoco_closed_loop(
                mpc, gait, 250, model=MODEL, biped=BIPED,
                dq0=dq, terrain=terr,
            )
            assert not fell, seed

    def test_mujoco_4cm_terrain_overdrive_10s(self):
        """4 cm in-place with swing_td_overdrive=0.02 (round 4 fix).
        Battery 4/4 (tools/sweep_mj_terrain2.py cells
        swing_td_overdrive=0.02); pinned: seeds 0 and 1 — seed 1 is the
        missed-touchdown fall the overdrive closes (3/4 -> 4/4)."""
        from biped_mpc_py_tpu.sim.contact import Terrain

        mpc = art_mpc_config(
            x_cmd=jnp.zeros(12).at[5].set(0.55),
            swing_td_overdrive=0.02, **ORACLE_MPC,
        )
        for seed in range(2):
            terr = Terrain.rough(
                jax.random.PRNGKey(100 + seed), amplitude=0.04
            )
            dq = 2e-3 * np.random.default_rng(seed).standard_normal(10)
            _, _, fell = run_mujoco_closed_loop(
                mpc, GaitConfig(), 250, model=MODEL, biped=BIPED,
                dq0=dq, terrain=terr,
            )
            assert not fell, seed
