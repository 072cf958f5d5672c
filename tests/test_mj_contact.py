"""Contact fidelity vs MuJoCo (north star: "contact forces match the MuJoCo
reference within tolerance on logged walking trajectories").

Method: the SAME controller (25 Hz MPC + 200 Hz low-level) runs closed-loop
in BOTH simulators — the framework's articulated engine (compliant
spring-damper point contact, sim/contact.py) and MuJoCo CPU on the exported
MJCF with toe/heel contact spheres whose solref is the analytic equivalent
of the penalty law (sim/mjcf.py::penalty_matched_solref). Per-foot normal
contact forces, duty factors, load distribution, and torso height are then
compared. Chaotic closed loops decohere pointwise over seconds, so the
assertions are on force statistics, which is what "contact fidelity" means
operationally (the reference has no simulator; MuJoCo is the strongest
available oracle, SURVEY.md §7 stage 8).
"""

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
from biped_mpc_py_tpu.sim.contact import contact_force_world
from biped_mpc_py_tpu.sim.engine import com_feedback_state, contact_point_states
from biped_mpc_py_tpu.sim.mj_driver import run_mujoco_closed_loop
from biped_mpc_py_tpu.sim.model import hector_model

try:
    import mujoco

    HAVE_MUJOCO = True
except Exception:  # pragma: no cover
    HAVE_MUJOCO = False

pytestmark = [
    pytest.mark.skipif(not HAVE_MUJOCO, reason="mujoco missing"),
    # the suite's dominant cost (~30 of 40 min): quick correctness
    # pass = pytest -m "not slow" (see conftest marker registration)
    pytest.mark.slow,
]

MG = 12.0 * 9.81

MODEL = hector_model()
BIPED = BipedParams()


def _run_mujoco(mpc, gait, n_ticks):
    """Closed loop in MuJoCo (shared driver: sim/mj_driver.py)."""
    return run_mujoco_closed_loop(mpc, gait, n_ticks, model=MODEL, biped=BIPED)


def _run_framework(mpc, gait, n_ticks):
    tick = jax.jit(
        lambda w: art_closed_loop_tick(w, mpc, gait, BIPED, MODEL)
    )

    @jax.jit
    def foot_forces(s):
        pts, vels, _, _ = contact_point_states(MODEL, s)
        f = contact_force_world(MODEL, pts, vels)  # (4,3)
        return jnp.stack([f[0, 2] + f[1, 2], f[2, 2] + f[3, 2]])

    w = init_art_world(mpc)
    forces, xs = [], []
    for _ in range(n_ticks):
        w = tick(w)
        forces.append(np.array(foot_forces(w.sim)))
        xs.append(np.array(com_feedback_state(MODEL, w.sim)))
        if float(w.metrics.falls) > 0:
            return np.array(forces), np.array(xs), True
    return np.array(forces), np.array(xs), False


# The oracle's pinned operating point. The SAME config drives both
# simulators within each comparison; it deviates from art_mpc_config's
# engine-robust defaults in two measured ways: tau_z_max=4 (the
# stick-friction-physical yaw-couple bound — the engine's compliant
# friction supports 8, MuJoCo's stick friction does not), and slightly
# stiffer foot-heading gains (the stick-contact yaw loop tolerates and
# needs them). Round 3 added swing_td_damp=8 (touchdown-retraction
# damping, control/swing.py): braking the swing foot's tangential
# velocity before impact removes the stick-friction drag impulse that
# made the round-2 branch CHAOTIC-MARGINAL (2/3 seeded +-2e-3 rad
# perturbations fell at every gain tried). The 10-seed battery
# (tools/sweep_mj10.py) then showed td-damp alone still falls 3/10
# in-place; adding the sin^2 zero-touchdown-velocity z profile
# (swing_z_sin2, control/swing.py) makes BOTH in-place and 0.15 m/s
# 10/10 — that pair is the pinned robust operating point
# (TestPerturbedRobustness).
ORACLE_MPC = dict(
    kp_hipyaw=3.0, kd_hipyaw=0.4, tau_z_max=4.0, swing_td_damp=8.0,
    swing_z_sin2=True,
)


@pytest.fixture(scope="module")
def standing_runs():
    mpc, gait = art_mpc_config(**ORACLE_MPC), GaitConfig(gait_mode=0)
    return _run_mujoco(mpc, gait, 50), _run_framework(mpc, gait, 50)


@pytest.fixture(scope="module")
def walking_runs():
    mpc, gait = art_mpc_config(**ORACLE_MPC), GaitConfig(gait_mode=1)
    return _run_mujoco(mpc, gait, 100), _run_framework(mpc, gait, 100)


class TestStandingContact:
    def test_no_falls(self, standing_runs):
        (_, _, fell_mj), (_, _, fell_fw) = standing_runs
        assert not fell_mj and not fell_fw

    def test_total_normal_force_is_weight_in_both(self, standing_runs):
        (f_mj, _, _), (f_fw, _, _) = standing_runs
        tot_mj = f_mj[25:].sum(axis=1).mean()
        tot_fw = f_fw[25:].sum(axis=1).mean()
        assert abs(tot_mj - MG) < 0.02 * MG, tot_mj
        assert abs(tot_fw - MG) < 0.02 * MG, tot_fw

    def test_load_split_matches(self, standing_runs):
        (f_mj, _, _), (f_fw, _, _) = standing_runs
        split_mj = f_mj[25:, 0].mean() / f_mj[25:].sum(axis=1).mean()
        split_fw = f_fw[25:, 0].mean() / f_fw[25:].sum(axis=1).mean()
        assert abs(split_mj - 0.5) < 0.02
        assert abs(split_fw - 0.5) < 0.02

    def test_height_matches(self, standing_runs):
        (_, x_mj, _), (_, x_fw, _) = standing_runs
        assert abs(x_mj[25:, 5].mean() - x_fw[25:, 5].mean()) < 0.01


class TestWalkingContact:
    """4 s of in-place walking under the same controller in both sims."""

    def test_both_walk_without_falling(self, walking_runs):
        (_, _, fell_mj), (_, _, fell_fw) = walking_runs
        assert not fell_mj and not fell_fw

    def test_total_stance_force_matches(self, walking_runs):
        (f_mj, _, _), (f_fw, _, _) = walking_runs
        tot_mj = f_mj[10:].sum(axis=1).mean()
        tot_fw = f_fw[10:].sum(axis=1).mean()
        # gait-average total normal force = weight in both (momentum
        # balance) and the two sims agree
        assert abs(tot_mj - MG) < 0.10 * MG, tot_mj
        assert abs(tot_fw - MG) < 0.10 * MG, tot_fw
        assert abs(tot_mj - tot_fw) < 0.10 * MG

    def test_per_foot_stance_forces_match(self, walking_runs):
        (f_mj, _, _), (f_fw, _, _) = walking_runs
        for i in range(2):
            st_mj = f_mj[f_mj[:, i] > 20, i].mean()
            st_fw = f_fw[f_fw[:, i] > 20, i].mean()
            assert abs(st_mj - st_fw) < 0.15 * max(st_mj, st_fw), (
                i, st_mj, st_fw,
            )

    def test_duty_factors_match(self, walking_runs):
        (f_mj, _, _), (f_fw, _, _) = walking_runs
        for i in range(2):
            duty_mj = (f_mj[:, i] > 20).mean()
            duty_fw = (f_fw[:, i] > 20).mean()
            assert abs(duty_mj - 0.5) < 0.1, duty_mj
            assert abs(duty_fw - 0.5) < 0.1, duty_fw
            assert abs(duty_mj - duty_fw) < 0.08

    def test_walking_height_matches(self, walking_runs):
        (_, x_mj, _), (_, x_fw, _) = walking_runs
        assert abs(x_mj[10:, 5].mean() - x_fw[10:, 5].mean()) < 0.015

    def test_early_window_force_tracking(self, walking_runs):
        """Before chaotic decoherence (~first second) the per-foot force
        TRAJECTORIES track each other, not just their statistics."""
        (f_mj, _, _), (f_fw, _, _) = walking_runs
        dev = np.abs(f_mj[:25] - f_fw[:25]).mean()
        assert dev < 0.25 * MG, dev


class TestPerturbedRobustness:
    """MuJoCo transfer is robust, not just deterministic (VERDICT round-2
    missing #2): >= 8/10 seeded +-2e-3 rad initial-joint-perturbation
    walks survive 10 s (250 ticks) at the oracle config, for BOTH
    in-place walking and a 0.15 m/s forward command. Round 2 fell on 2/3
    perturbed seeds; touchdown-retraction damping (swing_td_damp,
    control/swing.py) closed it — the full candidate matrix is in
    tools/sweep_mj.py."""

    SCALE = 2e-3
    N_SEEDS = 10

    def _survival(self, vx, gait):
        x_cmd = jnp.zeros(12).at[5].set(0.55).at[9].set(vx)
        mpc = art_mpc_config(x_cmd=x_cmd, **ORACLE_MPC)
        ok = 0
        for seed in range(self.N_SEEDS):
            dq = self.SCALE * np.random.default_rng(seed).standard_normal(10)
            _, _, fell = run_mujoco_closed_loop(
                mpc, gait, 250, model=MODEL, biped=BIPED, dq0=dq
            )
            ok += not fell
        return ok

    def test_in_place_10s(self):
        ok = self._survival(0.0, GaitConfig())
        assert ok >= 8, f"{ok}/10 perturbed in-place walks survived"

    def test_forward_015_10s(self):
        ok = self._survival(0.15, GaitConfig(4))
        assert ok >= 8, f"{ok}/10 perturbed 0.15 m/s walks survived"
