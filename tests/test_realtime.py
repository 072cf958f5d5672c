"""Wall-clock real-time loop (runtime/realtime.py) driving a MuJoCo plant —
the deployment-shaped runtime for the reference README's "optimize for
real-time usage" TODO."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from biped_mpc_py_tpu.config import GaitConfig
from biped_mpc_py_tpu.models.biped import BipedParams
from biped_mpc_py_tpu.parallel.rollout_art import art_mpc_config
from biped_mpc_py_tpu.runtime.realtime import LoopStats, RealtimeLoop
from biped_mpc_py_tpu.sim.engine import (
    ArtState,
    com_feedback_state,
    sole_positions,
)
from biped_mpc_py_tpu.sim.mjcf import penalty_matched_solref, to_mjcf
from biped_mpc_py_tpu.sim.model import hector_model

try:
    import mujoco

    HAVE_MUJOCO = True
except Exception:  # pragma: no cover
    HAVE_MUJOCO = False

pytestmark = pytest.mark.skipif(not HAVE_MUJOCO, reason="mujoco missing")

MODEL = hector_model()
MJ_DT = 5e-4


class MujocoPlant:
    """MuJoCo CPU as the robot behind the Plant interface."""

    def __init__(self):
        from biped_mpc_py_tpu.sim.mj_driver import state_from_mj as _state_from_mj

        self._state_from_mj = _state_from_mj
        self.m = mujoco.MjModel.from_xml_string(
            to_mjcf(MODEL, MJ_DT, contact=True,
                    solref=penalty_matched_solref(MODEL))
        )
        self.d = mujoco.MjData(self.m)
        s0 = ArtState.standing()
        self.d.qpos[0:3] = np.array(s0.pos)
        self.d.qpos[3:7] = np.array(s0.quat)
        self.d.qpos[7:17] = np.array(s0.q)
        self.t = 0.0
        self._fb = jax.jit(
            lambda s: (com_feedback_state(MODEL, s), sole_positions(MODEL, s))
        )

    def _art_state(self):
        return self._state_from_mj(self.d, self.t)

    def read_state(self):
        s = self._art_state()
        x_fb, _ = self._fb(s)
        return np.asarray(x_fb), np.asarray(s.q), np.asarray(s.qd)

    def foot_positions(self):
        s = self._art_state()
        _, pf = self._fb(s)
        return np.asarray(pf)

    def apply(self, tau, dt):
        self.d.qfrc_applied[6:16] = np.asarray(tau)
        for _ in range(int(round(dt / MJ_DT))):
            mujoco.mj_step(self.m, self.d)
        self.t += dt


def test_realtime_loop_walks_mujoco_plant():
    """2 s of walking through the deadline-scheduled loop: the plant stays
    up, tick accounting and latency stats are coherent."""
    mpc, gait, biped = art_mpc_config(), GaitConfig(), BipedParams()
    plant = MujocoPlant()
    loop = RealtimeLoop(mpc, gait, biped)
    loop.warmup(plant)
    # as-fast-as-possible first (CI hosts are 1-core; wall-clock deadline
    # hits are measured separately below)
    stats = loop.run(plant, n_ticks=50, realtime=False)
    assert isinstance(stats, LoopStats)
    assert stats.n_ticks == 50
    assert plant.d.qpos[2] > 0.4  # still standing/walking
    assert stats.latency_p50_ms > 0
    assert stats.latency_max_ms >= stats.latency_p99_ms >= stats.latency_p50_ms


def test_realtime_deadline_accounting():
    """With deadlines enabled, misses are counted and the schedule
    re-anchors (no cascade): total wall time ~ n_ticks * dt + overruns."""
    import time

    mpc, gait, biped = art_mpc_config(), GaitConfig(gait_mode=0), BipedParams()
    plant = MujocoPlant()
    loop = RealtimeLoop(mpc, gait, biped)
    loop.warmup(plant)
    n = 25  # 1 s commanded
    t0 = time.monotonic()
    stats = loop.run(plant, n_ticks=n, realtime=True)
    wall = time.monotonic() - t0
    assert stats.n_ticks == n
    # wall time at least the scheduled duration minus one period
    assert wall >= n * mpc.dt - mpc.dt
    assert 0 <= stats.deadline_misses <= n
    # realtime_ok is the user-facing verdict helper
    ok = stats.realtime_ok(mpc.dt)
    assert ok == (
        stats.deadline_misses <= n * 0.01
        and stats.latency_p99_ms * 1e-3 <= mpc.dt
    )
