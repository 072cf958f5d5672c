"""Backward-push overshoot damping via capture scheduling (round 5,
VERDICT item 7).

Round 4 closed the -x 0.3 envelope with the heel-margin fix (now the
art_mpc_config default, lf_heel_shrink=0.015) and instrumented the
surviving -x 0.35 limit: the recovery SUCCEEDS, then overshoots forward
and the reversal oscillation grows into a pitch collapse — a
placement/momentum limit cycle. MpcConfig.capture_sched was built as
the damping knob (capture coefficient scheduled on |v - v_cmd|: strong
placement response only while shoved, zero effect in steady walking
since the base raibert_capture_gain stays 0).

Grid: capture_sched x shove magnitude x 3 seeds, 150 ticks (6 s),
stick-friction MuJoCo at the round-3 oracle point.

Usage: python tools/sweep_push_sched.py [group]   (CPU)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from biped_mpc_py_tpu.config import GaitConfig  # noqa: E402
from biped_mpc_py_tpu.models.biped import BipedParams  # noqa: E402
from biped_mpc_py_tpu.parallel.rollout_art import art_mpc_config  # noqa: E402
from biped_mpc_py_tpu.sim.mj_driver import run_mujoco_closed_loop  # noqa: E402
from biped_mpc_py_tpu.sim.model import hector_model  # noqa: E402

ORACLE = dict(
    kp_hipyaw=3.0, kd_hipyaw=0.4, tau_z_max=4.0, swing_td_damp=8.0,
    swing_z_sin2=True,
)
MODEL = hector_model()
BIPED = BipedParams()


def cell(sched: float, dvx: float, seeds=3, n_ticks=150):
    mpc = art_mpc_config(
        x_cmd=jnp.zeros(12).at[5].set(0.55), capture_sched=sched, **ORACLE
    )
    ok = 0
    for seed in range(seeds):
        dq = 2e-3 * np.random.default_rng(seed).standard_normal(10)
        _, xs, fell = run_mujoco_closed_loop(
            mpc, GaitConfig(), n_ticks, model=MODEL, biped=BIPED,
            dq0=dq, shove=(50, dvx, 0.0),
        )
        ok += not fell
    print(f"  sched={sched:.1f} dvx={dvx:+.2f}: {ok}/{seeds}", flush=True)
    return ok


if __name__ == "__main__":
    for dvx in (-0.35, -0.40):
        print(f"== backward shove {dvx} ==")
        for sched in (0.0, 0.3, 0.6):
            cell(sched, dvx)
    # symmetry check: does scheduling also move the +x edge?
    print("== forward shove +0.45 ==")
    for sched in (0.0, 0.3):
        cell(sched, 0.45)
