"""Backward-push -0.35 extension: ALIP/pitch placement vs the overshoot
limit cycle, plus controls (round 5, VERDICT item 7 follow-up).

sweep_push_sched.py measured capture scheduling (capture_sched 0.3/0.6)
decisively negative at -x 0.35/0.40 (0/3 everywhere) while +x 0.45
passes at the round-5 defaults. This battery probes the remaining
round-5 placement knobs against the instrumented mechanism (recovery
succeeds, forward overshoot oscillation grows into pitch collapse):

  am    raibert_am_y (pitch angular-momentum placement: nose-down rate
        during the overshoot steps the catch foot further ahead)
  pp    raibert_pitch_place (pitch-angle placement feedback)
  ctrl  -0.30 control (round-4 pin: expect 3/3) and +0.50 forward edge

Usage: python tools/sweep_push_sched2.py (CPU)
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


def cell(tag: str, dvx: float, seeds=3, n_ticks=150, **knobs):
    mpc = art_mpc_config(
        x_cmd=jnp.zeros(12).at[5].set(0.55), **ORACLE, **knobs
    )
    ok = 0
    for seed in range(seeds):
        dq = 2e-3 * np.random.default_rng(seed).standard_normal(10)
        _, xs, fell = run_mujoco_closed_loop(
            mpc, GaitConfig(), n_ticks, model=MODEL, biped=BIPED,
            dq0=dq, shove=(50, dvx, 0.0),
        )
        ok += not fell
    print(f"  {tag:22s} dvx={dvx:+.2f}: {ok}/{seeds}", flush=True)
    return ok


if __name__ == "__main__":
    print("== controls ==")
    cell("base", -0.30)
    cell("base", 0.50)
    print("== -0.35: momentum/pitch placement ==")
    cell("am_y=0.05", -0.35, raibert_am_y=0.05)
    cell("am_y=0.10", -0.35, raibert_am_y=0.10)
    cell("pp=0.10", -0.35, raibert_pitch_place=0.10)
    cell("am_y=0.05 sched=0.3", -0.35, raibert_am_y=0.05, capture_sched=0.3)
    cell("am_y=0.10 pp=0.10", -0.35, raibert_am_y=0.10,
         raibert_pitch_place=0.10)
