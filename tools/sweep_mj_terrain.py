"""MuJoCo rough-terrain battery (round 3): BASELINE config 4's terrain
half under stick friction — the engine's height field exported as a
MuJoCo hfield (sim/mjcf.py), the SAME terrain-adaptive references driving
both sims. Engine envelope: 4 cm 8/8 fields, 5-6 cm 7/8.

Each seed gets its own random field AND its own joint perturbation.
Usage: python tools/sweep_mj_terrain.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
from biped_mpc_py_tpu.config import GaitConfig  # noqa: E402
from biped_mpc_py_tpu.parallel.rollout_art import art_mpc_config  # noqa: E402
from biped_mpc_py_tpu.sim.contact import Terrain  # noqa: E402
from biped_mpc_py_tpu.sim.mj_driver import run_mujoco_closed_loop  # noqa: E402

SCALE = 2e-3
N_TICKS = 250
SEEDS = 4
ORACLE = dict(
    kp_hipyaw=3.0, kd_hipyaw=0.4, tau_z_max=4.0, swing_td_damp=8.0,
    swing_z_sin2=True,
)


def run(name, vx, amp, gait_p):
    x_cmd = jnp.zeros(12).at[5].set(0.55).at[9].set(vx)
    mpc = art_mpc_config(x_cmd=x_cmd, **ORACLE)
    ok = 0
    for seed in range(SEEDS):
        terr = Terrain.rough(jax.random.PRNGKey(100 + seed), amplitude=amp)
        dq = SCALE * np.random.default_rng(seed).standard_normal(10)
        _, xs, fell = run_mujoco_closed_loop(
            mpc, GaitConfig(gait_p), N_TICKS, dq0=dq, terrain=terr,
        )
        ok += not fell
    print(f"{name:24s} {ok}/{SEEDS}", flush=True)


def main():
    for amp in (0.02, 0.03, 0.04):
        run(f"in-place amp={amp}", 0.0, amp, 5)
    for amp in (0.02, 0.03):
        run(f"vx=0.15 amp={amp}", 0.15, amp, 4)


if __name__ == "__main__":
    main()
