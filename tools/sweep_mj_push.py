"""MuJoCo push-recovery battery (round 3): BASELINE config 4's shove half
under stick friction. Engine envelope: 0.5 m/s omnidirectional (0.7
lateral). A world-frame base-velocity impulse hits at tick 50 (2 s into
in-place walking, mid-gait); 3 seeds per cell at the robust oracle point.

Usage: python tools/sweep_mj_push.py
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
from biped_mpc_py_tpu.sim.mj_driver import run_mujoco_closed_loop  # noqa: E402

SCALE = 2e-3
N_TICKS = 150  # 2 s pre-shove + 4 s recovery
SEEDS = 3
ORACLE = dict(
    kp_hipyaw=3.0, kd_hipyaw=0.4, tau_z_max=4.0, swing_td_damp=8.0,
    swing_z_sin2=True,
)
DIRS = {"+x": (1, 0), "-x": (-1, 0), "+y": (0, 1), "-y": (0, -1)}


def run(mag):
    mpc = art_mpc_config(x_cmd=jnp.zeros(12).at[5].set(0.55), **ORACLE)
    for name, (ux, uy) in DIRS.items():
        ok = 0
        for seed in range(SEEDS):
            dq = SCALE * np.random.default_rng(seed).standard_normal(10)
            _, xs, fell = run_mujoco_closed_loop(
                mpc, GaitConfig(), N_TICKS, dq0=dq,
                shove=(50, mag * ux, mag * uy),
            )
            ok += not fell
        print(f"shove {mag:.1f} {name}: {ok}/{SEEDS}", flush=True)


def main():
    for mag in (0.3, 0.4, 0.5):
        run(mag)


if __name__ == "__main__":
    main()
