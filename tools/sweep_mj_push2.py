"""MuJoCo push-recovery diagnosis (round 3): why is -x (backward) weak?

First battery: +x/+y/-y recover to 0.4-0.5, -x only 1/3 at 0.3. Probes:
shove-phase dependence, td-damp ablation (touchdown braking may slow the
backward recovery step), capture gain.

Usage: python tools/sweep_mj_push2.py
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
N_TICKS = 150
SEEDS = 3
ORACLE = dict(
    kp_hipyaw=3.0, kd_hipyaw=0.4, tau_z_max=4.0, swing_td_damp=8.0,
    swing_z_sin2=True,
)


def run(name, kw, shove):
    mpc = art_mpc_config(x_cmd=jnp.zeros(12).at[5].set(0.55), **kw)
    ok = 0
    for seed in range(SEEDS):
        dq = SCALE * np.random.default_rng(seed).standard_normal(10)
        _, xs, fell = run_mujoco_closed_loop(
            mpc, GaitConfig(), N_TICKS, dq0=dq, shove=shove,
        )
        ok += not fell
    print(f"{name:30s} {ok}/{SEEDS}", flush=True)


def main():
    for mag in (0.15, 0.2, 0.25):
        run(f"-x {mag} oracle", ORACLE, (50, -mag, 0.0))
    for mag in (0.3, 0.35):
        run(f"-y {mag} oracle", ORACLE, (50, 0.0, -mag))


if __name__ == "__main__":
    main()
