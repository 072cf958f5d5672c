"""MuJoCo lateral-stepping battery (round 3): BASELINE config 3's lateral
half under stick friction. Engine envelope: 0.1-0.15 m/s sustained vy,
world+body frame, zero falls. 5 seeds per cell at the robust oracle point
(td-damp + sin^2).

Usage: python tools/sweep_mj_lat.py
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
N_TICKS = 250
SEEDS = 5
ORACLE = dict(
    kp_hipyaw=3.0, kd_hipyaw=0.4, tau_z_max=4.0, swing_td_damp=8.0,
    swing_z_sin2=True,
)


def run(name, vy, body, gait_p):
    x_cmd = jnp.zeros(12).at[5].set(0.55).at[10].set(vy)
    mpc = art_mpc_config(x_cmd=x_cmd, cmd_body_frame=body, **ORACLE)
    ok = 0
    ys = []
    for seed in range(SEEDS):
        dq = SCALE * np.random.default_rng(seed).standard_normal(10)
        _, xs, fell = run_mujoco_closed_loop(
            mpc, GaitConfig(gait_p), N_TICKS, dq0=dq
        )
        ok += not fell
        if not fell:
            ys.append(xs[-1, 4])
    y = np.mean(ys) if ys else float("nan")
    print(
        f"{name:22s} {ok}/{SEEDS}  y_end~{y:+.2f} m "
        f"(v~{y / (N_TICKS * 0.04):+.2f})",
        flush=True,
    )


def main():
    for vy in (0.1, 0.15):
        run(f"world vy={vy} p4", vy, False, 4)
    run("body vy=0.1 p4", 0.1, True, 4)
    run("world vy=0.15 p5", 0.15, False, 5)


if __name__ == "__main__":
    main()
