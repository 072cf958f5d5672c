"""MuJoCo turning battery (round 3): push past the 0.2 rad/s validation.

Prior state: 3/3 seeds at 0.2 rad/s, 2/3 at 0.3 (fh3 + td-damp, p=5 —
tools/sweep_mj.py::run_turn_cell). Candidates here: the sin^2 touchdown
profile (which took in-place robustness from 7/10 to 10/10) and the
engine turn op's faster p=3 cadence, 5 seeds per cell.

Usage: python tools/sweep_mj_turn.py
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

# all body-frame mode (the turning semantics), stick-physical tz=4
BASE = dict(cmd_body_frame=True, tau_z_max=4.0, swing_td_damp=8.0)
CELLS = {
    "fh3 p5": (dict(kp_hipyaw=3.0, kd_hipyaw=0.4, **BASE), GaitConfig(5)),
    "fh3+sin2 p5": (
        dict(kp_hipyaw=3.0, kd_hipyaw=0.4, swing_z_sin2=True, **BASE),
        GaitConfig(5),
    ),
    "fh3+sin2 p3": (
        dict(kp_hipyaw=3.0, kd_hipyaw=0.4, swing_z_sin2=True, **BASE),
        GaitConfig(3),
    ),
    "fh0+sin2+leak p3": (
        dict(kp_hipyaw=0.0, kd_hipyaw=0.0, cmd_leak_yaw=0.12,
             swing_z_sin2=True, **BASE),
        GaitConfig(3),
    ),
    "fh3+sin2+lk12 p3": (
        dict(kp_hipyaw=3.0, kd_hipyaw=0.4, cmd_leak_yaw=0.12,
             swing_z_sin2=True, **BASE),
        GaitConfig(3),
    ),
    "fh1.5+sin2 p3": (
        dict(kp_hipyaw=1.5, kd_hipyaw=0.2, swing_z_sin2=True, **BASE),
        GaitConfig(3),
    ),
    "fh3+sin2 p4": (
        dict(kp_hipyaw=3.0, kd_hipyaw=0.4, swing_z_sin2=True, **BASE),
        GaitConfig(4),
    ),
}


def run(name, kw, gait, wz):
    x_cmd = jnp.zeros(12).at[5].set(0.55).at[8].set(wz)
    mpc = art_mpc_config(x_cmd=x_cmd, **kw)
    ok = 0
    yaws = []
    for seed in range(SEEDS):
        dq = SCALE * np.random.default_rng(seed).standard_normal(10)
        _, xs, fell = run_mujoco_closed_loop(mpc, gait, N_TICKS, dq0=dq)
        ok += not fell
        if not fell:
            yaws.append(xs[-1, 2])
    rate = np.mean(yaws) / (N_TICKS * 0.04) if yaws else float("nan")
    print(
        f"{name:18s} wz={wz:.1f} {ok}/{SEEDS}  realized~{rate:+.2f} rad/s",
        flush=True,
    )


def main():
    cells = sys.argv[1:] or list(CELLS)
    for wz in (0.4, 0.5):
        for name in cells:
            kw, gait = CELLS[name]
            run(name, kw, gait, wz)


if __name__ == "__main__":
    main()
