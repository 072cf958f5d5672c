"""MuJoCo robustness battery (round-3, VERDICT item 3).

Runs the framework controller closed-loop in MuJoCo (sim/mj_driver.py)
across a config matrix x seeded +-2e-3 rad initial joint perturbations,
and reports fall outcomes + attitude statistics. Round-2 state: the
deterministic in-place branch walked, but 2 of 3 perturbed seeds fell at
every gain tried (suspect: swing-foot drag impulses under stick friction
at touchdown). Round-3 candidates under test: touchdown-retraction
damping (swing_td_damp), the sin^2 zero-touchdown-velocity z profile
(swing_z_sin2), and the load-dependent torsional cone (mu_z).

Usage: python tools/sweep_mj.py [n_ticks] [cell ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

from biped_mpc_py_tpu.config import GaitConfig  # noqa: E402
from biped_mpc_py_tpu.parallel.rollout_art import art_mpc_config  # noqa: E402
from biped_mpc_py_tpu.sim.mj_driver import run_mujoco_closed_loop  # noqa: E402

SEEDS = 4  # seed 0 = deterministic, 1..3 = perturbed
SCALE = 2e-3

CELLS = {
    # round-2 oracle point (kp/kd_hipyaw 3.0/0.4, stick-physical tz=4)
    "r2-oracle": dict(kp_hipyaw=3.0, kd_hipyaw=0.4, tau_z_max=4.0),
    "td-damp": dict(kp_hipyaw=3.0, kd_hipyaw=0.4, tau_z_max=4.0,
                    swing_td_damp=8.0),
    "sin2": dict(kp_hipyaw=3.0, kd_hipyaw=0.4, tau_z_max=4.0,
                 swing_z_sin2=True),
    "td+sin2": dict(kp_hipyaw=3.0, kd_hipyaw=0.4, tau_z_max=4.0,
                    swing_td_damp=8.0, swing_z_sin2=True),
    "cone+td+sin2": dict(kp_hipyaw=3.0, kd_hipyaw=0.4, mu_z=0.035,
                         swing_td_damp=8.0, swing_z_sin2=True),
    "cone+td": dict(kp_hipyaw=3.0, kd_hipyaw=0.4, mu_z=0.035,
                    swing_td_damp=8.0),
}


def run_cell(name, kw, n_ticks, vx=0.0):
    import jax.numpy as jnp

    x_cmd = jnp.zeros(12).at[5].set(0.55).at[9].set(vx)
    mpc = art_mpc_config(x_cmd=x_cmd, **kw)
    gait = GaitConfig(4 if vx > 0.1 else 5)
    results = []
    for seed in range(SEEDS):
        dq = (
            None if seed == 0
            else SCALE * np.random.default_rng(seed).standard_normal(10)
        )
        _, xs, fell = run_mujoco_closed_loop(
            mpc, gait, n_ticks, dq0=dq
        )
        att = float(np.sqrt(np.mean(xs[:, 0] ** 2 + xs[:, 1] ** 2)))
        results.append((fell, att, len(xs)))
        print(
            f"  {name:14s} vx={vx:.2f} seed={seed} "
            f"{'FELL@%d' % len(xs) if fell else 'ok    '} att_rms={att:.3f}",
            flush=True,
        )
    falls = sum(r[0] for r in results)
    print(f"== {name} vx={vx}: {falls}/{SEEDS} falls ==", flush=True)


def main():
    args = sys.argv[1:]
    n_ticks = int(args[0]) if args and args[0].isdigit() else 100
    cells = [a for a in args if not a.isdigit()] or list(CELLS)
    for name in cells:
        run_cell(name, CELLS[name], n_ticks)


if __name__ == "__main__":
    main()


def run_turn_cell(name, kw, n_ticks, wz, seeds=3):
    """MuJoCo turning probe (body-frame command mode, like the engine)."""
    import jax.numpy as jnp

    x_cmd = jnp.zeros(12).at[5].set(0.55).at[8].set(wz)
    mpc = art_mpc_config(x_cmd=x_cmd, cmd_body_frame=True, **kw)
    for seed in range(seeds):
        dq = (
            None if seed == 0
            else SCALE * np.random.default_rng(seed).standard_normal(10)
        )
        _, xs, fell = run_mujoco_closed_loop(
            mpc, GaitConfig(5), n_ticks, dq0=dq
        )
        att = float(np.sqrt(np.mean(xs[:, 0] ** 2 + xs[:, 1] ** 2)))
        print(
            f"  {name:14s} wz={wz:.2f} seed={seed} "
            f"{'FELL@%d' % len(xs) if fell else 'ok    '} att_rms={att:.3f} "
            f"yaw_end={xs[-1, 2]:+.2f}",
            flush=True,
        )
