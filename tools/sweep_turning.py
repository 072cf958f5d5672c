"""Articulated turning-envelope sweep over torsional-cone variants (TPU).

Round-3 experiment for VERDICT items 1+2: does replacing the constant
``tau_z_max`` clamp with the load-dependent torsional cone ``|m_z| <=
mu_z f_z`` (ops/qp.py::torsional_rows) change the articulated turning
ceiling (round-2 state: 0.1 rad/s structural; 0.3+ falls at every swept
cell), and does the engine still walk forward robustly at the physical
cone (the constant tz=4 equivalent destabilized every 0.15 m/s cell)?

Each CELL = one static-config group (mu_z / tau_z_max / cadence are
static); within a group, x_cmd variants and initial-state perturbations
ride ONE vmap. Usage:

    python tools/sweep_turning.py [group ...]   # default: all groups
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from biped_mpc_py_tpu.config import GaitConfig
from biped_mpc_py_tpu.models.biped import BipedParams
from biped_mpc_py_tpu.parallel.rollout_art import art_mpc_config
from biped_mpc_py_tpu.parallel.sweep import (
    art_sweep_fn, perturbed_worlds, stack_configs,
)
from biped_mpc_py_tpu.utils.precision import f32_precision

N_PERT = 5
N_STEPS = 250  # 10 s


def cmd(wz=0.0, vx=0.0, vy=0.0):
    return jnp.zeros(12).at[5].set(0.55).at[8].set(wz).at[9].set(vx).at[10].set(vy)


def run_group(name, static_kw, gait, cells):
    """cells: list of (label, x_cmd). Returns per-cell (falls, att_rms, yaw)."""
    configs, labels = [], []
    for label, x_cmd in cells:
        for p in range(N_PERT):
            configs.append(
                art_mpc_config(
                    x_cmd=x_cmd, cmd_body_frame=True, **static_kw
                )
            )
            labels.append((label, p))
    mpc_batch, in_axes = stack_configs(configs)
    worlds = perturbed_worlds(configs[0], len(configs), jax.random.PRNGKey(7))
    fn = jax.jit(f32_precision(art_sweep_fn(N_STEPS, gait, in_axes)))
    t0 = time.time()
    out = fn(worlds, BipedParams(), mpc_batch)
    jax.block_until_ready(out)
    dt = time.time() - t0
    falls = np.array(out.metrics.falls)
    att = np.sqrt(np.array(out.metrics.attitude_err_sq) / N_STEPS)
    yaw = np.array(jax.vmap(lambda s: s.torso_state()[2])(out.sim))
    print(f"== {name} ({dt:.0f}s, {len(configs)} rollouts) ==")
    by_cell = {}
    for i, (label, p) in enumerate(labels):
        by_cell.setdefault(label, []).append(i)
    for label, idx in by_cell.items():
        print(
            f"  {label:28s} falls={falls[idx].sum():.0f}/{len(idx)} "
            f"att_rms={att[idx].max():.3f} yaw=[{yaw[idx].min():+.2f},"
            f"{yaw[idx].max():+.2f}]"
        )
    sys.stdout.flush()


VARIANTS = {
    # round-2 baseline: constant clamp, no cone
    "tz8": dict(tau_z_max=8.0),
    # pure physical cone (stick value), no clamp
    "cone035": dict(tau_z_max=None, mu_z=0.035),
    # engine-calibrated cone (compliant contact transmits more)
    "cone05": dict(tau_z_max=None, mu_z=0.05),
    "cone07": dict(tau_z_max=None, mu_z=0.07),
    # touchdown-retraction damping (the MuJoCo robustness unlock,
    # tools/sweep_mj.py round-3) on the engine
    "tz8td": dict(tau_z_max=8.0, swing_td_damp=8.0),
    "tz8tds2": dict(tau_z_max=8.0, swing_td_damp=8.0, swing_z_sin2=True),
    "cone05td": dict(tau_z_max=None, mu_z=0.05, swing_td_damp=8.0),
    "cone07tds2": dict(
        tau_z_max=None, mu_z=0.07, swing_td_damp=8.0, swing_z_sin2=True
    ),
}

TURN_CELLS = [
    ("turn 0.1 rad/s", cmd(wz=0.1)),
    ("turn 0.2 rad/s", cmd(wz=0.2)),
    ("turn 0.3 rad/s", cmd(wz=0.3)),
    ("turn 0.5 rad/s", cmd(wz=0.5)),
]
WALK_CELLS = [
    ("in-place", cmd()),
    ("walk 0.15 m/s", cmd(vx=0.15)),
]
CURVE_CELLS = [
    ("curve 0.4 + 0.2", cmd(vx=0.4, wz=0.2)),
    ("curve 0.4 + 0.3", cmd(vx=0.4, wz=0.3)),
]


def main(groups):
    for vname, static_kw in VARIANTS.items():
        if groups and vname not in groups:
            continue
        run_group(
            f"{vname} / turning p=5", static_kw, GaitConfig(5), TURN_CELLS
        )
        run_group(
            f"{vname} / turning p=3", static_kw, GaitConfig(3), TURN_CELLS
        )
        run_group(
            f"{vname} / walking p=5/p=4", static_kw, GaitConfig(4),
            WALK_CELLS,
        )
        run_group(
            f"{vname} / curved p=2", static_kw, GaitConfig(2), CURVE_CELLS
        )


if __name__ == "__main__":
    main(sys.argv[1:])
