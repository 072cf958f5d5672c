"""Post-frame-fix turning envelope push (round 3): 0.3+ rad/s and curves.

After the swing-frame fix, fh0 (no heading wrench) turns 0.2 rad/s with
zero falls on the engine. This grid pushes the rate with cadence, yaw
leak, and pivot assist; plus curved-walking cells at p=2.

Usage: python tools/sweep_turn3.py [p5|p3|curve ...]
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

N_STEPS = 250
N_PERT = 2
BASE = dict(tau_z_max=8.0, swing_td_damp=8.0, kp_hipyaw=0.0, kd_hipyaw=0.0)


def run(name, gait, cells):
    configs, labels = [], []
    for label, x_cmd, kw in cells:
        for p in range(N_PERT):
            configs.append(art_mpc_config(
                x_cmd=x_cmd, cmd_body_frame=True, **BASE, **kw,
            ))
            labels.append((label, p))
    mpc_batch, in_axes = stack_configs(configs)
    worlds = perturbed_worlds(configs[0], len(configs), jax.random.PRNGKey(19))
    fn = jax.jit(f32_precision(art_sweep_fn(N_STEPS, gait, in_axes)))
    t0 = time.time()
    out = fn(worlds, BipedParams(), mpc_batch)
    jax.block_until_ready(out)
    falls = np.array(out.metrics.falls)
    att = np.sqrt(np.array(out.metrics.attitude_err_sq) / N_STEPS)
    yaw = np.array(jax.vmap(lambda s: s.torso_state()[2])(out.sim))
    pos = np.array(jax.vmap(lambda s: s.torso_state()[3:5])(out.sim))
    print(f"== {name} ({time.time()-t0:.0f}s) ==")
    cellidx = {}
    for i, (label, p) in enumerate(labels):
        cellidx.setdefault(label, []).append(i)
    for label, idx in cellidx.items():
        print(
            f"  {label:34s} falls={falls[idx].sum():.0f}/{N_PERT} "
            f"att={att[idx].max():.3f} "
            f"yaw=[{yaw[idx].min():+.2f},{yaw[idx].max():+.2f}] "
            f"xy=({pos[idx][:,0].mean():+.1f},{pos[idx][:,1].mean():+.1f})"
        )
    sys.stdout.flush()


def wz_cmd(wz, vx=0.0):
    return jnp.zeros(12).at[5].set(0.55).at[8].set(wz).at[9].set(vx)


def main(groups):
    groups = groups or ["p5", "p3", "curve"]
    turn_cells = []
    for wz in (0.3, 0.4, 0.5):
        for leak in (0.05, 0.12):
            for piv in (0.0, 2.0):
                turn_cells.append((
                    f"wz={wz} leak={leak} piv={piv}",
                    wz_cmd(wz),
                    dict(cmd_leak_yaw=leak, kp_pivot=piv, kd_pivot=0.3),
                ))
    if "p5" in groups:
        run("turn p=5", GaitConfig(5), turn_cells)
    if "p3" in groups:
        run("turn p=3", GaitConfig(3), turn_cells)
    if "curve" in groups:
        curve_cells = []
        for wz in (0.2, 0.3):
            for leak in (0.05, 0.12):
                curve_cells.append((
                    f"curve 0.4+{wz} leak={leak}",
                    wz_cmd(wz, vx=0.4),
                    dict(cmd_leak_yaw=leak),
                ))
        run("curve p=2", GaitConfig(2), curve_cells)


if __name__ == "__main__":
    main(sys.argv[1:])
