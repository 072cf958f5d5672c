"""Round-3 operating-point validation batteries (TPU).

A. Speed envelope with td-damp / sin^2 at 0.4-1.0 m/s (art_config_for_speed
   candidates; round-2 ceiling was 0.8).
B. Turning battery at the post-frame-fix operating point (fh0, p=3) with
   5 perturbations per cell, incl. walk+turn combos.

Usage: python tools/sweep_validate3.py [speed|turn ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from biped_mpc_py_tpu.config import GaitConfig
from biped_mpc_py_tpu.control.gait import gait_for_speed
from biped_mpc_py_tpu.models.biped import BipedParams
from biped_mpc_py_tpu.parallel.rollout_art import art_mpc_config
from biped_mpc_py_tpu.parallel.sweep import (
    art_sweep_fn, perturbed_worlds, stack_configs,
)
from biped_mpc_py_tpu.utils.precision import f32_precision

N_STEPS = 250
N_PERT = 5


def run(name, gait, cells):
    configs, labels = [], []
    for label, x_cmd, kw in cells:
        for p in range(N_PERT):
            configs.append(art_mpc_config(x_cmd=x_cmd, **kw))
            labels.append((label, p))
    mpc_batch, in_axes = stack_configs(configs)
    worlds = perturbed_worlds(configs[0], len(configs), jax.random.PRNGKey(23))
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
            f"  {label:30s} falls={falls[idx].sum():.0f}/{N_PERT} "
            f"att={att[idx].max():.3f} "
            f"yaw=[{yaw[idx].min():+.2f},{yaw[idx].max():+.2f}] "
            f"x={pos[idx][:,0].mean():+.2f} y={pos[idx][:,1].mean():+.2f}"
        )
    sys.stdout.flush()


def cmd(wz=0.0, vx=0.0, vy=0.0):
    return (
        jnp.zeros(12).at[5].set(0.55).at[8].set(wz).at[9].set(vx)
        .at[10].set(vy)
    )


TD = dict(swing_td_damp=8.0)
TDS2 = dict(swing_td_damp=8.0, swing_z_sin2=True)
TURN_OP = dict(
    swing_td_damp=8.0, kp_hipyaw=0.0, kd_hipyaw=0.0, cmd_leak_yaw=0.12,
    cmd_body_frame=True,
)


def main(groups):
    groups = groups or ["speed", "turn"]
    if "speed" in groups:
        # swing_z_sin2 is STATIC -> one jit per profile variant
        for v in (0.4, 0.6, 0.8, 1.0):
            run(f"speed {v} td p=2", GaitConfig(2), [(f"v={v} td", cmd(vx=v), TD)])
            run(
                f"speed {v} td+sin2 p=2", GaitConfig(2),
                [(f"v={v} td+sin2", cmd(vx=v), TDS2)],
            )
    if "turn" in groups:
        run(
            "turn battery p=3", GaitConfig(3),
            [
                (f"wz={wz}", cmd(wz=wz), TURN_OP)
                for wz in (0.2, 0.3, 0.4, 0.5, 0.6)
            ],
        )
        run(
            "walk+turn p=3", GaitConfig(3),
            [
                ("vx=0.3 wz=0.2", cmd(wz=0.2, vx=0.3), TURN_OP),
                ("vx=0.2 wz=0.3", cmd(wz=0.3, vx=0.2), TURN_OP),
            ],
        )
        run(
            "curve battery p=2", GaitConfig(2),
            [
                ("vx=0.4 wz=0.2", cmd(wz=0.2, vx=0.4), TURN_OP),
                ("vx=0.4 wz=0.3", cmd(wz=0.3, vx=0.4), TURN_OP),
                ("vx=0.6 wz=0.2", cmd(wz=0.2, vx=0.6), TURN_OP),
            ],
        )


if __name__ == "__main__":
    main(sys.argv[1:])
