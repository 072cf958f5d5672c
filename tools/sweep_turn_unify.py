"""Engine turning sweep at the MuJoCo-winning operating point (round 3).

tools/sweep_mj_turn.py found fh3+sin2 p3 turns 0.3 rad/s 5/5 in MuJoCo
with 93% tracking — but the ENGINE turn op (art_config_for_turn) zeroes
the foot-heading wrench. If fh3+sin2 also holds on the engine, the two
sims can share ONE turning operating point. 5 perturbations/cell,
250 ticks.

Usage: python tools/sweep_turn_unify.py
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
N_PERT = 5
BASE = dict(cmd_body_frame=True, swing_td_damp=8.0, swing_z_sin2=True)


def cmd(wz, vx=0.0):
    return jnp.zeros(12).at[5].set(0.55).at[8].set(wz).at[9].set(vx)


def main():
    cells = []
    for wz in (0.3, 0.4, 0.5, 0.6):
        cells.append((f"fh3 wz={wz}", cmd(wz),
                      dict(kp_hipyaw=3.0, kd_hipyaw=0.4, **BASE)))
    cells.append(("fh3 wz=.3 vx=.4", cmd(0.3, 0.4),
                  dict(kp_hipyaw=3.0, kd_hipyaw=0.4, **BASE)))
    # the current engine op for comparison at the same seeds
    for wz in (0.4, 0.5):
        cells.append((f"fh0lk12 wz={wz}", cmd(wz),
                      dict(kp_hipyaw=0.0, kd_hipyaw=0.0, cmd_leak_yaw=0.12,
                           **BASE)))

    configs, labels = [], []
    for label, x_cmd, kw in cells:
        for p in range(N_PERT):
            configs.append(art_mpc_config(x_cmd=x_cmd, **kw))
            labels.append((label, p))
    mpc_batch, in_axes = stack_configs(configs)
    worlds = perturbed_worlds(configs[0], len(configs), jax.random.PRNGKey(23))
    fn = jax.jit(f32_precision(art_sweep_fn(N_STEPS, GaitConfig(3), in_axes)))
    t0 = time.time()
    out = fn(worlds, BipedParams(), mpc_batch)
    jax.block_until_ready(out)
    falls = np.array(out.metrics.falls)
    att = np.sqrt(np.array(out.metrics.attitude_err_sq) / N_STEPS)
    yaw = np.array(jax.vmap(lambda s: s.torso_state()[2])(out.sim))
    print(f"== engine, p3 ({time.time() - t0:.0f}s) ==")
    cellidx = {}
    for i, (label, p) in enumerate(labels):
        cellidx.setdefault(label, []).append(i)
    for label, idx in cellidx.items():
        print(
            f"  {label:18s} falls={falls[idx].sum():.0f}/{N_PERT} "
            f"att={att[idx].max():.3f} "
            f"rate~{yaw[idx].mean() / (N_STEPS * 0.04):+.2f} rad/s"
        )


if __name__ == "__main__":
    main()
