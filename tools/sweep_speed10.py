"""1.0 m/s ceiling investigation (round 3, VERDICT item 6).

At the round-3 operating point (td-damp + sin^2) 0.8 m/s is zero-fall
but 1.0 m/s still falls in every cell. Kinematics at p=2 (0.08 s
phases): stride 0.16 m, swing foot mean speed ~4 m/s — candidate binding
factors are swing authority (kp_swing), apex height (foot drag), and
capture gain. This grids them at p=2 and p=3.

Usage: python tools/sweep_speed10.py [p2|p3 ...]
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
V = 1.0


def main(groups):
    groups = groups or ["p2", "p3"]
    for gname, p in (("p2", 2), ("p3", 3)):
        if gname not in groups:
            continue
        configs, labels = [], []
        for sh in (0.04, 0.06, 0.08):
            for kp in (500.0, 800.0):
                for rg in (0.3, 0.5):
                    for pert in range(N_PERT):
                        configs.append(art_mpc_config(
                            x_cmd=jnp.zeros(12).at[5].set(0.55).at[9].set(V),
                            swing_td_damp=8.0, swing_z_sin2=True,
                            swing_height=sh, kp_swing=kp,
                            raibert_capture_gain=rg,
                        ))
                        labels.append((sh, kp, rg, pert))
        mpc_batch, in_axes = stack_configs(configs)
        worlds = perturbed_worlds(
            configs[0], len(configs), jax.random.PRNGKey(29)
        )
        fn = jax.jit(
            f32_precision(art_sweep_fn(N_STEPS, GaitConfig(p), in_axes))
        )
        t0 = time.time()
        out = fn(worlds, BipedParams(), mpc_batch)
        jax.block_until_ready(out)
        falls = np.array(out.metrics.falls)
        att = np.sqrt(np.array(out.metrics.attitude_err_sq) / N_STEPS)
        pos = np.array(jax.vmap(lambda s: s.torso_state()[3])(out.sim))
        print(f"== v=1.0 {gname} ({time.time()-t0:.0f}s) ==")
        cells = {}
        for i, (sh, kp, rg, pert) in enumerate(labels):
            cells.setdefault((sh, kp, rg), []).append(i)
        for (sh, kp, rg), idx in sorted(cells.items()):
            print(
                f"  apex={sh} kp={kp:.0f} rg={rg}: "
                f"falls={falls[idx].sum():.0f}/{N_PERT} "
                f"att={att[idx].max():.3f} x={pos[idx].mean():+.2f}"
            )
        sys.stdout.flush()


if __name__ == "__main__":
    main(sys.argv[1:])
