"""Fine engine-turning gain sweep (round 3): one jit, all-dynamic grid.

The coarse sweep (tools/sweep_turning.py) showed the torsional cone and
touchdown damping do NOT lift the engine's 0.2 rad/s turning falls. The
instrumented fall trace shows a growing YAW oscillation with hip-yaw
excursions to the joint limit and torso pogoing — the foot-heading
wrench's torso reaction (I_z = 0.0711!) is the suspect loop. This sweep
grids the reaction-bounding knobs (kp_hipyaw, tau_yaw_clip,
hipyaw_target_clip, cmd_leak_yaw) — ALL dynamic leaves, so the whole grid
is one vmap per static variant.

Usage: python tools/sweep_turn2.py [variant ...]
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

VARIANTS = {
    "tz8td": dict(tau_z_max=8.0, swing_td_damp=8.0),
    "cone07td": dict(tau_z_max=None, mu_z=0.07, swing_td_damp=8.0),
}


def main(variants):
    for vname in variants or list(VARIANTS):
        static_kw = VARIANTS[vname]
        configs, labels = [], []
        for wz in (0.2, 0.3):
            for kp in (1.2, 2.4, 3.6):
                for clip in (1.5, 3.0):
                    for leak in (0.05, 0.12):
                        for p in range(2):
                            configs.append(art_mpc_config(
                                x_cmd=jnp.zeros(12).at[5].set(0.55).at[8].set(wz),
                                cmd_body_frame=True,
                                kp_hipyaw=kp, tau_yaw_clip=clip,
                                cmd_leak_yaw=leak, **static_kw,
                            ))
                            labels.append((wz, kp, clip, leak, p))
        mpc_batch, in_axes = stack_configs(configs)
        worlds = perturbed_worlds(
            configs[0], len(configs), jax.random.PRNGKey(11)
        )
        fn = jax.jit(f32_precision(art_sweep_fn(N_STEPS, GaitConfig(5), in_axes)))
        t0 = time.time()
        out = fn(worlds, BipedParams(), mpc_batch)
        jax.block_until_ready(out)
        falls = np.array(out.metrics.falls)
        att = np.sqrt(np.array(out.metrics.attitude_err_sq) / N_STEPS)
        yaw = np.array(jax.vmap(lambda s: s.torso_state()[2])(out.sim))
        print(f"== {vname} ({time.time()-t0:.0f}s, {len(configs)} rollouts) ==")
        cells = {}
        for i, (wz, kp, clip, leak, p) in enumerate(labels):
            cells.setdefault((wz, kp, clip, leak), []).append(i)
        for (wz, kp, clip, leak), idx in sorted(cells.items()):
            f = falls[idx].sum()
            mark = " <body yaw target" if f == 0 else ""
            print(
                f"  wz={wz} kp={kp} clip={clip} leak={leak}: "
                f"falls={f:.0f}/2 att={att[idx].max():.3f} "
                f"yaw=[{yaw[idx].min():+.2f},{yaw[idx].max():+.2f}]{mark}"
            )
        sys.stdout.flush()


if __name__ == "__main__":
    main(sys.argv[1:])
