"""Stance-pivot heading-drive sweep (round 3, engine, TPU).

Grids (kp_pivot, kd_pivot) x turn rate for the new stance hip-yaw pivot
torque (config.kp_pivot; see the fall diagnosis in sweep_turn2.py's
docstring). Usage: python tools/sweep_pivot.py [variant ...]
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

VARIANTS = {
    "tz8td": dict(tau_z_max=8.0, swing_td_damp=8.0),
    "cone07td": dict(tau_z_max=None, mu_z=0.07, swing_td_damp=8.0),
    # foot-frame wrench constraints (config.foot_frame_wrench): the QP
    # loses its phantom cross-line moment authority when the feet yaw
    "ffw-tz8td": dict(
        tau_z_max=8.0, swing_td_damp=8.0, foot_frame_wrench=True
    ),
    "ffw-cone07td": dict(
        tau_z_max=None, mu_z=0.07, swing_td_damp=8.0,
        foot_frame_wrench=True,
    ),
}


def main(variants):
    for vname in variants or list(VARIANTS):
        static_kw = VARIANTS[vname]
        configs, labels = [], []
        for wz in (0.2, 0.3, 0.5):
            for kpp in (0.0, 2.0, 4.0, 8.0):
                for kdp in (0.3,):
                    for p in range(N_PERT):
                        configs.append(art_mpc_config(
                            x_cmd=jnp.zeros(12).at[5].set(0.55).at[8].set(wz),
                            cmd_body_frame=True,
                            kp_pivot=kpp, kd_pivot=kdp, **static_kw,
                        ))
                        labels.append((wz, kpp, kdp, p))
        mpc_batch, in_axes = stack_configs(configs)
        worlds = perturbed_worlds(
            configs[0], len(configs), jax.random.PRNGKey(13)
        )
        fn = jax.jit(
            f32_precision(art_sweep_fn(N_STEPS, GaitConfig(5), in_axes))
        )
        t0 = time.time()
        out = fn(worlds, BipedParams(), mpc_batch)
        jax.block_until_ready(out)
        falls = np.array(out.metrics.falls)
        att = np.sqrt(np.array(out.metrics.attitude_err_sq) / N_STEPS)
        yaw = np.array(jax.vmap(lambda s: s.torso_state()[2])(out.sim))
        print(f"== {vname} ({time.time()-t0:.0f}s, {len(configs)} rollouts) ==")
        cells = {}
        for i, (wz, kpp, kdp, p) in enumerate(labels):
            cells.setdefault((wz, kpp, kdp), []).append(i)
        for (wz, kpp, kdp), idx in sorted(cells.items()):
            f = falls[idx].sum()
            # commanded total heading over 10 s = 10*wz
            print(
                f"  wz={wz} kp_piv={kpp} kd_piv={kdp}: falls={f:.0f}/{N_PERT} "
                f"att={att[idx].max():.3f} "
                f"yaw=[{yaw[idx].min():+.2f},{yaw[idx].max():+.2f}] "
                f"(cmd {10*wz:+.1f})"
            )
        sys.stdout.flush()


if __name__ == "__main__":
    main(sys.argv[1:])
