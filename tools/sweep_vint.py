"""Velocity-integrator sweep at the fast band (round 3, realized-speed lag).

World-frame fast walking realizes 0.59 @ 0.8 cmd / 0.48 @ 1.0 cmd (zero
position stiffness — see MpcConfig.cmd_v_int_gain docs). This sweeps the
bounded velocity-error integrator: gain x clip, 5 perturbations per cell,
250 ticks, reporting falls + realized speed.

Usage: python tools/sweep_vint.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from biped_mpc_py_tpu.control.gait import gait_for_speed
from biped_mpc_py_tpu.models.biped import BipedParams
from biped_mpc_py_tpu.parallel.rollout_art import art_config_for_speed
from biped_mpc_py_tpu.parallel.sweep import (
    art_sweep_fn, perturbed_worlds, stack_configs,
)
from biped_mpc_py_tpu.utils.precision import f32_precision

N_STEPS = 250
N_PERT = 5


def main():
    for vx in (0.4, 0.5):
        cells = [
            ("ki=0", dict(cmd_v_int_gain=0.0)),
            ("ki=.01", dict(cmd_v_int_gain=0.01)),
            ("ffs=.9", dict(raibert_ff_scale=0.9)),
            ("ffs=.8", dict(raibert_ff_scale=0.8)),
            ("ffs=.7", dict(raibert_ff_scale=0.7)),
            ("ffs=.8 ki=.01", dict(raibert_ff_scale=0.8,
                                   cmd_v_int_gain=0.01)),
        ]
        configs, labels = [], []
        for label, kw in cells:
            for p in range(N_PERT):
                mpc, _ = art_config_for_speed(vx, **kw)
                configs.append(mpc)
                labels.append((label, p))
        mpc_batch, in_axes = stack_configs(configs)
        worlds = perturbed_worlds(
            configs[0], len(configs), jax.random.PRNGKey(23)
        )
        fn = jax.jit(f32_precision(art_sweep_fn(
            N_STEPS, gait_for_speed(vx), in_axes,
        )))
        t0 = time.time()
        out = fn(worlds, BipedParams(), mpc_batch)
        jax.block_until_ready(out)
        falls = np.array(out.metrics.falls)
        att = np.sqrt(np.array(out.metrics.attitude_err_sq) / N_STEPS)
        pos = np.array(jax.vmap(lambda s: s.torso_state()[3])(out.sim))
        vi = np.array(out.ctrl.v_int)
        print(f"== vx={vx} ({time.time() - t0:.0f}s) ==")
        cellidx = {}
        for i, (label, p) in enumerate(labels):
            cellidx.setdefault(label, []).append(i)
        for label, idx in cellidx.items():
            print(
                f"  {label:14s} falls={falls[idx].sum():.0f}/{N_PERT} "
                f"att={att[idx].max():.3f} x_end={pos[idx].mean():+.2f} "
                f"(v~{pos[idx].mean() / (N_STEPS * 0.04):.2f}) "
                f"vint={vi[idx, 0].mean():+.2f}"
            )
        sys.stdout.flush()


if __name__ == "__main__":
    main()
