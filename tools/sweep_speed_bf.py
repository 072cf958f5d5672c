"""Body-frame fast-walking sweep (round 3, realized-speed lag).

World-frame velocity commands re-anchor the position reference at the
measured pose every tick (control/reference.py::com_reference) — zero
position stiffness, so realized speed = command - drag/velocity-gain
(measured: 0.59 realized at 0.8 cmd, 0.48 at 1.0). Body-frame mode's
leak-anchored reference keeps position stiffness and closes most of the
lag (0.74 @ 0.8, 0.88 @ 1.0, but 1.0 had a fall). This sweep tunes the
body-frame fast cell: capture gain x apex x leak, 5 perturbations each.

Usage: python tools/sweep_speed_bf.py
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
from biped_mpc_py_tpu.parallel.rollout_art import art_mpc_config
from biped_mpc_py_tpu.parallel.sweep import (
    art_sweep_fn, perturbed_worlds, stack_configs,
)
from biped_mpc_py_tpu.utils.precision import f32_precision

N_STEPS = 250
N_PERT = 5


def main():
    for vx in (0.8, 1.0):
        cells = []
        for rg in (0.3, 0.5):
            for apex in (0.05, 0.06):
                cells.append((f"rg={rg} apex={apex}", dict(
                    raibert_capture_gain=rg, swing_height=apex,
                )))
        x_cmd = jnp.zeros(12).at[5].set(0.55).at[9].set(vx)
        configs, labels = [], []
        for label, kw in cells:
            for p in range(N_PERT):
                configs.append(art_mpc_config(
                    x_cmd=x_cmd, cmd_body_frame=True, swing_z_sin2=True,
                    **kw,
                ))
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
        print(f"== vx={vx} ({time.time() - t0:.0f}s) ==")
        cellidx = {}
        for i, (label, p) in enumerate(labels):
            cellidx.setdefault(label, []).append(i)
        for label, idx in cellidx.items():
            print(
                f"  {label:18s} falls={falls[idx].sum():.0f}/{N_PERT} "
                f"att={att[idx].max():.3f} x_end={pos[idx].mean():+.2f} "
                f"(v~{pos[idx].mean() / (N_STEPS * 0.04):.2f})"
            )
        sys.stdout.flush()


if __name__ == "__main__":
    main()
