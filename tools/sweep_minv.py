"""Mass-matrix-inverse hold validation (TPU).

The round-3 articulated-throughput lever: reuse one NS(12) CRBA inverse
across ``minv_ll_hold`` low-level periods (rollout_art.art_closed_loop_tick)
instead of refreshing every 5 ms. hold=8 (once per 40 ms MPC tick) measured
10.3k -> 33.3k env-steps/s/chip on the 1024-env bench. This battery checks
the FIDELITY cost, varying ONLY the hold:

A. every validated envelope operating point at ITS validated setting
   (correct cadence, default 60/3/polish solver, 2 kHz substeps),
B. the exact bench fast path (40/1/no-polish/NS(10), 1 kHz) at the
   accuracy-pin point (0.3 m/s, p=3) and in-place.

5 perturbations per cell, 250 ticks (10 s). Usage: python tools/sweep_minv.py
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
FAST = dict(
    n_admm_iters=40, admm_rho_phases=1, admm_polish=False,
    kinv_ns_iters=10,
)


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

# (group, gait, tick_kw, cells)
BATTERIES = [
    ("A:inplace p5", GaitConfig(), {}, [("in-place", cmd(), TD)]),
    ("A:vy p4", GaitConfig(4), {}, [("vy=0.15", cmd(vy=0.15), {})]),
    ("A:vx0.3 p3", gait_for_speed(0.3), {}, [("vx=0.3", cmd(vx=0.3), TD)]),
    ("A:vx0.8 p2", gait_for_speed(0.8), {}, [("vx=0.8", cmd(vx=0.8), TDS2)]),
    ("A:turn p3", GaitConfig(3), {}, [("wz=0.5", cmd(wz=0.5), TURN_OP)]),
    ("A:curve p2", gait_for_speed(0.4), {}, [
        ("wz=0.3+vx0.4", cmd(wz=0.3, vx=0.4),
         {**TURN_OP, "swing_z_sin2": True}),
    ]),
    ("B:bench p5", GaitConfig(), dict(n_substeps=5), [
        ("in-place", cmd(), {**TD, **FAST}),
    ]),
    ("B:bench p3", gait_for_speed(0.3), dict(n_substeps=5), [
        ("vx=0.3", cmd(vx=0.3), {**TD, **FAST}),
    ]),
]


def main():
    for hold in (1, 8):
        for name, gait, tick_kw, cells in BATTERIES:
            configs, labels = [], []
            for label, x_cmd, kw in cells:
                for p in range(N_PERT):
                    configs.append(art_mpc_config(x_cmd=x_cmd, **kw))
                    labels.append((label, p))
            mpc_batch, in_axes = stack_configs(configs)
            worlds = perturbed_worlds(
                configs[0], len(configs), jax.random.PRNGKey(23)
            )
            fn = jax.jit(f32_precision(art_sweep_fn(
                N_STEPS, gait, in_axes, minv_ll_hold=hold, **tick_kw,
            )))
            t0 = time.time()
            out = fn(worlds, BipedParams(), mpc_batch)
            jax.block_until_ready(out)
            falls = np.array(out.metrics.falls)
            att = np.sqrt(np.array(out.metrics.attitude_err_sq) / N_STEPS)
            yaw = np.array(jax.vmap(lambda s: s.torso_state()[2])(out.sim))
            pos = np.array(jax.vmap(lambda s: s.torso_state()[3:5])(out.sim))
            print(f"== hold={hold} {name} ({time.time()-t0:.0f}s) ==")
            cellidx = {}
            for i, (label, p) in enumerate(labels):
                cellidx.setdefault(label, []).append(i)
            for label, idx in cellidx.items():
                print(
                    f"  {label:16s} falls={falls[idx].sum():.0f}/{N_PERT} "
                    f"att={att[idx].max():.3f} "
                    f"yaw=[{yaw[idx].min():+.2f},{yaw[idx].max():+.2f}] "
                    f"x={pos[idx][:, 0].mean():+.2f} "
                    f"y={pos[idx][:, 1].mean():+.2f}"
                )
            sys.stdout.flush()


if __name__ == "__main__":
    main()
