"""Yaw-channel ablation at wz=0.2 (round 3): WHICH pathway destabilizes?

In-place walking is rock-solid (att RMS 0.014); commanding 0.2 rad/s yaw
falls within seconds through every variant tried. The turn command reaches
the plant through exactly three actuation channels:
  A. the QP's m_z moments (driven by the yaw/wz rows of Q),
  B. the swing foot-heading wrench (kp_hipyaw),
  C. the stance-pivot torque (kp_pivot, round-3),
plus the reference-side geometry (yaw-rotated Raibert/stance offsets).
This sweep turns each off independently to find the destabilizer.

Usage: python tools/sweep_isolate.py [variant ...]
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

Q_BASE = [500, 100, 100, 300, 300, 700, 1, 1, 1, 1, 1, 1, 1]


def q_with(yaw=100.0, wz=1.0):
    q = list(Q_BASE)
    q[2] = yaw
    q[8] = wz
    return jnp.array(q, jnp.float32)


CELLS = {
    # post-frame-fix operating-point search: the corrected swing frames
    # (compat_swing_frame_bug=False) made mpcyaw-only STABLE at 0.2 rad/s
    # and the foot-heading wrench HARMFUL — grid the wrench gain down and
    # the pivot assist, at several rates
    "fh0": dict(kp_hipyaw=0.0, kd_hipyaw=0.0),
    "fh0+pivot2": dict(kp_hipyaw=0.0, kd_hipyaw=0.0, kp_pivot=2.0,
                       kd_pivot=0.3),
    "fh0+pivot4": dict(kp_hipyaw=0.0, kd_hipyaw=0.0, kp_pivot=4.0,
                       kd_pivot=0.3),
    "fh08": dict(kp_hipyaw=0.8, kd_hipyaw=0.15),
    "fh08+pivot2": dict(kp_hipyaw=0.8, kd_hipyaw=0.15, kp_pivot=2.0,
                        kd_pivot=0.3),
    "fh24": dict(),
}

VARIANTS = {
    "tz8td": dict(tau_z_max=8.0, swing_td_damp=8.0),
    "tz05td": dict(tau_z_max=0.5, swing_td_damp=8.0),
}

WZ = float(os.environ.get("ISOLATE_WZ", "0.2"))


def main(variants):
    for vname in variants or list(VARIANTS):
        static_kw = VARIANTS[vname]
        configs, labels = [], []
        for cname, kw in CELLS.items():
            for p in range(N_PERT):
                configs.append(art_mpc_config(
                    x_cmd=jnp.zeros(12).at[5].set(0.55).at[8].set(WZ),
                    cmd_body_frame=True, **static_kw, **kw,
                ))
                labels.append((cname, p))
        mpc_batch, in_axes = stack_configs(configs)
        worlds = perturbed_worlds(
            configs[0], len(configs), jax.random.PRNGKey(17)
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
        print(f"== {vname} wz={WZ} ({time.time()-t0:.0f}s) ==")
        cells = {}
        for i, (cname, p) in enumerate(labels):
            cells.setdefault(cname, []).append(i)
        for cname, idx in cells.items():
            print(
                f"  {cname:22s} falls={falls[idx].sum():.0f}/{N_PERT} "
                f"att={att[idx].max():.3f} "
                f"yaw=[{yaw[idx].min():+.2f},{yaw[idx].max():+.2f}] (cmd +2.0)"
            )
        sys.stdout.flush()


if __name__ == "__main__":
    main(sys.argv[1:])
