"""Walking-band tracking with the contact clock (round 5, VERDICT
item 8).

Round 3 measured the walking envelope's edge deficits: ~66% realized at
a 1.0 m/s command (the transport/leak-anchor architecture limit,
DESIGN_NOTES "The fast-band realized-speed ceiling"). Round 4's contact
clock lifted the RUNNING band 0.65 -> 0.81 realized. THIS battery
measures whether contact_clock (+ raibert_vint integral placement)
closes any of the walking-band gap at 0.8/1.0 m/s commands — recorded
either way.

Cells x 3 perturbations, 15 s segmented rollouts (per-5 s realized
speed exposes transients vs steady state):

  base        fixed clock (round-3 operating point, gait_for_speed)
  clock       contact-sensed clock, clock_max_hold=2
  clock+vint  + integral placement (raibert_vint 0.3)

Usage: python tools/sweep_walk_clock.py (CPU)
"""

import dataclasses as dc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "pytest" not in sys.modules:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from biped_mpc_py_tpu.control.gait import gait_for_speed
from biped_mpc_py_tpu.models.biped import BipedParams
from biped_mpc_py_tpu.parallel.rollout_art import art_mpc_config
from biped_mpc_py_tpu.parallel.sweep import (
    art_sweep_fn,
    perturbed_worlds,
    stack_configs,
)
from biped_mpc_py_tpu.utils.precision import f32_precision

SEG = 125  # 5 s


def walk_cfg(vx: float, **kw):
    x_cmd = jnp.zeros(12).at[5].set(0.55).at[9].set(float(vx))
    return art_mpc_config(x_cmd=x_cmd, **kw)


def battery(vx: float, clock: bool, vint: bool, n_pert: int = 3):
    kw = {}
    if vint:
        kw.update(
            raibert_vint=0.3, cmd_v_int_gain=0.02, cmd_v_int_max=0.1,
            cmd_v_int_ref_scale=0.0,
        )
    configs = [walk_cfg(vx, **kw) for _ in range(n_pert)]
    labels = [f"p{i}" for i in range(n_pert)]
    gait = gait_for_speed(vx)
    if clock:
        gait = dc.replace(gait, contact_clock=True, clock_max_hold=2)
    biped = BipedParams()
    mpc_batch, in_axes = stack_configs(configs)
    worlds = perturbed_worlds(configs[0], n_pert, jax.random.PRNGKey(3))
    fn = jax.jit(f32_precision(art_sweep_fn(SEG, gait, in_axes)))
    t0 = time.time()
    pos_hist, falls = [], None
    pos0 = np.array(jax.vmap(lambda s: s.torso_state()[3])(worlds.sim))
    for _ in range(3):
        worlds = fn(worlds, biped, mpc_batch)
        jax.block_until_ready(worlds)
        pos_hist.append(
            np.array(jax.vmap(lambda s: s.torso_state()[3])(worlds.sim))
        )
        falls = np.array(worlds.metrics.falls)
    pos = np.stack([pos0] + pos_hist)
    v_seg = np.diff(pos, axis=0) / (SEG * 0.04)
    tag = ("clock" if clock else "base ") + ("+vint" if vint else "     ")
    print(f"  ({time.time() - t0:.0f}s)")
    for i, lab in enumerate(labels):
        segs = " ".join(f"{v: .2f}" for v in v_seg[:, i])
        print(
            f"  vx={vx} {tag} {lab}: falls={falls[i]:.0f} v/seg=[{segs}]",
            flush=True,
        )


if __name__ == "__main__":
    for vx in (0.8, 1.0):
        for clock, vint in ((False, False), (True, False), (True, True)):
            battery(vx, clock, vint)
