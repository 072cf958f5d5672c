"""Rough-terrain envelope sweep (round 3): terrain-adaptive height refs.

Round-2 ceiling: 2-3 cm bump amplitude walks fall-free; 4 cm falls on 6/8
fields, suspected binding factor = the FIXED z-height reference. Round 3
threads terrain into the references (com z rides the local ground, swing
apex and MPC foot targets ride the surface under the target xy) — this
sweep re-measures the amplitude ceiling. 8 random fields x 10 s per
amplitude, in-place gait (the round-2 protocol).

Usage: python tools/sweep_terrain.py [amplitude_cm ...]
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
from biped_mpc_py_tpu.parallel.rollout_art import (
    art_mpc_config,
    batched_art_rollout_terrain_fn,
    init_art_world,
)
from biped_mpc_py_tpu.sim.contact import Terrain
from biped_mpc_py_tpu.utils.precision import f32_precision

N_FIELDS = 8
N_STEPS = 250


def main(amps):
    amps = [float(a) / 100 for a in amps] or [0.03, 0.04, 0.05, 0.06]
    mpc = art_mpc_config(swing_td_damp=8.0)
    gait = GaitConfig(5)
    biped = BipedParams()
    worlds = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (N_FIELDS,) + jnp.shape(x)),
        init_art_world(mpc),
    )
    bipeds = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (N_FIELDS,) + jnp.shape(x)), biped
    )
    fn = jax.jit(
        f32_precision(batched_art_rollout_terrain_fn(N_STEPS, mpc, gait))
    )
    for amp in amps:
        terr = Terrain.rough_batch(jax.random.PRNGKey(3), N_FIELDS, amplitude=amp)
        t0 = time.time()
        out = fn(worlds, bipeds, terr)
        jax.block_until_ready(out)
        falls = np.array(out.metrics.falls)
        att = np.sqrt(np.array(out.metrics.attitude_err_sq) / N_STEPS)
        print(
            f"amp={amp*100:.0f}cm: fields-with-falls="
            f"{(falls > 0).sum()}/{N_FIELDS} total_falls={falls.sum():.0f} "
            f"att_max={att.max():.3f} ({time.time()-t0:.0f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main(sys.argv[1:])
