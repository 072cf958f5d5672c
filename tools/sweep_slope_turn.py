"""Sloped-terrain turning: does foot_frame_wrench help on a slope?
(round 5, VERDICT item 6)

Round 3's foot-frame rollover rows used a pure Rz(psi) frame, which
mis-orients the toe/heel axes whenever the body (and the planted foot
conforming to the surface) is tilted — the documented flat-ground caveat
(ops/qp.py::line_foot_rows). Round 5 composes the heading ON the
measured attitude: Rz(psi - yaw) @ R. This battery measures
turn-in-place on a constant ramp (body pitched ~slope while turning, so
hip-yaw rotates the feet relative to the pitched body — exactly the
regime the caveat was about) with the flag OFF vs ON.

Cells: slope in {0.10, 0.15} x {off, on} x 4 perturbed seeds, 10 s at
the unified wz=0.3 turn op point (art_config_for_turn). Reports falls +
realized yaw progress.

Usage: python tools/sweep_slope_turn.py (CPU)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "pytest" not in sys.modules:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from biped_mpc_py_tpu.models.biped import BipedParams
from biped_mpc_py_tpu.parallel.rollout_art import art_config_for_turn
from biped_mpc_py_tpu.parallel.sweep import (
    art_sweep_fn,
    perturbed_worlds,
    stack_configs,
)
from biped_mpc_py_tpu.sim.contact import Terrain
from biped_mpc_py_tpu.utils.precision import f32_precision

SEG = 125  # 5 s


def ramp(slope: float, res: int = 33, extent: float = 8.0) -> Terrain:
    """Constant-grade ramp z = slope * x, z(0,0) = 0."""
    xs = np.linspace(-extent / 2, extent / 2, res)
    return Terrain(
        heights=jnp.asarray(np.tile(slope * xs, (res, 1)), jnp.float32),
        extent=extent,
    )


def battery(slope: float, flag: bool, n_pert: int = 4, n_seg: int = 2):
    configs, labels = [], []
    for p in range(n_pert):
        mpc, gait = art_config_for_turn(0.3, foot_frame_wrench=flag)
        configs.append(mpc)
        labels.append(f"p{p}")
    biped = BipedParams()
    mpc_batch, in_axes = stack_configs(configs)
    worlds = perturbed_worlds(configs[0], n_pert, jax.random.PRNGKey(11))
    terr = ramp(slope)
    fn = jax.jit(f32_precision(art_sweep_fn(SEG, gait, in_axes, terrain=terr)))
    t0 = time.time()
    yaw0 = np.array(jax.vmap(lambda s: s.torso_state()[2])(worlds.sim))
    for _ in range(n_seg):
        worlds = fn(worlds, biped, mpc_batch)
        jax.block_until_ready(worlds)
    yaw = np.array(jax.vmap(lambda s: s.torso_state()[2])(worlds.sim))
    falls = np.array(worlds.metrics.falls)
    tag = "on " if flag else "off"
    dur = n_seg * SEG * 0.04
    print(f"  ({time.time() - t0:.0f}s) slope={slope} ffw={tag}")
    for i in range(n_pert):
        wz = (yaw[i] - yaw0[i]) / dur
        print(
            f"    p{i}: falls={falls[i]:.0f} realized_wz={wz:+.3f}"
            f" (cmd +0.30)",
            flush=True,
        )
    return falls, (yaw - yaw0) / dur


if __name__ == "__main__":
    slopes = [float(s) for s in sys.argv[1:]] or [0.10, 0.15]
    for s in slopes:
        for flag in (False, True):
            battery(s, flag)
