"""10-seed MuJoCo robustness probe for the pinned test's exact protocol
(test_mj_contact.py::TestPerturbedRobustness): 250 ticks, +-2e-3 rad
perturbations with seeds 0..9, in-place and vx=0.15, across candidate
configs. Usage: python tools/sweep_mj10.py [cell ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
from biped_mpc_py_tpu.config import GaitConfig  # noqa: E402
from biped_mpc_py_tpu.parallel.rollout_art import art_mpc_config  # noqa: E402
from biped_mpc_py_tpu.sim.mj_driver import run_mujoco_closed_loop  # noqa: E402

SCALE = 2e-3
BASE = dict(kp_hipyaw=3.0, kd_hipyaw=0.4)
CELLS = {
    "td": dict(tau_z_max=4.0, swing_td_damp=8.0, **BASE),
    "td+sin2": dict(tau_z_max=4.0, swing_td_damp=8.0, swing_z_sin2=True,
                    **BASE),
    "cone+td": dict(mu_z=0.035, swing_td_damp=8.0, **BASE),
    "cone+td+sin2": dict(mu_z=0.035, swing_td_damp=8.0, swing_z_sin2=True,
                         **BASE),
    "td12": dict(tau_z_max=4.0, swing_td_damp=12.0, **BASE),
}


def run(name, kw, vx):
    x_cmd = jnp.zeros(12).at[5].set(0.55).at[9].set(vx)
    mpc = art_mpc_config(x_cmd=x_cmd, **kw)
    gait = GaitConfig(4) if vx > 0.1 else GaitConfig()
    ok = 0
    detail = []
    for seed in range(10):
        dq = SCALE * np.random.default_rng(seed).standard_normal(10)
        _, xs, fell = run_mujoco_closed_loop(mpc, gait, 250, dq0=dq)
        ok += not fell
        detail.append(f"{seed}:{'F@%d' % len(xs) if fell else 'ok'}")
    print(f"{name:14s} vx={vx:.2f} {ok}/10  {' '.join(detail)}", flush=True)


def main():
    cells = sys.argv[1:] or list(CELLS)
    for name in cells:
        for vx in (0.0, 0.15):
            run(name, CELLS[name], vx)


if __name__ == "__main__":
    main()
