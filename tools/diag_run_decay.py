"""Per-tick trace of the running-gait decay (round 5, VERDICT item 1).

The round-5 ALIP/retraction screen (tools/sweep_alip.py) showed the decay
is UNIVERSAL at ticks ~250-350 (segment 3) across every placement knob —
the fast cycle does not end in the round-4 "0.25-0.30 slow attractor" but
continues to a near-zero in-place hop. This trace logs, per MPC tick:

  t_gait hold count, schedule row 0, measured contact,
  vx, pitch, wy (pitch rate), CoM x, per-foot (x - com_x) lever arms,
  commanded u0 fz per foot, realized sole heights

so the decay window's mechanism is measurable instead of narrated.

Usage: python tools/diag_run_decay.py [vx] [ticks] [out.csv] [key=val ...]
   (extra key=val pairs are MpcConfig overrides, e.g. raibert_am_y=0.14)
"""

import dataclasses as dc
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "pytest" not in sys.modules:
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from biped_mpc_py_tpu.models.biped import BipedParams
from biped_mpc_py_tpu.parallel.rollout_art import (
    art_closed_loop_tick,
    art_config_for_run,
    init_art_world,
)
from biped_mpc_py_tpu.control.gait import contact_sequence
from biped_mpc_py_tpu.sim.engine import feedback_and_soles
from biped_mpc_py_tpu.sim.model import hector_model
from biped_mpc_py_tpu.utils.precision import f32_precision


def main():
    vx = float(sys.argv[1]) if len(sys.argv) > 1 else 1.2
    ticks = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/run_decay.csv"
    overrides = {}
    for kv in sys.argv[4:]:
        k, v = kv.split("=")
        overrides[k] = float(v)
    mpc, gait = art_config_for_run(vx, **overrides)
    gait = dc.replace(gait, contact_clock=True, clock_max_hold=2)
    biped, model = BipedParams(), hector_model()
    tick = jax.jit(
        f32_precision(
            lambda w: art_closed_loop_tick(w, mpc, gait, biped, model)
        )
    )
    fb = jax.jit(lambda s: feedback_and_soles(model, s))
    w = init_art_world(mpc)
    rows = []
    for i in range(ticks):
        x_fb, pf = fb(w.sim)
        x_fb, pf = np.array(x_fb), np.array(pf)
        tg = float(w.ctrl.t_gait)
        hold = int(w.ctrl.hold_count)
        c0 = np.array(contact_sequence(tg + mpc.dt, mpc, gait))[0]
        u0 = np.array(w.ctrl.qp.controls[0])
        rows.append(
            [
                i, tg, hold, c0[0], c0[1],
                x_fb[9], x_fb[1], x_fb[7], x_fb[3],
                pf[0] - x_fb[3], pf[3] - x_fb[3], pf[2], pf[5],
                u0[2], u0[5],
                float(w.metrics.falls),
            ]
        )
        w = tick(w)
    hdr = (
        "tick,t_gait,hold,cL,cR,vx,pitch,wy,com_x,"
        "lever_L,lever_R,zL,zR,fzL,fzR,falls"
    )
    np.savetxt(out, np.array(rows), delimiter=",", header=hdr, comments="")
    print(f"wrote {out} ({len(rows)} ticks)")


if __name__ == "__main__":
    main()
