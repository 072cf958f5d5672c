"""Backward (-x) push-recovery MECHANISM probe (round 4, VERDICT item 4).

Round 3 measured the MuJoCo push envelope direction-asymmetric (+x 0.4,
-x 0.25) and proved the lateral asymmetry (leg crossing) but left -x as
an assertion. This instruments the failing backward recovery the way the
leg-crossing proof did: per tick, log

  - the QP's first-step wrench u0: per-foot f_z and PITCH moment m_y,
  - the line-foot rollover row values  (heel: -lh'*a.f + b.m,
    toe: -lt'*a.f - b.m, both <= 0; a = R[:,2], b = R[:,1] — ACTIVE when
    ~0: the QP is using all the toe/heel moment the foot geometry has),
  - the Raibert swing target x vs the actual swing sole x at touchdown
    (does the backward step reach its target, or does placement lag?),

over a -x shove at the envelope edge. Usage:
    python tools/sweep_mj_push3.py [mag=0.3] [seed=0] [kw=val ...]
e.g.  python tools/sweep_mj_push3.py 0.3 0 raibert_ff_scale=1.2
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import mujoco  # noqa: E402

from biped_mpc_py_tpu.config import GaitConfig  # noqa: E402
from biped_mpc_py_tpu.control.controller import (  # noqa: E402
    ControllerState,
    advance_cmd_ref,
    advance_v_int,
)
from biped_mpc_py_tpu.control.gait import contact_sequence  # noqa: E402
from biped_mpc_py_tpu.control.lowlevel import low_level_control  # noqa: E402
from biped_mpc_py_tpu.control.mpc import solve_mpc  # noqa: E402
from biped_mpc_py_tpu.control.swing import swing_target_xy  # noqa: E402
from biped_mpc_py_tpu.models.biped import BipedParams  # noqa: E402
from biped_mpc_py_tpu.ops.rotations import eul2rotm  # noqa: E402
from biped_mpc_py_tpu.parallel.rollout_art import art_mpc_config  # noqa: E402
from biped_mpc_py_tpu.sim.engine import ArtState, feedback_and_soles  # noqa: E402
from biped_mpc_py_tpu.sim.mj_driver import (  # noqa: E402
    MJ_DT,
    MJ_PER_LL,
    N_LL,
    state_from_mj,
)
from biped_mpc_py_tpu.sim.mjcf import penalty_matched_solref, to_mjcf  # noqa: E402
from biped_mpc_py_tpu.sim.model import hector_model  # noqa: E402

ORACLE = dict(
    kp_hipyaw=3.0, kd_hipyaw=0.4, tau_z_max=4.0, swing_td_damp=8.0,
    swing_z_sin2=True,
)
SHOVE_TICK = 50


def line_foot_slacks(biped, x_fb, u0):
    """(4,) heel_L, toe_L, heel_R, toe_R row values (<= 0; ~0 = ACTIVE)."""
    R = np.array(eul2rotm(x_fb[0:3]))
    a, b = R[:, 2], R[:, 1]
    lt, lh = biped.lt - 0.01, biped.lh - 0.02
    fL, fR = np.array(u0[0:3]), np.array(u0[3:6])
    mL, mR = np.array(u0[6:9]), np.array(u0[9:12])
    return np.array([
        -lh * a @ fL + b @ mL,
        -lt * a @ fL - b @ mL,
        -lh * a @ fR + b @ mR,
        -lt * a @ fR - b @ mR,
    ])


def probe(mag=0.3, seed=0, n_ticks=110, verbose_from=48, **kw):
    model, biped = hector_model(), BipedParams()
    cfg = dict(ORACLE)
    cfg.update(kw)
    mpc = art_mpc_config(x_cmd=jnp.zeros(12).at[5].set(0.55), **cfg)
    gait = GaitConfig()
    m = mujoco.MjModel.from_xml_string(
        to_mjcf(model, MJ_DT, contact=True,
                solref=penalty_matched_solref(model))
    )
    d = mujoco.MjData(m)
    s0 = ArtState.standing()
    d.qpos[0:3] = np.array(s0.pos)
    d.qpos[3:7] = np.array(s0.quat)
    d.qpos[7:17] = np.array(s0.q)
    d.qpos[7:17] += 2e-3 * np.random.default_rng(seed).standard_normal(10)

    fb = jax.jit(lambda s: feedback_and_soles(model, s))
    solve = jax.jit(
        lambda x, t, pf, c, w, r, vi: solve_mpc(
            x, t, pf, mpc, biped, c, warm=w, gait=gait, cmd_ref=r, v_int=vi
        )
    )
    lowlvl = jax.jit(
        lambda x, t, pf, q, qd, c, u0, r: low_level_control(
            x, t, pf, q, qd, mpc, biped, c, u0, gait=gait, cmd_ref=r
        )
    )
    ctrl = ControllerState.init(mpc)
    t = 0.0
    fell = False
    print("tick | c | vx    pitch |  fzL   fzR |  myL   myR | "
          "slacks heelL toeL heelR toeR | raibert_x soleL_x soleR_x")
    for k in range(n_ticks):
        if k == SHOVE_TICK:
            d.qvel[0] -= mag
        s = state_from_mj(d, t)
        x_fb, pf_w = fb(s)
        contact = contact_sequence(t, mpc, gait)
        sol = solve(x_fb, t, pf_w, contact, ctrl.qp, ctrl.cmd_ref, ctrl.v_int)
        u0 = np.array(sol.controls[0])
        if k >= verbose_from:
            sl = line_foot_slacks(biped, np.array(x_fb), u0)
            c0 = np.array(contact[0])
            fx, _ = swing_target_xy(x_fb, mpc, 1.0, gait)
            pf = np.array(pf_w)
            print(
                f"{k:3d} | {c0[0]:.0f}{c0[1]:.0f} | {float(x_fb[9]):+.2f} "
                f"{float(x_fb[1]):+.3f} | {u0[2]:5.1f} {u0[5]:5.1f} | "
                f"{u0[7]:+5.2f} {u0[10]:+5.2f} | "
                f"{sl[0]:+6.2f} {sl[1]:+6.2f} {sl[2]:+6.2f} {sl[3]:+6.2f} | "
                f"{float(fx):+.3f} {pf[0]:+.3f} {pf[3]:+.3f}"
            )
        cmd_ref_now = ctrl.cmd_ref
        ctrl = ControllerState(
            qp=sol, cmd_ref=advance_cmd_ref(ctrl.cmd_ref, x_fb, mpc),
            v_int=advance_v_int(ctrl.v_int, x_fb, mpc),
        )
        for _ in range(N_LL):
            s = state_from_mj(d, t)
            x_j, pf_j = fb(s)
            tau = lowlvl(x_j, s.t, pf_j, s.q, s.qd, contact,
                         sol.controls[0], cmd_ref_now)
            d.qfrc_applied[6:16] = np.array(tau)
            for _ in range(MJ_PER_LL):
                mujoco.mj_step(m, d)
        t += mpc.dt
        if d.qpos[2] < 0.25:
            fell = True
            print(f"FELL at tick {k}")
            break
    print(f"mag={mag} seed={seed} {kw}: {'FELL' if fell else 'ok'}")
    return fell


if __name__ == "__main__":
    args = sys.argv[1:]
    mag = float(args[0]) if args else 0.3
    seed = int(args[1]) if len(args) > 1 else 0
    kw = dict(
        (p.split("=")[0], float(p.split("=")[1])) for p in args[2:]
    )
    probe(mag=mag, seed=seed, **kw)
