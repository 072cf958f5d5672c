"""MuJoCo 4 cm terrain-gap diagnosis (round 4, VERDICT item 3).

Round 3 measured: engine 8/8 fields at 4 cm, MuJoCo 2/4 (3 cm is 4/4).
This instruments the failing MuJoCo hfield runs the way the flat-ground
chaotic branch was cracked: per tick, log per-foot normal force (impact
impulses at touchdown), the local terrain height and SLOPE under each
sole, and the fall cascade's first anomaly. Groups:

  diag   — verbose single-seed traces on the failing fields
  cells  — the 4-seed battery at 4 cm with the candidate fixes
           (key=value pairs map onto MpcConfig overrides)

Usage:
  python tools/sweep_mj_terrain2.py diag [seed]
  python tools/sweep_mj_terrain2.py cells [amp=0.04] [k=v ...]

Measured (round 4, this battery): baseline 3/4 at 4 cm (seed 1 falls —
the diag trace shows a missed-touchdown cascade: scheduled stance ticks
with ZERO contact force because the sole hangs over locally-lower
ground, pitch diverges, then 13.5 kN hfield wedge spikes finish it);
swing_td_overdrive=0.01 3/4, **=0.02 4/4** (driving the late-swing
z-target 2 cm below the sampled ground guarantees engagement at the
scheduled time) — but 0.02 REGRESSES 3 cm 4/4 -> 2/4: an
operating-point knob. Two candidates measured negative and removed
from the config surface (DESIGN_NOTES "MuJoCo 4 cm terrain gap" has
the full table): foothold adaptation toward flatter ground (60 -> 3/4,
120 -> 2/4) and relief-scaled overdrive (2/4 at 4 cm, identical with
the push capped at 0.02 — the misses happen where the ±4 cm
neighborhood looks flat).
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
from biped_mpc_py_tpu.sim.contact import Terrain  # noqa: E402
from biped_mpc_py_tpu.sim.mj_driver import run_mujoco_closed_loop  # noqa: E402

SCALE = 2e-3
ORACLE = dict(
    kp_hipyaw=3.0, kd_hipyaw=0.4, tau_z_max=4.0, swing_td_damp=8.0,
    swing_z_sin2=True,
)
AMP = 0.04


def diag(seed: int):
    """Verbose trace of one 4 cm field: forces + local slope per tick."""
    import mujoco

    from biped_mpc_py_tpu.control.controller import (
        ControllerState, advance_cmd_ref, advance_v_int,
    )
    from biped_mpc_py_tpu.control.gait import contact_sequence
    from biped_mpc_py_tpu.control.lowlevel import low_level_control
    from biped_mpc_py_tpu.control.mpc import solve_mpc
    from biped_mpc_py_tpu.models.biped import BipedParams
    from biped_mpc_py_tpu.sim.engine import ArtState, feedback_and_soles
    from biped_mpc_py_tpu.sim.mj_driver import (
        MJ_DT, MJ_PER_LL, N_LL, mj_foot_forces, state_from_mj,
    )
    from biped_mpc_py_tpu.sim.mjcf import (
        penalty_matched_solref, set_hfield_data, to_mjcf,
    )
    from biped_mpc_py_tpu.sim.model import hector_model

    model, biped = hector_model(), BipedParams()
    mpc = art_mpc_config(x_cmd=jnp.zeros(12).at[5].set(0.55), **ORACLE)
    gait = GaitConfig()
    terr = Terrain.rough(jax.random.PRNGKey(100 + seed), amplitude=AMP)
    m = mujoco.MjModel.from_xml_string(
        to_mjcf(model, MJ_DT, contact=True,
                solref=penalty_matched_solref(model), terrain=terr,
                sphere_r=0.02)
    )
    set_hfield_data(m, terr)
    d = mujoco.MjData(m)
    s0 = ArtState.standing()
    d.qpos[0:3] = np.array(s0.pos)
    d.qpos[3:7] = np.array(s0.quat)
    d.qpos[7:17] = np.array(s0.q)
    d.qpos[7:17] += SCALE * np.random.default_rng(seed).standard_normal(10)

    fb = jax.jit(lambda s: feedback_and_soles(model, s))
    solve = jax.jit(
        lambda x, t, pf, c, w, r, vi: solve_mpc(
            x, t, pf, mpc, biped, c, warm=w, gait=gait, cmd_ref=r,
            v_int=vi, terrain=terr,
        )
    )
    lowlvl = jax.jit(
        lambda x, t, pf, q, qd, c, u0, r: low_level_control(
            x, t, pf, q, qd, mpc, biped, c, u0, gait=gait, cmd_ref=r,
            terrain=terr,
        )
    )
    slope = jax.jit(
        lambda x, y: jnp.degrees(jnp.arccos(terr.normal(x, y)[..., 2]))
    )
    ctrl = ControllerState.init(mpc)
    t = 0.0
    print("tick | c | fL_pk  fR_pk |  slopeL slopeL' slopeR slopeR' | "
          "r      p    | z")
    for k in range(250):
        s = state_from_mj(d, t)
        x_fb, pf_w = fb(s)
        contact = contact_sequence(t, mpc, gait)
        sol = solve(x_fb, t, pf_w, contact, ctrl.qp, ctrl.cmd_ref, ctrl.v_int)
        cmd_ref_now = ctrl.cmd_ref
        ctrl = ControllerState(
            qp=sol, cmd_ref=advance_cmd_ref(ctrl.cmd_ref, x_fb, mpc),
            v_int=advance_v_int(ctrl.v_int, x_fb, mpc),
        )
        f_pk = np.zeros(2)
        for _ in range(N_LL):
            s = state_from_mj(d, t)
            x_j, pf_j = fb(s)
            tau = lowlvl(x_j, s.t, pf_j, s.q, s.qd, contact,
                         sol.controls[0], cmd_ref_now)
            d.qfrc_applied[6:16] = np.array(tau)
            for _ in range(MJ_PER_LL):
                mujoco.mj_step(m, d)
                f_pk = np.maximum(f_pk, mj_foot_forces(m, d))
        pf = np.array(pf_w).reshape(2, 3)
        x = np.array(x_fb)
        # slope under each sole center and 3 cm ahead of it
        sl = [float(slope(pf[i, 0], pf[i, 1])) for i in range(2)]
        sl2 = [float(slope(pf[i, 0] + 0.03, pf[i, 1])) for i in range(2)]
        c0 = np.array(contact[0])
        print(
            f"{k:3d} | {c0[0]:.0f}{c0[1]:.0f} | {f_pk[0]:6.0f} {f_pk[1]:6.0f}"
            f" | {sl[0]:5.1f} {sl2[0]:5.1f} {sl[1]:6.1f} {sl2[1]:5.1f} | "
            f"{x[0]:+.2f} {x[1]:+.2f} | {d.qpos[2]:.3f}"
        )
        t += mpc.dt
        if d.qpos[2] < 0.25 + float(terr.height(d.qpos[0], d.qpos[1])):
            print(f"FELL at tick {k}")
            break


def cells(amp=AMP, clock=0, **kw):
    """4-seed battery (in-place) at `amp` with MpcConfig overrides.

    ``clock=N`` (N > 0) enables the contact-sensed gait clock with
    clock_max_hold=N (measured: 3 cm 4/4 AND 4 cm 4/4 at clock=2 with
    no overdrive — the amplitude-uniform closure; 5 cm probe in this
    round's battery)."""
    import dataclasses as _dc

    mpc = art_mpc_config(x_cmd=jnp.zeros(12).at[5].set(0.55), **{**ORACLE, **kw})
    gait = GaitConfig()
    if clock:
        gait = _dc.replace(gait, contact_clock=True,
                           clock_max_hold=int(clock))
    ok = []
    for seed in range(4):
        terr = Terrain.rough(jax.random.PRNGKey(100 + seed), amplitude=amp)
        dq = SCALE * np.random.default_rng(seed).standard_normal(10)
        _, _, fell = run_mujoco_closed_loop(
            mpc, gait, 250, dq0=dq, terrain=terr,
        )
        ok.append(not fell)
        print(f"  {amp * 100:.0f}cm {kw} seed {seed}: "
              f"{'ok' if ok[-1] else 'FELL'}", flush=True)
    print(f"{amp * 100:.0f}cm {kw}: {sum(ok)}/4 "
          f"{['ok' if o else 'FELL' for o in ok]}", flush=True)


if __name__ == "__main__":
    args = sys.argv[1:] or ["diag"]
    if args[0] == "diag":
        seed = int(args[-1]) if args[-1].isdigit() else 0
        diag(seed)
    elif args[0] == "cells":
        kw = dict(kv.split("=") for kv in args[1:])
        cells(**{k: float(v) for k, v in kw.items()})
    else:
        raise SystemExit(f"unknown group {args[0]!r} (diag|cells)")
