"""MuJoCo running-gait probe battery (round 4).

The engine runs the flight-phase gait with the contact clock at 0.81 m/s
realized over 10-s zero-fall windows (tools/sweep_run.py group "clock").
THIS battery probes the same stack in stick-friction MuJoCo — the
strongest available physics oracle — and records the measured NEGATIVE
result:

  Every cell achieves 1.5-3 s of GENUINE hopping at 0.7-0.9 m/s
  realized, then falls to a YAW SPIN-OUT: heading ratchets
  -0.4 -> -1.2 -> -3.1 rad over ~40 ticks while speed stays high (the
  diag trace in this round's transcripts; roll follows yaw). The
  binding constraint is stick-friction yaw transmission at running
  stance duty (~2 ticks of single-point support per cycle), consistent
  with the round-3 turning-ceiling findings.

  Knob cells, ALL measured negative (fall tick / terminal yaw):
    baseline (apex .08)            FELL@52-53 both seeds
    apex .06                       FELL@78 (longest; used below)
    clock_max_hold 3, width .08,
    td-damp 12, vx 0.8             FELL@42-53
    MORE yaw authority: pivot 3-6, hipyaw 5/.6, tau_z 6,
    pivot+hipyaw combos            FELL@33-40 (WORSE: swing reaction
                                   torques dominate — the round-3
                                   fast-band lesson repeats)
    LESS yaw excitation: fh 0, fh 0 + tau_z 2, fh 1.5 + clip .2,
    + ffs .75                      FELL@37-53 (terminal yaw shrinks to
                                   +-0.5-0.6 but the spin still wins)

Usage: python tools/sweep_mj_run.py [vx] [clock_max_hold]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "pytest" not in sys.modules:
    jax.config.update("jax_platforms", "cpu")

import dataclasses as dc  # noqa: E402

import numpy as np  # noqa: E402

from biped_mpc_py_tpu.models.biped import BipedParams  # noqa: E402
from biped_mpc_py_tpu.parallel.rollout_art import art_config_for_run  # noqa: E402
from biped_mpc_py_tpu.sim.mj_driver import run_mujoco_closed_loop  # noqa: E402
from biped_mpc_py_tpu.sim.model import hector_model  # noqa: E402

ORACLE = dict(
    tau_z_max=4.0, kp_hipyaw=3.0, kd_hipyaw=0.4, swing_td_damp=8.0,
    swing_height=0.06,
)


def probe(vx: float, mh: int, seeds: int = 2, **kw):
    mpc, gait = art_config_for_run(vx, **{**ORACLE, **kw})
    gait = dc.replace(gait, contact_clock=True, clock_max_hold=mh)
    model, biped = hector_model(), BipedParams()
    for seed in range(seeds):
        dq = 2e-3 * np.random.default_rng(seed).standard_normal(10)
        _, xs, fell = run_mujoco_closed_loop(
            mpc, gait, 250, model=model, biped=biped, dq0=dq,
        )
        n = len(xs)
        print(
            f"  mj-run vx={vx} mh={mh} {kw} seed {seed}: "
            f"{'FELL@' + str(n) if fell else 'ok'} x={xs[-1][3]:.2f} "
            f"yaw={xs[-1][2]:+.2f}",
            flush=True,
        )


def r5(vx: float = 1.0, mh: int = 2, seeds: int = 2):
    """Round-5 yaw-mechanism battery (VERDICT item 2): the round-4 cells
    were authority/excitation KNOBS; these are the three MECHANISMS the
    spin-out diagnosis calls for — touchdown heading pre-rotation
    (hipyaw_rate_lead), flight-phase reaction-wheel damping
    (flight_yaw_kd), and steering by placement alone (tau_z_max -> ~0,
    no planned yaw couple for stick friction to transmit)."""
    base = dict(swing_height=0.06)
    cells = [
        ("base(apex.06)  ", {}),
        ("lead.1         ", dict(hipyaw_rate_lead=0.1)),
        ("lead.2         ", dict(hipyaw_rate_lead=0.2)),
        ("fly1           ", dict(flight_yaw_kd=1.0)),
        ("fly2           ", dict(flight_yaw_kd=2.0)),
        ("tz.5           ", dict(tau_z_max=0.5)),
        ("lead.1+fly1    ", dict(hipyaw_rate_lead=0.1, flight_yaw_kd=1.0)),
        ("lead.1+tz.5    ", dict(hipyaw_rate_lead=0.1, tau_z_max=0.5)),
        ("lead.1+fly1+tz ", dict(hipyaw_rate_lead=0.1, flight_yaw_kd=1.0,
                                 tau_z_max=0.5)),
    ]
    for lab, kw in cells:
        print(f"== r5 {lab} ==", flush=True)
        probe(vx, mh, seeds=seeds, **{**base, **kw})


def probe_trace(vx: float, mh: int, seeds: int = 2, spp: int = 2,
                fls: int = 1, n_ticks: int = 250, trace: bool = True,
                **kw):
    """Like :func:`probe` but prints a tail trace of the feedback state
    (yaw, pitch, roll, vx, vy, z every 3rd tick of the last 30) so the
    FALL MODE is visible, not just the fall tick."""
    mpc, gait = art_config_for_run(vx, **{**ORACLE, **kw})
    gait = dc.replace(
        gait, contact_clock=True, clock_max_hold=mh,
        steps_per_phase=spp, flight_steps=fls,
    )
    model, biped = hector_model(), BipedParams()
    for seed in range(seeds):
        dq = 2e-3 * np.random.default_rng(seed).standard_normal(10)
        _, xs, fell = run_mujoco_closed_loop(
            mpc, gait, n_ticks, model=model, biped=biped, dq0=dq,
        )
        n = len(xs)
        print(
            f"  mj-run vx={vx} mh={mh} p{spp}f{fls} {kw} seed {seed}: "
            f"{'FELL@' + str(n) if fell else 'ok'} x={xs[-1][3]:.2f} "
            f"yaw={xs[-1][2]:+.2f}",
            flush=True,
        )
        if not trace:
            continue
        for i in range(max(0, n - 30), n, 3):
            x = xs[i]
            print(
                f"    t{i:3d} yaw={x[2]:+.2f} pit={x[1]:+.2f} "
                f"rol={x[0]:+.2f} vx={x[9]:+.2f} vy={x[10]:+.2f} "
                f"z={x[5]:.3f}",
                flush=True,
            )


def r5b(vx: float = 1.0, mh: int = 2):
    """Body-frame command semantics for running: with a WORLD-frame
    velocity command, any heading drift turns forward running into
    (unstable) sideways running — the command itself couples yaw drift
    into the fall. cmd_body_frame=True makes the velocity command follow
    the heading (drift = benign curved running), the same semantics the
    unified turn-in-place operating point uses."""
    cells = [
        ("bf             ", dict(cmd_body_frame=True)),
        ("bf+lead.1      ", dict(cmd_body_frame=True,
                                 hipyaw_rate_lead=0.1)),
        ("bf+fly1        ", dict(cmd_body_frame=True, flight_yaw_kd=1.0)),
        ("bf+lead+fly+tz ", dict(cmd_body_frame=True, hipyaw_rate_lead=0.1,
                                 flight_yaw_kd=1.0, tau_z_max=0.5)),
    ]
    base = dict(swing_height=0.06)
    for lab, kw in cells:
        print(f"== r5b {lab} ==", flush=True)
        probe_trace(vx, mh, seeds=2, **{**base, **kw})


def r5c(vx: float = 1.0, mh: int = 2):
    """Lateral-channel battery: the r5b traces show that once
    flight_yaw_kd holds yaw near zero, the binding failure is LATERAL —
    vy drifts to -0.5..-1.0 m/s with roll creep over ~15 ticks, and the
    terminal yaw chaos is the symptom of the sideways fall, not the
    cause. Levers: stance width (swing_y_offset), ALIP lateral momentum
    placement (raibert_am_x), capture gain."""
    base = dict(swing_height=0.06, flight_yaw_kd=1.0)
    cells = [
        ("fly1+yoff.08   ", dict(swing_y_offset=0.08)),
        ("fly1+amx.14    ", dict(raibert_am_x=0.14)),
        ("fly1+cap.5     ", dict(raibert_capture_gain=0.5)),
        ("fly1+yoff+amx  ", dict(swing_y_offset=0.08, raibert_am_x=0.14)),
        ("fly1+yoff+cap  ", dict(swing_y_offset=0.08,
                                 raibert_capture_gain=0.5)),
        ("fly1+all3      ", dict(swing_y_offset=0.08, raibert_am_x=0.14,
                                 raibert_capture_gain=0.5)),
    ]
    for lab, kw in cells:
        print(f"== r5c {lab} ==", flush=True)
        probe_trace(vx, mh, seeds=2, **{**base, **kw})


def r5d():
    """Cadence battery: p=3/p=4 stance at flight_steps=1 gives 50-100%
    more stick-friction transmission time per stance — the mechanism the
    spin-out diagnosis actually names — at the cost of a lower flight
    fraction (grounded-running end of the spectrum)."""
    base = dict(swing_height=0.06, flight_yaw_kd=1.0)
    cells = [
        ("p3f1 vx0.8     ", 0.8, 3, {}),
        ("p3f1 vx1.0     ", 1.0, 3, {}),
        ("p3f1 0.8 lead.1", 0.8, 3, dict(hipyaw_rate_lead=0.1)),
        ("p3f1 0.8 apex.8", 0.8, 3, dict(swing_height=0.08)),
        ("p4f1 vx0.8     ", 0.8, 4, {}),
        ("p2f1 0.8 lf.7  ", 0.8, 2, dict(swing_land_frac=0.7)),
    ]
    for lab, vx, spp, kw in cells:
        print(f"== r5d {lab} ==", flush=True)
        probe_trace(vx, 2, seeds=2, spp=spp, **{**base, **kw})


def r5e():
    """Validation battery around the r5d unlock (p2f1 + swing_land_frac
    0.7 + flight_yaw_kd 1 at vx=0.8: 10 s zero-fall, heading held):
    5-seed confirmation, the two single-knob ablations, the vx=1.0
    variant, and a 20 s window."""
    g = dict(swing_height=0.06, flight_yaw_kd=1.0, swing_land_frac=0.7)
    print("== r5e golden x5 seeds (10 s) ==", flush=True)
    probe_trace(0.8, 2, seeds=5, trace=False, **g)
    print("== r5e ablate fly1 (lf.7 only) ==", flush=True)
    probe_trace(0.8, 2, seeds=3, trace=False,
                **dict(swing_height=0.06, swing_land_frac=0.7))
    print("== r5e ablate lf (fly1 only, known) ==", flush=True)
    print("  (r5c: FELL@40-51 both seeds)", flush=True)
    print("== r5e vx=1.0 ==", flush=True)
    probe_trace(1.0, 2, seeds=3, trace=False, **g)
    print("== r5e 20 s window ==", flush=True)
    probe_trace(0.8, 2, seeds=3, n_ticks=500, trace=False, **g)


def r5f():
    """Seed-robustness refinement around the r5e golden cell (3/5 at
    10 s; seeds 3-4 fall at ~1.5-2 s)."""
    g = dict(swing_height=0.06, flight_yaw_kd=1.0, swing_land_frac=0.7)
    cells = [
        ("golden mh3     ", 3, g),
        ("lf.65          ", 2, {**g, "swing_land_frac": 0.65}),
        ("fly1.5         ", 2, {**g, "flight_yaw_kd": 1.5}),
        ("lead.1         ", 2, {**g, "hipyaw_rate_lead": 0.1}),
    ]
    for lab, mh, kw in cells:
        print(f"== r5f {lab} ==", flush=True)
        probe_trace(0.8, mh, seeds=5, trace=False, **kw)


def r5g():
    """Seeds 3-4 trace shows the yaw ratchet re-appearing during SPIN-UP
    (yaw -0.16 -> -0.93 over 15 ticks) and the WORLD-frame command then
    pushing the drifted body over sideways. Cells: body-frame command
    composed WITH the lf.7 touchdown fix (r5b tested bf before lf.7
    existed), and stance-pivot authority retried post-lf.7."""
    g = dict(swing_height=0.06, flight_yaw_kd=1.0, swing_land_frac=0.7)
    cells = [
        ("bf+golden      ", {**g, "cmd_body_frame": True}),
        ("bf+golden+lead ", {**g, "cmd_body_frame": True,
                             "hipyaw_rate_lead": 0.1}),
        ("golden kp_piv2 ", {**g, "kp_pivot": 2.0}),
        ("golden kp_piv4 ", {**g, "kp_pivot": 4.0}),
    ]
    for lab, kw in cells:
        print(f"== r5g {lab} ==", flush=True)
        probe_trace(0.8, 2, seeds=5, trace=False, **kw)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "r5g":
        r5g()
    elif len(sys.argv) > 1 and sys.argv[1] == "r5f":
        r5f()
    elif len(sys.argv) > 1 and sys.argv[1] == "r5e":
        r5e()
    elif len(sys.argv) > 1 and sys.argv[1] == "r5d":
        r5d()
    elif len(sys.argv) > 1 and sys.argv[1] == "r5c":
        r5c()
    elif len(sys.argv) > 1 and sys.argv[1] == "r5b":
        r5b()
    elif len(sys.argv) > 1 and sys.argv[1] == "r5":
        r5(*[float(a) if "." in a else int(a) for a in sys.argv[2:3]] or [])
    else:
        vx = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
        mh = int(sys.argv[2]) if len(sys.argv) > 2 else 2
        probe(vx, mh)
