"""ALIP placement / swing-retraction battery (round 5, VERDICT item 1).

Target: break the running slow attractor — the round-4 finding that the
fast hop cycle (realized ~0.8+ m/s over 10 s with the contact clock)
decays into a ~0.25-0.30 m/s braking equilibrium over 20 s windows
through a pitch-velocity spiral (DESIGN_NOTES "The contact-sensed gait
clock"). The round-4 analysis named the driver: braking impulses at
forward-of-CoM footholds pump nose-down angular momentum, and nose-down
geometry brakes more. Two mechanism-level levers (config.py, round 5):

  raibert_am_y   ALIP momentum-equivalent velocity in the placement law
                 (v_eff = v + (I/(m z))·w); physical value ~0.143
  swing_retract  late-swing backward target ramp (touchdown braking lever)

Groups (segmented batched rollouts — per-segment realized speed exposes
the decay trajectory, not just the endpoint):

  am      raibert_am_y grid x commands, 30 s
  ret     swing_retract grid, 30 s
  combo   cross of the survivors, 30 s, 3 perturbations
  long    60 s x 5 perturbed seeds at chosen operating points

Usage: python tools/sweep_alip.py [am|ret|combo|pitch2|p3|p4|p5|long ...]
(CPU). pitch2/p3/p4 screen the pitch-spiral counters (leaky pitch ref +
pitch-angle placement); p5 schedules the command to the attractor's reach.
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

from biped_mpc_py_tpu.config import GaitConfig
from biped_mpc_py_tpu.models.biped import BipedParams
from biped_mpc_py_tpu.parallel.rollout_art import art_config_for_run
from biped_mpc_py_tpu.parallel.sweep import (
    art_sweep_fn,
    perturbed_worlds,
    stack_configs,
)
from biped_mpc_py_tpu.utils.precision import f32_precision

SEG = 125  # ticks per segment (5 s)


def run_clock_gait():
    return dc.replace(
        GaitConfig(steps_per_phase=2, flight_steps=1),
        contact_clock=True, clock_max_hold=2,
    )


def segmented(configs, labels, n_segments, gait=None, key=7):
    """Batched rollout in SEG-tick segments; prints falls + per-segment
    realized speed for each cell."""
    gait = gait or run_clock_gait()
    biped = BipedParams()
    mpc_batch, in_axes = stack_configs(configs)
    worlds = perturbed_worlds(configs[0], len(configs), jax.random.PRNGKey(key))
    fn = jax.jit(f32_precision(art_sweep_fn(SEG, gait, in_axes)))
    t0 = time.time()
    pos_hist, fall_hist = [], []
    pos0 = np.array(jax.vmap(lambda s: s.torso_state()[3])(worlds.sim))
    for _ in range(n_segments):
        worlds = fn(worlds, biped, mpc_batch)
        jax.block_until_ready(worlds)
        pos_hist.append(
            np.array(jax.vmap(lambda s: s.torso_state()[3])(worlds.sim))
        )
        fall_hist.append(np.array(worlds.metrics.falls))
    print(f"  ({time.time() - t0:.0f}s)")
    pos = np.stack([pos0] + pos_hist)  # (n_seg+1, n_cells)
    v_seg = np.diff(pos, axis=0) / (SEG * 0.04)  # (n_seg, n_cells)
    falls = fall_hist[-1]
    for i, lab in enumerate(labels):
        segs = " ".join(f"{v: .2f}" for v in v_seg[:, i])
        print(f"  {lab}: falls={falls[i]:.0f} v/seg=[{segs}]")
    sys.stdout.flush()
    return v_seg, falls


def am():
    configs, labels = [], []
    for vx in (1.0, 1.2):
        for amy in (-0.14, -0.07, 0.0, 0.07, 0.14, 0.21):
            mpc, _ = art_config_for_run(vx, raibert_am_y=amy)
            configs.append(mpc)
            labels.append(f"vx={vx} am_y={amy:+.2f}")
    print("== ALIP am_y grid (30 s, clock op point) ==")
    segmented(configs, labels, 6)


def ret():
    configs, labels = [], []
    for vx in (1.2,):
        for r in (0.0, 0.02, 0.04, 0.06):
            mpc, _ = art_config_for_run(vx, swing_retract=r)
            configs.append(mpc)
            labels.append(f"vx={vx} ret={r:.2f}")
    print("== swing_retract grid (30 s, clock op point) ==")
    segmented(configs, labels, 6)


def combo(cells=None):
    cells = cells or [
        (1.2, 0.07, 0.02), (1.2, 0.14, 0.0), (1.2, 0.14, 0.02),
        (1.2, 0.07, 0.04), (1.0, 0.14, 0.02),
    ]
    configs, labels = [], []
    for vx, amy, r in cells:
        for pert in range(3):
            mpc, _ = art_config_for_run(
                vx, raibert_am_y=amy, swing_retract=r
            )
            configs.append(mpc)
            labels.append(f"vx={vx} am={amy:+.2f} ret={r:.2f} p{pert}")
    print("== combos (30 s, 3 perts) ==")
    segmented(configs, labels, 6)


def pitch2():
    """Round-5 decay-spiral counters, screened from the diag trace
    (tools/diag_run_decay.py): the decay's slow variable is pitch ANGLE
    (the MPC drags the hop's natural +0.12 attitude to 0 and the foothold
    lever grows with the pitch deficit). A-cells: reduce pitch position
    authority / add rate damping (Q leaves). B-cells: pitch-angle
    placement feedback (MpcConfig.raibert_pitch_place)."""
    import jax.numpy as jnp

    configs, labels = [], []
    base, _ = art_config_for_run(1.2)
    configs.append(base)
    labels.append("baseline")
    for qp in (5.0, 20.0):
        for qw in (1.0, 10.0, 30.0):
            m = dc.replace(
                base, Q=base.Q.at[1].set(qp).at[7].set(qw)
            )
            configs.append(m)
            labels.append(f"Qp={qp:.0f} Qw={qw:.0f}")
    for kpp in (0.1, 0.2, 0.3):
        m = dc.replace(
            base, raibert_pitch_place=kpp, raibert_pitch_nom=0.12
        )
        configs.append(m)
        labels.append(f"kpp={kpp}")
    # combined: free-ish pitch + placement feedback
    m = dc.replace(
        base, Q=base.Q.at[1].set(20.0).at[7].set(10.0),
        raibert_pitch_place=0.2, raibert_pitch_nom=0.12,
    )
    configs.append(m)
    labels.append("Qp=20 Qw=10 kpp=0.2")
    print("== pitch-spiral counters (30 s, vx=1.2 clock op point) ==")
    segmented(configs, labels, 6)


def p3():
    """kpp refinement: pitch-angle placement (the first knob to hold
    speed past 15 s) combined with an ALIGNED MPC pitch reference —
    the placement term and the attitude regulator should agree on the
    hop's natural nose-up equilibrium instead of fighting (baseline MPC
    target 0 drags pitch down while kpp pulls the foothold back)."""
    configs, labels = [], []

    def cell(lab, vx=1.2, pref=0.0, **kw):
        mpc, _ = art_config_for_run(vx, **kw)
        if pref:
            mpc = dc.replace(mpc, x_cmd=mpc.x_cmd.at[1].set(pref))
        configs.append(mpc)
        labels.append(lab)

    cell("kpp.2 nom.12           ",
         raibert_pitch_place=0.2, raibert_pitch_nom=0.12)
    cell("kpp.2 nom.12 pref.06   ", pref=0.06,
         raibert_pitch_place=0.2, raibert_pitch_nom=0.12)
    cell("kpp.2 nom.12 pref.12   ", pref=0.12,
         raibert_pitch_place=0.2, raibert_pitch_nom=0.12)
    cell("kpp.15 nom.12          ",
         raibert_pitch_place=0.15, raibert_pitch_nom=0.12)
    cell("kpp.25 nom.12          ",
         raibert_pitch_place=0.25, raibert_pitch_nom=0.12)
    cell("kpp.2 nom.15           ",
         raibert_pitch_place=0.2, raibert_pitch_nom=0.15)
    cell("kpp.2 nom.12 vint      ",
         raibert_pitch_place=0.2, raibert_pitch_nom=0.12,
         raibert_vint=0.3, cmd_v_int_gain=0.02, cmd_v_int_max=0.1,
         cmd_v_int_ref_scale=0.0)
    cell("kpp.2 nom.12 ret.02    ",
         raibert_pitch_place=0.2, raibert_pitch_nom=0.12,
         swing_retract=0.02)
    cell("kpp.2 nom.12 vx1.0     ", vx=1.0,
         raibert_pitch_place=0.2, raibert_pitch_nom=0.12)
    print("== kpp + pitch-ref alignment (30 s) ==")
    segmented(configs, labels, 6)


def p4():
    """Robust screen (5 perturbations/cell — the single-pert p3 screen
    was seed-chaotic): pitch-angle placement (kpp) x the leaky pitch
    reference (MpcConfig.pitch_ref_leak), 30 s."""
    cells = [
        ("base        ", 1.2, {}),
        ("kpp.2/.15   ", 1.2,
         dict(raibert_pitch_place=0.2, raibert_pitch_nom=0.15)),
        ("leak.02     ", 1.2, dict(pitch_ref_leak=0.02)),
        ("leak.05     ", 1.2, dict(pitch_ref_leak=0.05)),
        ("kpp+leak.02 ", 1.2,
         dict(raibert_pitch_place=0.2, raibert_pitch_nom=0.15,
              pitch_ref_leak=0.02)),
        ("kpp+lk 1.0  ", 1.0,
         dict(raibert_pitch_place=0.2, raibert_pitch_nom=0.15,
              pitch_ref_leak=0.02)),
    ]
    configs, labels = [], []
    for lab, vx, kw in cells:
        for pert in range(5):
            mpc, _ = art_config_for_run(vx, **kw)
            configs.append(mpc)
            labels.append(f"{lab} p{pert}")
    print("== p4: kpp x pitch-ref leak (30 s, 5 perts) ==")
    segmented(configs, labels, 6)


def segmented_sched(configs, labels, vx_sched, gait=None, key=7):
    """Like :func:`segmented` but with a PER-SEGMENT commanded-speed
    schedule (vx_sched: list of per-segment vx, one per segment, applied
    to every cell). x_cmd is a dynamic leaf, so swapping it between
    segment calls re-uses the compiled rollout."""
    gait = gait or run_clock_gait()
    biped = BipedParams()
    mpc_batch, in_axes = stack_configs(configs)
    worlds = perturbed_worlds(configs[0], len(configs), jax.random.PRNGKey(key))
    fn = jax.jit(f32_precision(art_sweep_fn(SEG, gait, in_axes)))
    t0 = time.time()
    pos_hist, fall_hist = [], []
    pos0 = np.array(jax.vmap(lambda s: s.torso_state()[3])(worlds.sim))
    xc = mpc_batch.x_cmd
    stacked = xc.ndim == 2
    for vx in vx_sched:
        if stacked:
            xck = xc.at[:, 9].set(vx)
        else:
            xck = xc.at[9].set(vx)
        mb = dc.replace(mpc_batch, x_cmd=xck)
        worlds = fn(worlds, biped, mb)
        jax.block_until_ready(worlds)
        pos_hist.append(
            np.array(jax.vmap(lambda s: s.torso_state()[3])(worlds.sim))
        )
        fall_hist.append(np.array(worlds.metrics.falls))
    print(f"  ({time.time() - t0:.0f}s) sched={vx_sched}")
    pos = np.stack([pos0] + pos_hist)
    v_seg = np.diff(pos, axis=0) / (SEG * 0.04)
    falls = fall_hist[-1]
    for i, lab in enumerate(labels):
        segs = " ".join(f"{v: .2f}" for v in v_seg[:, i])
        print(f"  {lab}: falls={falls[i]:.0f} v/seg=[{segs}]")
    sys.stdout.flush()
    return v_seg, falls


def p5():
    """Command scheduling x mechanism cells: the burst analysis says the
    fast attractor's reach is ~0.9-1.0 — holding a 1.2 command
    over-drives it. Spin up at 1.2 for 10 s, then settle to a
    within-reach command (0.8/0.9) and measure whether the fast cycle
    SUSTAINS. lf.7 = swing_land_frac 0.7, the round-5 MuJoCo-running
    unlock (earlier swing descent -> touchdowns land on schedule), cross-
    checked here on the engine."""
    for kw, tag in (
        ({}, "base   "),
        (dict(raibert_pitch_place=0.2, raibert_pitch_nom=0.12), "kpp.12 "),
        (dict(swing_land_frac=0.7), "lf.7   "),
        (dict(raibert_pitch_place=0.2, raibert_pitch_nom=0.12,
              swing_land_frac=0.7), "kpp+lf "),
    ):
        for sched in ([1.2] * 9, [1.2, 1.2] + [0.9] * 7,
                      [1.2, 1.2] + [0.8] * 7):
            configs, labels = [], []
            for pert in range(5):
                mpc, _ = art_config_for_run(1.2, **kw)
                configs.append(mpc)
                labels.append(f"{tag} p{pert}")
            print(f"== p5 {tag} sched={sched[0]}->{sched[-1]} (45 s) ==")
            segmented_sched(configs, labels, sched)


def p6():
    """ffs (permanent neutral-point shift) x round-5 stabilizers.

    p5 verdict: every command-settle cell CRASHES — the fast cycle is
    held up by the deficit-proportional capture bias (large |v - v_cmd|
    keeps the foothold back), so it cannot survive at a reachable
    command. Sustained running therefore needs a PERMANENT backward
    neutral shift. Round 4 measured exactly that: ffs 0.75 sustains
    ~0.98 but falls 3x (DESIGN_NOTES countermeasure list). Compose ffs
    with the stabilizers built since, which target ffs's two failure
    modes: kpp nom.15 (pitch spiral) and lf.7 (late touchdowns)."""
    KPP = dict(raibert_pitch_place=0.2, raibert_pitch_nom=0.15)
    cells = [
        ("ffs.75           ", 1.2, dict(raibert_ff_scale=0.75)),
        ("ffs.75 kpp       ", 1.2, dict(raibert_ff_scale=0.75, **KPP)),
        ("ffs.75 lf.7      ", 1.2,
         dict(raibert_ff_scale=0.75, swing_land_frac=0.7)),
        ("ffs.75 kpp lf.7  ", 1.2,
         dict(raibert_ff_scale=0.75, swing_land_frac=0.7, **KPP)),
        ("ffs.72 kpp       ", 1.2, dict(raibert_ff_scale=0.72, **KPP)),
        ("ffs.75 kpp v1.0  ", 1.0, dict(raibert_ff_scale=0.75, **KPP)),
    ]
    configs, labels = [], []
    for lab, vx, kw in cells:
        for pert in range(5):
            mpc, _ = art_config_for_run(vx, **kw)
            configs.append(mpc)
            labels.append(f"{lab} p{pert}")
    print("== p6: ffs x stabilizers (30 s, 5 perts) ==")
    segmented(configs, labels, 6)


def p7():
    """MPC-cost cells: the decay could be the MPC's own trade (pitch
    weight 100 vs vx weight 1 — velocity tracking rides only through the
    re-anchored position ref). Boost direct vx tracking / cheapen fx,
    on top of the best p6 stabilizer pair; plus the ffs 0.77/0.78
    crosses p6 skipped."""
    SK = dict(raibert_pitch_place=0.2, raibert_pitch_nom=0.15,
              swing_land_frac=0.7)

    def with_q(mpc, idx, val):
        return dc.replace(mpc, Q=mpc.Q.at[idx].set(val))

    cells = []
    for lab, vx, kw, post in (
        ("Qvx5            ", 1.2, {}, lambda m: with_q(m, 9, 5.0)),
        ("Qvx5  kpp lf    ", 1.2, SK, lambda m: with_q(m, 9, 5.0)),
        ("Qvx20 kpp lf    ", 1.2, SK, lambda m: with_q(m, 9, 20.0)),
        ("Rfx-5 kpp lf    ", 1.2, SK,
         lambda m: dc.replace(m, R=m.R.at[0].set(1e-5).at[3].set(1e-5))),
        ("ffs.77 kpp lf   ", 1.2, dict(raibert_ff_scale=0.77, **SK),
         None),
        ("ffs.78 kpp lf   ", 1.2, dict(raibert_ff_scale=0.78, **SK),
         None),
    ):
        cells.append((lab, vx, kw, post))
    configs, labels = [], []
    for lab, vx, kw, post in cells:
        for pert in range(5):
            mpc, _ = art_config_for_run(vx, **kw)
            if post is not None:
                mpc = post(mpc)
            configs.append(mpc)
            labels.append(f"{lab} p{pert}")
    print("== p7: MPC-cost cells + ffs crosses (30 s, 5 perts) ==")
    segmented(configs, labels, 6)


def p8():
    """Vertical-energy cells on the p7 winner (ffs.77 kpp lf: 5/5
    zero-fall, >=0.76 for 15 s, then the same decay). The hop's energy
    source is the MPC's z restitution against the CONSTANT 0.55 height
    command (Q_z=700 damps the hop's own oscillation); these cells move
    the energy balance: command height, Q_z, swing apex. 60 s so the
    winner doubles as the long-window record."""
    BASE = dict(raibert_ff_scale=0.77, raibert_pitch_place=0.2,
                raibert_pitch_nom=0.15, swing_land_frac=0.7)

    def with_q(mpc, idx, val):
        return dc.replace(mpc, Q=mpc.Q.at[idx].set(val))

    def with_z(mpc, z):
        return dc.replace(mpc, x_cmd=mpc.x_cmd.at[5].set(z))

    cells = [
        ("base(ffs77 kpp lf)", {}, None),
        ("z.57              ", {}, lambda m: with_z(m, 0.57)),
        ("z.53              ", {}, lambda m: with_z(m, 0.53)),
        ("Qz300             ", {}, lambda m: with_q(m, 5, 300.0)),
        ("Qz1500            ", {}, lambda m: with_q(m, 5, 1500.0)),
        ("apex.10           ", dict(swing_height=0.10), None),
    ]
    configs, labels = [], []
    for lab, kw, post in cells:
        for pert in range(5):
            mpc, _ = art_config_for_run(1.2, **dict(BASE, **kw))
            if post is not None:
                mpc = post(mpc)
            configs.append(mpc)
            labels.append(f"{lab} p{pert}")
    print("== p8: vertical-energy cells on ffs.77 kpp lf (60 s, 5 perts) ==")
    segmented(configs, labels, 12)


def long(cells=None):
    cells = cells or [(1.2, 0.14, 0.0)]
    configs, labels = [], []
    for vx, amy, r in cells:
        for pert in range(5):
            mpc, _ = art_config_for_run(
                vx, raibert_am_y=amy, swing_retract=r
            )
            configs.append(mpc)
            labels.append(f"vx={vx} am={amy:+.2f} ret={r:.2f} p{pert}")
    print("== long (60 s, 5 perts) ==")
    segmented(configs, labels, 12)


if __name__ == "__main__":
    groups = sys.argv[1:] or ["am"]
    if "am" in groups:
        am()
    if "ret" in groups:
        ret()
    if "combo" in groups:
        combo()
    if "pitch2" in groups:
        pitch2()
    if "p3" in groups:
        p3()
    if "p4" in groups:
        p4()
    if "p5" in groups:
        p5()
    if "p6" in groups:
        p6()
    if "p7" in groups:
        p7()
    if "p8" in groups:
        p8()
    if "long" in groups:
        long()
