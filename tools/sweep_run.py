"""Running-gait (flight-phase) sweep battery (round 4, VERDICT item 2).

The round-3 transport-limit proof (DESIGN_NOTES "The fast-band
realized-speed ceiling") concluded that >0.7 m/s realized needs a
different STRIDE mechanism — a flight phase. GaitConfig.flight_steps
implements it; this battery maps the running envelope on the articulated
engine and reproduces the measured findings in DESIGN_NOTES round 4:

  group "cells":  the operating-point grid at 1.0-1.4 m/s commands
                  (apex x land_frac x track_ff x stance width)
  group "attr":   the two-attractor demonstration — cold start vs
                  command-ramped start at the same config (steady-state
                  speed of the last 4 s)
  group "pitch":  the pitch-authority variants (Q_pitch, nose-up ref)
  group "clock":  contact-sensed gait clock battery (GaitConfig.
                  contact_clock — touchdown-triggered re-anchoring),
                  perturbation-validated falls/realized per command
  group "clock_vss": serial steady-state speed (last 4 s) at the clock
                  operating point

Usage: python tools/sweep_run.py [cells|attr|pitch|clock|clock_vss ...]
(CPU: ~2-3 min/cell on the single container core; vmap-batched on TPU
via parallel/sweep.py-style config stacking for the "cells" group.)
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
from biped_mpc_py_tpu.parallel.rollout_art import (
    art_closed_loop_tick,
    art_config_for_run,
    init_art_world,
)
from biped_mpc_py_tpu.parallel.sweep import (
    art_sweep_fn,
    perturbed_worlds,
    stack_configs,
)
from biped_mpc_py_tpu.sim.engine import com_feedback_state
from biped_mpc_py_tpu.sim.model import hector_model
from biped_mpc_py_tpu.utils.precision import f32_precision

N_STEPS = 250
N_PERT = 5


def cells(group_filter=None):
    """Perturbation-validated operating-point grid (vmap-batched)."""
    biped = BipedParams()
    configs, labels = [], []
    for vx in (1.0, 1.2, 1.4):
        for land in (0.8, 1.0):
            for ff in (0.0, 1.0):
                for pert in range(N_PERT):
                    mpc, _ = art_config_for_run(
                        vx, swing_land_frac=land, swing_track_ff=ff
                    )
                    configs.append(mpc)
                    labels.append((vx, land, ff, pert))
    mpc_batch, in_axes = stack_configs(configs)
    worlds = perturbed_worlds(configs[0], len(configs), jax.random.PRNGKey(29))
    gait = GaitConfig(steps_per_phase=2, flight_steps=1)
    fn = jax.jit(f32_precision(art_sweep_fn(N_STEPS, gait, in_axes)))
    t0 = time.time()
    out = fn(worlds, biped, mpc_batch)
    jax.block_until_ready(out)
    falls = np.array(out.metrics.falls)
    pos = np.array(jax.vmap(lambda s: s.torso_state()[3])(out.sim))
    print(f"== running cells ({time.time() - t0:.0f}s) ==")
    cells_idx = {}
    for i, (vx, land, ff, pert) in enumerate(labels):
        cells_idx.setdefault((vx, land, ff), []).append(i)
    for (vx, land, ff), idx in sorted(cells_idx.items()):
        print(
            f"  vx={vx} land={land} ff={ff}: falls={falls[idx].sum():.0f}/"
            f"{N_PERT} realized={pos[idx].mean() / (N_STEPS * 0.04):.3f}"
        )
    sys.stdout.flush()


def _serial(mpc0, gait, ticks, v_of_tick):
    """Serial rollout with a per-tick command schedule; returns
    (falls, first_fall_tick, v_ss over the last 4 s, final pitch)."""
    biped, model = BipedParams(), hector_model()
    tick = jax.jit(
        f32_precision(lambda w, m: art_closed_loop_tick(w, m, gait, biped, model))
    )
    w = init_art_world(mpc0)
    ft, x0 = -1, None
    for i in range(ticks):
        m = dc.replace(mpc0, x_cmd=mpc0.x_cmd.at[9].set(v_of_tick(i)))
        w = tick(w, m)
        if ft < 0 and float(w.metrics.falls) > 0:
            ft = i
        if i == ticks - 101:
            x0 = float(com_feedback_state(model, w.sim)[3])
    x = np.array(com_feedback_state(model, w.sim))
    return float(w.metrics.falls), ft, (float(x[3]) - x0) / 4.0, float(x[1])


def attr():
    """The two-attractor demonstration: same config, cold vs ramped start."""
    mpc, gait = art_config_for_run(1.2)
    for name, sched, ticks in (
        ("cold", lambda i: 1.2, 375),
        ("ramp", lambda i: 1.2 * min(1.0, max(0.0, (i - 50) / 75.0)), 375),
    ):
        falls, ft, v_ss, pitch = _serial(mpc, gait, ticks, sched)
        print(
            f"  attr {name}: falls={falls:.0f}(@{ft}) v_ss={v_ss:.3f} "
            f"pitch={pitch:+.3f}"
        )
        sys.stdout.flush()


def pitch():
    """Pitch-authority variants at 1.2 (the nose-down slow attractor)."""
    for qp, ref in ((100, 0.0), (300, 0.0), (300, 0.06)):
        mpc, gait = art_config_for_run(1.2)
        mpc = dc.replace(
            mpc,
            Q=mpc.Q.at[1].set(float(qp)),
            x_cmd=mpc.x_cmd.at[1].set(ref),
        )
        falls, ft, v_ss, p = _serial(mpc, gait, 250, lambda i: 1.2)
        print(
            f"  pitch Q={qp} ref={ref}: falls={falls:.0f}(@{ft}) "
            f"v_ss={v_ss:.3f} pitch={p:+.3f}"
        )
        sys.stdout.flush()


def clock():
    """Contact-sensed gait clock battery (GaitConfig.contact_clock):
    perturbation-validated falls + realized speed per command, one
    vmapped batch per gait variant (clock knobs are static fields)."""
    biped = BipedParams()
    for gkw in (
        dict(clock_max_hold=2),
        dict(clock_max_hold=2, flight_steps=2),
    ):
        gait = dc.replace(
            GaitConfig(steps_per_phase=2, flight_steps=1),
            contact_clock=True, **gkw,
        )
        configs, labels = [], []
        for vx in (1.0, 1.2, 1.4):
            for pert in range(N_PERT):
                mpc, _ = art_config_for_run(vx)
                configs.append(mpc)
                labels.append((vx, pert))
        mpc_batch, in_axes = stack_configs(configs)
        worlds = perturbed_worlds(
            configs[0], len(configs), jax.random.PRNGKey(29)
        )
        fn = jax.jit(f32_precision(art_sweep_fn(N_STEPS, gait, in_axes)))
        t0 = time.time()
        out = fn(worlds, biped, mpc_batch)
        jax.block_until_ready(out)
        falls = np.array(out.metrics.falls)
        pos = np.array(jax.vmap(lambda s: s.torso_state()[3])(out.sim))
        print(f"== clock {gkw} ({time.time() - t0:.0f}s) ==")
        for vx in (1.0, 1.2, 1.4):
            idx = [i for i, (v, _) in enumerate(labels) if v == vx]
            print(
                f"  vx={vx}: falls={falls[idx].sum():.0f}/{N_PERT} "
                f"realized={pos[idx].mean() / (N_STEPS * 0.04):.3f}"
            )
        sys.stdout.flush()


def clock_vss():
    """Serial v_ss (last 4 s) at the clock operating point."""
    for vx in (1.0, 1.2, 1.4):
        mpc, gait = art_config_for_run(vx)
        gait = dc.replace(gait, contact_clock=True, clock_max_hold=2)
        falls, ft, v_ss, pitch = _serial(mpc, gait, 375, lambda i: vx)
        print(
            f"  clock vx={vx}: falls={falls:.0f}(@{ft}) v_ss={v_ss:.3f} "
            f"pitch={pitch:+.3f}", flush=True,
        )


if __name__ == "__main__":
    groups = sys.argv[1:] or ["cells", "attr", "pitch"]
    if "cells" in groups:
        cells()
    if "attr" in groups:
        print("== attractors (1.2 cmd) ==")
        attr()
    if "pitch" in groups:
        print("== pitch authority (1.2 cmd) ==")
        pitch()
    if "clock" in groups:
        clock()
    if "clock_vss" in groups:
        print("== clock v_ss (serial, last 4 s) ==")
        clock_vss()
