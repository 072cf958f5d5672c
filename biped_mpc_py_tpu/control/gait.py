"""Gait scheduling (L3/C3): contact sequence over the MPC horizon.

The reference slides a 10-step window over a hard-coded 20-row walking table
with a Python slice (``bipedalLocomotionMPC.py:50-59``) — not jit-able. The
table is exactly periodic with period ``2*steps_per_phase``, so here the
window is computed in closed form from modular arithmetic on a traced time
``t``: branch-free, vmap-able over batched ``t``.
"""

from __future__ import annotations

import jax.numpy as jnp

from biped_mpc_py_tpu.config import GaitConfig, MpcConfig


def phase_index(t, mpc: MpcConfig) -> jnp.ndarray:
    """Absolute MPC step index ``phase = floor(t / dt)`` (reference ``:56``)."""
    return jnp.floor(jnp.asarray(t) / mpc.dt).astype(jnp.int32)


def phase_time(mpc: MpcConfig, gait: GaitConfig | None) -> float:
    """Single-stance phase duration [s]: ``steps_per_phase * dt``.

    ``gait=None`` falls back to the reference's hard-coded relation
    p = h/2 (``bipedalLocomotionMPC.py:436``: swing clock ``dt*h/2``) so
    legacy call sites keep reference behavior; all framework loops pass
    their GaitConfig so cadence is a single knob.
    """
    p = gait.steps_per_phase if gait is not None else mpc.h // 2
    return p * mpc.dt


def gait_for_speed(speed: float, gait_mode: int = 1) -> GaitConfig:
    """Cadence scaled to the commanded speed (static choice, made at config
    time — cadence sets trace shapes via the contact window, so it is a
    Python-level decision, not a traced one).

    Measured on the articulated stack (perturbed 250-tick closed loops,
    zero-fall boundary; stability-region sweeps in parallel/sweep.py): the
    reference cadence p=5 (0.2 s phases) is robust only to ~0.1 m/s; p=4
    covers 0.15 m/s; p=3 (0.12 s phases) walks 0.3 m/s; p=2 (0.08 s
    phases) walks 0.4-0.8 m/s with attitude RMS <= 0.022 — the fast
    cadence shortens the single-stance inverted-pendulum divergence window,
    strictly better tracking at every tested speed, at the cost of higher
    swing-leg accelerations. 1.0 m/s is outside the zero-fall envelope at
    every swept cell (current ceiling between 0.8 and 1.0).
    """
    speed = abs(float(speed))
    if speed <= 0.1:
        p = 5
    elif speed <= 0.2:
        p = 4
    elif speed <= 0.3:
        p = 3
    else:
        p = 2
    return GaitConfig(steps_per_phase=p, gait_mode=gait_mode)


def contact_sequence(t, mpc: MpcConfig, gait: GaitConfig) -> jnp.ndarray:
    """Contact flags over the horizon -> (h, 2) in {0., 1.}.

    Walking (gait_mode=1, flight_steps=0): left foot in stance iff
    ``(step mod 2p) < p`` with ``p = steps_per_phase``; right is the
    complement. With p=5, h=10 this reproduces the reference table
    (``bipedalLocomotionMPC.py:52-58``) for every start step k — the 20-row
    table is two periods of this rule.

    Running (flight_steps=f > 0, round 4): the cycle gains f aerial steps
    after each stance — period 2(p+f), left stance on [0, p), right on
    [p+f, 2p+f), NEITHER foot down on the two flight windows. f=0 reduces
    exactly to walking (right window = left's complement).

    Standing (gait_mode=0): both feet in stance (reference ``:483-484``).
    """
    p = gait.steps_per_phase
    f = gait.flight_steps
    # Absolute step, NOT wrapped at mpc.h: the cycle modulus below is the
    # only periodicity, so any steps_per_phase keeps p-step stance phases
    # aligned with absolute time (a `% h` here breaks every cadence with
    # period != h).
    k = phase_index(t, mpc)
    steps = k + jnp.arange(mpc.h, dtype=jnp.int32)
    s = steps % (2 * (p + f))
    left = (s < p).astype(jnp.float32)
    right = ((s >= p + f) & (s < 2 * p + f)).astype(jnp.float32)
    walking = jnp.stack([left, right], axis=-1)
    standing = jnp.ones((mpc.h, 2), jnp.float32)
    return jnp.where(jnp.asarray(gait.gait_mode) == 1, walking, standing)


def measured_contact(pf_w, terrain, gait: GaitConfig) -> jnp.ndarray:
    """Per-foot ground-contact flags (2,) bool from measured sole heights.

    ``pf_w``: flat (6,) world sole positions [left(3), right(3)] (the
    controller feedback layout, sim/engine.py::feedback_and_soles).
    Terrain-relative when a height field is active. A sole within
    ``gait.clock_z_tol`` of the local ground counts as in contact — the
    same geometric signal is available from the JAX engine, MuJoCo, and
    (on hardware) any foot switch / proprioceptive contact estimate.
    """
    pz = jnp.stack([pf_w[2], pf_w[5]])
    if terrain is not None:
        pz = pz - jnp.stack(
            [terrain.height(pf_w[0], pf_w[1]),
             terrain.height(pf_w[3], pf_w[4])]
        )
    return pz < gait.clock_z_tol


# Fractional-step bias of the contact-sensed clock (see
# advance_gait_clock): the clock stores the exact f32 PRODUCT
# (k + 1/16) * dt, never an accumulated sum. floor((k*dt)/dt) == k fails
# for ~7.5% of integers in f32 (measured; e.g. k=15 with dt=0.04), so an
# unbiased product would make phase_index land on k-1 and the hold logic
# and realized schedule disagree at boundaries; the 1/16 bias gives every
# downstream floor a ~0.44-step margin on both sides (robust to k ~2.6e5
# steps — hours of sim time) at the cost of a uniform +dt/16 shift of the
# gait-local swing clocks (1.6% of a p=2 f=1 swing; absorbed into the
# operating point).
_CLOCK_STEP_BIAS = 1.0 / 16.0


def advance_gait_clock(t_gait, hold_count, down, mpc: MpcConfig,
                       gait: GaitConfig):
    """One-tick update of the contact-sensed gait clock -> (t_used,
    hold_next).

    ``t_gait`` is the gait-local time USED last tick; the return value
    ``t_used`` is the time to use THIS tick (so a touchdown sensed in
    ``down`` takes effect immediately). The clock advances by one MPC
    step per tick EXCEPT when the next step would cross into a stance
    window (left stance starts at cycle step 0, right at p+f —
    :func:`contact_sequence`) whose foot has no measured contact: then it
    holds at the last pre-stance step, up to ``gait.clock_max_hold``
    consecutive ticks, and the whole schedule re-anchors to the real
    touchdown. While held, the swinging foot's clock sits just short of
    touchdown (target on the ground, still descending via the swing PD),
    and the MPC keeps modeling the current flight/stance step.

    Standing (gait_mode=0) never holds. Returned times are exact biased
    products ``(k + 1/16) * dt`` (see ``_CLOCK_STEP_BIAS``), so
    :func:`phase_index` on them recovers exactly ``k`` — the hold
    decision and the realized schedule cannot disagree at a float floor
    boundary, and the clock never drifts (no accumulation).
    """
    dtype = jnp.asarray(t_gait).dtype
    # recover the integer step from the stored biased product (init
    # seeds the un-biased -dt: floor(-1 + 0.4375) = -1 still works)
    k = jnp.floor(
        jnp.asarray(t_gait) / mpc.dt + (0.5 - _CLOCK_STEP_BIAS)
    ).astype(jnp.int32)
    p, f = gait.steps_per_phase, gait.flight_steps
    s_next = (k + 1) % (2 * (p + f))
    entering_l = s_next == 0
    entering_r = s_next == (p + f)
    wait = (entering_l & ~down[0]) | (entering_r & ~down[1])
    wait = (
        wait
        & (hold_count < gait.clock_max_hold)
        & (jnp.asarray(gait.gait_mode) == 1)
    )
    k_used = jnp.where(wait, k, k + 1)
    t_used = (
        (k_used.astype(dtype) + jnp.asarray(_CLOCK_STEP_BIAS, dtype))
        * mpc.dt
    )
    hold_next = jnp.where(wait, hold_count + 1, jnp.zeros_like(hold_count))
    return t_used, hold_next


def advance_gait_clock_host(t_gait, hold_count, down, mpc: MpcConfig,
                            gait: GaitConfig):
    """Host-side mirror of :func:`advance_gait_clock` (plain Python
    floats/ints, no tracing) for the synchronous validation/deployment
    loops — the MuJoCo co-sim driver (sim/mj_driver.py, contact from
    real normal forces) and the real-time loop (runtime/realtime.py,
    contact from plant sole heights). Same hold rule and biased-product
    step semantics (``_CLOCK_STEP_BIAS``); ``down`` is any 2-sequence
    of per-foot contact booleans."""
    import math

    dt = float(mpc.dt)
    k = int(math.floor(t_gait / dt + (0.5 - _CLOCK_STEP_BIAS)))
    p, f = gait.steps_per_phase, gait.flight_steps
    s_next = (k + 1) % (2 * (p + f))
    wait = (
        ((s_next == 0 and not bool(down[0]))
         or (s_next == p + f and not bool(down[1])))
        and hold_count < gait.clock_max_hold
        and int(gait.gait_mode) == 1
    )
    k_used = k if wait else k + 1
    return (
        (k_used + _CLOCK_STEP_BIAS) * dt,
        hold_count + 1 if wait else 0,
    )


def swing_clock(t, mpc: MpcConfig, gait: GaitConfig | None, side, dtype):
    """Per-leg swing clock -> (phase fraction in [0, 1], swing duration T_sw).

    Walking (flight_steps=0): the legacy SHARED clock — at any instant
    exactly one leg swings and its swing began at a phase boundary, so
    ``(t mod t_p) / t_p`` is the swing fraction of whichever leg is
    airborne (reference ``bipedalLocomotionMPC.py:436``). Kept verbatim so
    f=0 is bit-identical to the round-3 behavior.

    Running (flight_steps=f > 0): a leg's swing spans its own liftoff,
    flight, the OTHER stance, and the second flight — p+2f steps — and the
    two legs' swings start at different cycle points (left at step p,
    right at 2p+f of the 2(p+f) cycle), so the clock is per-leg. During
    the leg's own stance the fraction clips at 1 (callers gate all swing
    quantities by the contact flag, so the value there is unused).

    ``side``: +1 = left (leg 0), -1 = right (leg 1) — the same convention
    as control/lowlevel.py and swing_target_xy.
    """
    p = gait.steps_per_phase if gait is not None else mpc.h // 2
    f = gait.flight_steps if gait is not None else 0
    if f == 0:
        t_p = phase_time(mpc, gait)
        u = jnp.remainder(jnp.asarray(t, dtype), t_p)
        return u / t_p, t_p
    period = (2 * (p + f)) * mpc.dt
    T_sw = (p + 2 * f) * mpc.dt
    start = jnp.where(
        jnp.asarray(side, dtype) > 0, p * mpc.dt, (2 * p + f) * mpc.dt
    )
    u = jnp.remainder(jnp.asarray(t, dtype) - start, period)
    return jnp.clip(u / T_sw, 0.0, 1.0), T_sw
