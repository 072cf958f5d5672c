"""Closed-loop rollouts on the ARTICULATED engine (the full stack).

Control hierarchy per MPC period (mpc.dt = 40 ms), mirroring a real
locomotion stack (and the reference's implied architecture — MPC +
"low-level control", ``README.md:2``):

  25 Hz   MPC: references -> SRB linearization -> condensed QP -> ADMM
  200 Hz  low-level: swing-leg PD + Jacobian-transpose torque mapping
          (re-evaluated on the CURRENT articulated state, holding u0)
  2 kHz   physics: Featherstone dynamics + compliant toe/heel contact

All three rates are nested scans inside ONE jitted tick — zero host
round-trips — and the whole thing vmaps over envs exactly like the SRB loop
(parallel/rollout.py)."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import struct

from biped_mpc_py_tpu.config import GaitConfig, MpcConfig
from biped_mpc_py_tpu.control.controller import ControllerState
from biped_mpc_py_tpu.control.gait import (
    advance_gait_clock,
    contact_sequence,
    measured_contact,
)
from biped_mpc_py_tpu.control.lowlevel import low_level_control
from biped_mpc_py_tpu.control.mpc import solve_mpc
from biped_mpc_py_tpu.models.biped import BipedParams
from biped_mpc_py_tpu.models.kinematics import foot_positions_world
from biped_mpc_py_tpu.sim.engine import ArtState, art_step
from biped_mpc_py_tpu.sim.model import ArticulatedModel, hector_model
from biped_mpc_py_tpu.utils.metrics import RolloutMetrics

FALL_Z_MIN = 0.25
FALL_Z_MAX = 0.85


def art_mpc_config(**overrides) -> MpcConfig:
    """MpcConfig tuned for the ARTICULATED closed loop.

    Two deviations from the reference constants (kept verbatim in
    MpcConfig's defaults for parity):

    - ``swing_height = 0.04`` (reference: 0.1, ``bipedalLocomotionMPC.py:
      32``). A 10 cm apex in a 0.2 s swing phase demands foot accelerations
      whose reaction torques destabilize the real articulated robot (the
      reference never ran closed-loop; its SRB abstraction ignores leg mass).
      4 cm walks with zero falls and ~0.015 rad attitude RMS.
    - ``raibert_capture_gain = 0.5``: capture-point velocity-error foot
      placement (config.py); 1.0 (full capture gain) over-steps the real
      legs — 0.5 gives 0.2 m/s velocity walking AND 0.3 m/s push recovery
      with zero falls.
    - ``swing_y_offset = 0.04`` (the reference value; the SRB default is
      0.09): with real leg mass, wide lateral swings destabilize in-place
      stepping (measured: falls at 0.06+ in place, while 0.3 m/s forward
      walking prefers wider) — the narrow reference offset is the
      all-command-robust articulated choice.
    - ``kp_hipyaw/kd_hipyaw = 2.4/0.3``: swing foot-heading wrench PD
      (control/lowlevel.py) — without it foot yaw pins at the hip-yaw
      joint limit and heading is chaotic.
    - ``tau_z_max = 8.0``: per-foot yaw-couple bound (config.tau_z_max).
      The reference's 33.5 N m is physically untransmissible; 8 is the
      measured minimum for robust forward walking on the COMPLIANT
      engine, whose regularized friction transmits more yaw couple than
      stick friction. The MuJoCo oracle runs at the stick-physical 4.0
      (tests/test_mj_contact.py).
    - ``lf_heel_shrink = 0.015`` (round 5, folding the round-4 finding
      into the operating point): the reference's 0.02 heel margin eats
      40% of the 0.05 m heel and is THE binding constraint of backward
      push recovery (the heel line-foot row sits active through every -x
      recovery; DESIGN_NOTES "Backward push recovery is heel-CoP-bound").
      0.015 is the measured optimum: -x 0.3 recovery 1/3 -> 3/3 seeds
      while plain walking is unaffected (0.005-0.01 tip the foot under
      CoP uncertainty).
    - ``swing_td_damp = 8.0`` (round 3): touchdown-retraction damping —
      braking the swing foot's tangential velocity before impact removed
      the MuJoCo chaotic-marginal walking branch (1/4 perturbed seeds
      walked without it; with it + the sin^2 z profile, 10/10 seeds walk
      10 s in-place and at 0.15 m/s — tools/sweep_mj10.py,
      test_mj_contact.py::TestPerturbedRobustness) and is neutral on the
      engine.

    This operating point was selected by TPU-batched stability-region
    sweeps (parallel/sweep.py: gains x commands x initial-state
    perturbations, ~25 s per 90 x 10 s rollouts on one chip): zero falls
    and attitude RMS <= 0.028 across in-place, 0.15 m/s (p=4), 0.3 m/s
    (p=3), each under +-2e-3 rad initial joint perturbations. For
    TURNING commands use :func:`art_config_for_turn` (it picks between
    the unified cross-sim point at <= 0.3 rad/s and the fh0+leak point
    for faster/curved commands — the heading wrench destabilizes the
    latter).
    """
    cfg = dataclasses.replace(
        MpcConfig(), swing_height=0.04, raibert_capture_gain=0.5,
        swing_y_offset=0.04, kp_hipyaw=2.4, kd_hipyaw=0.3, tau_z_max=8.0,
        swing_td_damp=8.0, lf_heel_shrink=0.015,
    )
    return dataclasses.replace(cfg, **overrides)


def art_config_for_speed(speed: float, **overrides):
    """(MpcConfig, GaitConfig) tuned for a commanded forward speed.

    Encapsulates the measured articulated speed envelope (stability-region
    sweeps, parallel/sweep.py; zero falls under +-2e-3 rad initial
    perturbations at every listed point): cadence from
    :func:`~biped_mpc_py_tpu.control.gait.gait_for_speed` (p=5/4/3/2 by
    speed band), capture gain 0.5 throughout. Round 3: the fast band
    (p=2, >= 0.4 m/s) additionally uses the sin^2 swing-z profile
    (zero-velocity touchdown): with the corrected swing frames
    (config.compat_swing_frame_bug) the plain sine's 0.6 m/s touchdown
    impact flips the 0.8 m/s branch, while td-damp + sin^2 walks it
    fall-free (att RMS 0.025) — see the speed battery in
    tools/sweep_validate3.py. Stronger capture gains were measured WORSE
    at speed (0.7 m/s at rg=0.7: falls every perturbation).
    """
    from biped_mpc_py_tpu.control.gait import gait_for_speed

    s = abs(float(speed))
    x_cmd = jnp.zeros(12).at[5].set(0.55).at[9].set(float(speed))
    if s > 0.3:
        overrides.setdefault("swing_z_sin2", True)
    if s >= 0.9:
        # the 1.0 m/s point (round 3, tools/sweep_speed10.py): a higher
        # apex clears the faster swing and the SOFTER capture gain is
        # load-bearing (rg=0.5 falls in every 1.0 cell; 0.3 is zero-fall
        # at 5 perturbations). Realized speed saturates ~0.67 m/s — the
        # Raibert placement's steady-state lag, not instability (cranking
        # the velocity weight tips it over instead of closing the gap).
        overrides.setdefault("swing_height", 0.06)
        overrides.setdefault("raibert_capture_gain", 0.3)
    mpc = art_mpc_config(x_cmd=x_cmd, **overrides)
    return mpc, gait_for_speed(s)


def art_config_for_run(speed: float, stabilized: bool = False, **overrides):
    """(MpcConfig, GaitConfig) for the RUNNING gait (flight_steps=1):
    aerial phases between stances (config.GaitConfig.flight_steps).

    ``stabilized=True`` applies the round-5 stabilizer triple measured on
    top of this base (tools/sweep_alip.py p5-p8): raibert_ff_scale 0.77
    (permanent backward neutral shift — the p5 command-settle batteries
    proved the fast cycle otherwise leans on the deficit-proportional
    capture bias), raibert_pitch_place 0.2 @ nom 0.15 (pitch-spiral
    counter), swing_land_frac 0.7 (on-schedule touchdowns). Measured
    (engine, contact clock, 1.2 command, 32 perturbed seeds, 30 s —
    individual outcomes at running cadence are batch-composition-chaos
    sensitive, so only population statistics are meaningful): zero-fall
    rate **22/32 vs 8/32** un-stabilized, and survivors hold realized
    >= 0.77 through 15 s (12.8 m covered, vs 10.0 base). The
    deterministic post-15 s speed decay remains in every cell
    (DESIGN_NOTES round 5: the slow attractor is an architecture
    equilibrium). Explicit ``overrides`` still win.

    The round-4 measured operating point (tools/sweep_run.py; engine,
    cold start, 10 s, +-2e-3 rad perturbations): p=2 f=1 cycle (0.08 s
    stance / 0.04 s flight), apex 0.08 with the early-landing profile
    (swing_land_frac 0.8 — the swing PD's descent lag otherwise leaves
    the sole ~2-3 cm airborne at the scheduled touchdown, fatal with no
    second foot down), stance width 0.06 (running's 1/3 per-leg stance
    duty halves lateral placement authority — 0.04 roll-diverges), the
    swing tracking velocity feedforward (swing_track_ff=1 — without it
    the foot tracks half a swing late at >= 1.3 m/s commands), and the
    soft 0.85 neutral-point shift. Zero-fall to 1.2 m/s commanded;
    realized speed is attractor-dependent (see DESIGN_NOTES round 4:
    the running transport analysis) — sustained ~0.65, transient
    sprints to ~1.0.
    """
    x_cmd = jnp.zeros(12).at[5].set(0.55).at[9].set(float(speed))
    kw = dict(
        swing_z_sin2=True, swing_height=0.08, raibert_capture_gain=0.3,
        swing_land_frac=0.8, swing_y_offset=0.06, raibert_ff_scale=0.85,
        swing_track_ff=1.0,
    )
    if stabilized:
        kw.update(
            raibert_ff_scale=0.77, raibert_pitch_place=0.2,
            raibert_pitch_nom=0.15, swing_land_frac=0.7,
        )
    kw.update(overrides)
    return (
        art_mpc_config(x_cmd=x_cmd, **kw),
        GaitConfig(steps_per_phase=2, flight_steps=1),
    )


def art_config_for_turn(wz: float, vx: float = 0.0, **overrides):
    """(MpcConfig, GaitConfig) tuned for a commanded turn rate [rad/s],
    optionally while walking forward at ``vx`` [m/s].

    Two operating points by command (see docs/DESIGN_NOTES.md "The
    turning ceiling's ROOT CAUSE" + "MuJoCo turning"):

    - ``|wz| <= 0.3`` turn-in-place: the UNIFIED cross-sim point —
      body-frame mode, foot-heading wrench 3.0/0.4, sin^2 + td-damp,
      p=3 cadence, default yaw leak. The SAME config turns 5/5
      perturbed seeds in BOTH the engine and stick-friction MuJoCo at
      the same realized ~0.28 rad/s (93% tracking;
      test_mj_transfer.py::TestTurningTransfer).
    - faster commands / curved walking: NO foot-heading wrench + yaw
      leak 0.12 (post-frame-fix the wrench destabilizes the engine at
      0.4+), p=3 (p=2 with sin^2 for curves at >= 0.35 m/s).
      Sweep-validated zero-fall to 0.5-0.6 rad/s commanded on the
      engine (realized saturates ~0.3 — the shared transport ceiling,
      tools/sweep_turn3.py, tools/sweep_turn_unify.py).
    """
    from biped_mpc_py_tpu.control.gait import gait_for_speed

    x_cmd = (
        jnp.zeros(12).at[5].set(0.55).at[8].set(float(wz))
        .at[9].set(float(vx))
    )
    if abs(vx) < 0.05 and abs(wz) <= 0.3:
        kw = dict(
            cmd_body_frame=True, kp_hipyaw=3.0, kd_hipyaw=0.4,
            swing_z_sin2=True,
        )
        gait = GaitConfig(steps_per_phase=3)
        kw.update(overrides)
        return art_mpc_config(x_cmd=x_cmd, **kw), gait
    kw = dict(
        cmd_body_frame=True, kp_hipyaw=0.0, kd_hipyaw=0.0,
        cmd_leak_yaw=0.12,
    )
    if abs(vx) >= 0.35:
        kw["swing_z_sin2"] = True
        gait = gait_for_speed(abs(vx))
    else:
        gait = GaitConfig(steps_per_phase=3)
    kw.update(overrides)
    return art_mpc_config(x_cmd=x_cmd, **kw), gait


@struct.dataclass
class ArtWorld:
    sim: ArtState
    ctrl: ControllerState
    metrics: RolloutMetrics


def init_art_world(mpc: MpcConfig, z0: float = 0.533) -> ArtWorld:
    return ArtWorld(
        sim=ArtState.standing(z0=z0),
        ctrl=ControllerState.init(mpc),
        metrics=RolloutMetrics.zeros(),
    )


def art_closed_loop_tick(
    world: ArtWorld,
    mpc: MpcConfig,
    gait: GaitConfig,
    biped: BipedParams,
    model: ArticulatedModel,
    n_lowlevel: int = 8,
    n_substeps: int = 10,
    terrain=None,
    minv_ll_hold: int = 1,
    unroll: int = 1,
    ll_unroll: int = 1,
) -> ArtWorld:
    """One full MPC period on the articulated robot.

    ``minv_ll_hold``: number of consecutive low-level periods that reuse
    one Newton-Schulz mass-matrix inverse (refreshed at the start of each
    group). 1 (default) = refresh every 5 ms period, the MuJoCo-oracle
    setting; 8 = once per 40 ms MPC tick, the bench fast path (fidelity
    bound measured in docs/DESIGN_NOTES.md round 3).

    ``unroll`` / ``ll_unroll``: scan-unroll factors for the physics
    substep chain / the low-level-period chain (numerics-identical;
    trades compile time + code size for fewer scan-iteration boundaries
    on the latency-bound small-op chains — see DESIGN_NOTES round 5)."""
    from biped_mpc_py_tpu.sim.engine import feedback_and_soles, mass_matrix_inv

    sim = world.sim
    # feedback: TRUE whole-body CoM (see sim/engine.py) + actual sole
    # positions from the simulator — the articulated analog of the
    # reference's x_fb / getFootPositionWorld inputs (ONE fused FK pass)
    x_fb, pf_w = feedback_and_soles(model, sim)
    if gait.contact_clock:
        # contact-sensed schedule clock (GaitConfig.contact_clock):
        # gait-local time held for late touchdowns, measured from the
        # simulator's actual sole heights
        down = measured_contact(pf_w, terrain, gait)
        t_g, hold = advance_gait_clock(
            world.ctrl.t_gait, world.ctrl.hold_count, down, mpc, gait
        )
    else:
        t_g, hold = sim.t, world.ctrl.hold_count
    contact = contact_sequence(t_g, mpc, gait)
    foot_yaw = (
        x_fb[2] + sim.q[jnp.array([0, 5])] if mpc.foot_frame_wrench else None
    )
    sol = solve_mpc(
        x_fb, t_g, pf_w, mpc, biped, contact, warm=world.ctrl.qp,
        gait=gait, cmd_ref=world.ctrl.cmd_ref, foot_yaw=foot_yaw,
        terrain=terrain, v_int=world.ctrl.v_int,
        pitch_ref=world.ctrl.pitch_ref,
    )
    u0 = sol.controls[0]

    ll_dt = mpc.dt / n_lowlevel

    assert n_lowlevel % minv_ll_hold == 0, (n_lowlevel, minv_ll_hold)

    def ll_group(carry, _):
        s, e = carry
        # one mass-matrix inverse per GROUP of low-level periods (q moves
        # ~1% per 5 ms period); the MuJoCo closed-loop force oracle bounds
        # the fidelity cost at the default hold=1
        Minv = mass_matrix_inv(model, s.q)

        def ll_step(carry2, _):
            s2, e2 = carry2
            x, pf = feedback_and_soles(model, s2)
            # gait-local low-level clock: wall-clock within-tick offset
            # added onto the (possibly held) MPC gait time; identity
            # when the contact clock is off (t_g IS sim.t there)
            t_ll = s2.t if not gait.contact_clock else t_g + (s2.t - sim.t)
            tau = low_level_control(
                x, t_ll, pf, s2.q, s2.qd, mpc, biped, contact, u0,
                gait=gait, cmd_ref=world.ctrl.cmd_ref, terrain=terrain,
                v_int=world.ctrl.v_int,
            )
            # positive mechanical joint work this period (metrics.energy)
            e2 = e2 + jnp.sum(jnp.maximum(tau * s2.qd, 0.0)) * ll_dt
            return (art_step(
                model, s2, tau, ll_dt, n_substeps, terrain, Minv=Minv,
                unroll=unroll,
            ), e2), None

        carry, _ = jax.lax.scan(
            ll_step, (s, e), None, length=minv_ll_hold, unroll=ll_unroll
        )
        return carry, None

    (sim_new, energy), _ = jax.lax.scan(
        ll_group, (sim, jnp.zeros((), sim.q.dtype)), None,
        length=n_lowlevel // minv_ll_hold,
    )

    z = sim_new.pos[2]
    fell = jnp.logical_or(z < FALL_Z_MIN, z > FALL_Z_MAX)
    reset = ArtState.standing(dtype=sim.q.dtype)
    reset = dataclasses.replace(reset, t=sim_new.t)
    sim_next = jax.tree.map(lambda r, s: jnp.where(fell, r, s), reset, sim_new)
    from biped_mpc_py_tpu.control.controller import (
        advance_cmd_ref, advance_pitch_ref, advance_v_int,
    )

    ref_next = advance_cmd_ref(world.ctrl.cmd_ref, x_fb, mpc)
    vi_next = advance_v_int(world.ctrl.v_int, x_fb, mpc)
    pr_next = advance_pitch_ref(world.ctrl.pitch_ref, x_fb, mpc)
    ctrl_reset = ControllerState.init(mpc, dtype=sim.q.dtype)
    ctrl_next = jax.tree.map(
        lambda r, s: jnp.where(fell, r, s), ctrl_reset,
        ControllerState(
            qp=sol, cmd_ref=ref_next, v_int=vi_next,
            t_gait=jnp.asarray(t_g, sim.q.dtype), hold_count=hold,
            pitch_ref=pr_next,
        ),
    )
    metrics = world.metrics.update(
        sim_new.torso_state(), mpc.x_cmd, u0, sol.res_prim,
        fell.astype(z.dtype), energy=energy,
    )
    return ArtWorld(sim=sim_next, ctrl=ctrl_next, metrics=metrics)


def art_rollout_fn(
    n_steps: int,
    mpc: MpcConfig,
    gait: GaitConfig,
    model: ArticulatedModel | None = None,
    n_lowlevel: int = 8,
    n_substeps: int = 10,
    terrain=None,
    minv_ll_hold: int = 1,
    unroll: int = 1,
    ll_unroll: int = 1,
):
    """jit-able ``(world, biped) -> world`` articulated rollout closure.

    ``terrain``: optional :class:`~biped_mpc_py_tpu.sim.contact.Terrain`
    (height-field rough ground, BASELINE config 4); None = flat plane."""
    model = model or hector_model()

    def fn(world: ArtWorld, biped: BipedParams) -> ArtWorld:
        def step(w, _):
            return (
                art_closed_loop_tick(
                    w, mpc, gait, biped, model, n_lowlevel, n_substeps,
                    terrain, minv_ll_hold, unroll, ll_unroll,
                ),
                None,
            )

        return jax.lax.scan(step, world, None, length=n_steps)[0]

    return fn


def batched_art_rollout_fn(
    n_steps: int,
    mpc: MpcConfig,
    gait: GaitConfig,
    model: ArticulatedModel | None = None,
    **kw,
):
    return jax.vmap(art_rollout_fn(n_steps, mpc, gait, model, **kw))


def _art_control_stage(world: ArtWorld, biped: BipedParams, mpc, gait, model):
    """Per-env MPC stage of a kernel-path tick (shared by the substep- and
    tick-kernel rollouts): feedback -> gait clock -> solve_mpc."""
    from biped_mpc_py_tpu.sim.engine import feedback_and_soles

    sim = world.sim
    x_fb, pf_w = feedback_and_soles(model, sim)
    if gait.contact_clock:
        down = measured_contact(pf_w, None, gait)
        t_g, hold = advance_gait_clock(
            world.ctrl.t_gait, world.ctrl.hold_count, down, mpc, gait
        )
    else:
        t_g, hold = sim.t, world.ctrl.hold_count
    contact = contact_sequence(t_g, mpc, gait)
    foot_yaw = (
        x_fb[2] + sim.q[jnp.array([0, 5])]
        if mpc.foot_frame_wrench else None
    )
    sol = solve_mpc(
        x_fb, t_g, pf_w, mpc, biped, contact, warm=world.ctrl.qp,
        gait=gait, cmd_ref=world.ctrl.cmd_ref, foot_yaw=foot_yaw,
        v_int=world.ctrl.v_int, pitch_ref=world.ctrl.pitch_ref,
    )
    return x_fb, t_g, hold, contact, sol


def _art_post_stage(world: ArtWorld, sim_new, energy, x_fb, sol, t_g, hold,
                    mpc):
    """Per-env fall-reset + controller-state advance + metrics (shared by
    the kernel-path rollouts)."""
    from biped_mpc_py_tpu.control.controller import (
        advance_cmd_ref, advance_pitch_ref, advance_v_int,
    )

    z = sim_new.pos[2]
    fell = jnp.logical_or(z < FALL_Z_MIN, z > FALL_Z_MAX)
    reset = ArtState.standing(dtype=world.sim.q.dtype)
    reset = dataclasses.replace(reset, t=sim_new.t)
    sim_next = jax.tree.map(
        lambda r, s: jnp.where(fell, r, s), reset, sim_new
    )
    ref_next = advance_cmd_ref(world.ctrl.cmd_ref, x_fb, mpc)
    vi_next = advance_v_int(world.ctrl.v_int, x_fb, mpc)
    pr_next = advance_pitch_ref(world.ctrl.pitch_ref, x_fb, mpc)
    ctrl_reset = ControllerState.init(mpc, dtype=world.sim.q.dtype)
    ctrl_next = jax.tree.map(
        lambda r, s: jnp.where(fell, r, s), ctrl_reset,
        ControllerState(
            qp=sol, cmd_ref=ref_next, v_int=vi_next,
            t_gait=jnp.asarray(t_g, world.sim.q.dtype),
            hold_count=hold, pitch_ref=pr_next,
        ),
    )
    metrics = world.metrics.update(
        sim_new.torso_state(), mpc.x_cmd, sol.controls[0],
        sol.res_prim, fell.astype(z.dtype), energy=energy,
    )
    return ArtWorld(sim=sim_next, ctrl=ctrl_next, metrics=metrics)


def batched_art_rollout_kernel_fn(
    n_steps: int,
    mpc: MpcConfig,
    gait: GaitConfig,
    model: ArticulatedModel | None = None,
    n_lowlevel: int = 8,
    n_substeps: int = 5,
    minv_ll_hold: int = 8,
):
    """Batched articulated rollout with the PHYSICS ON THE FUSED PALLAS
    KERNEL (ops/pallas/substep_kernel.py): ``(worlds, bipeds) -> worlds``.

    Same semantics as ``batched_art_rollout_fn`` on FLAT ground with an
    env-constant model; the per-low-level-period substep chain runs as
    ONE kernel launch per period instead of ~50 fused XLA kernels
    (measured 8.4x on the chain: 27.0 -> 3.2 ms / 1024 envs on v5e).
    Batch must fill whole 1024-env blocks (the kernel's env tile).
    Numerical parity with the XLA path is f32-roundoff
    (tests/test_substep_kernel.py); closed-loop equivalence is pinned by
    the same walking-statistics protocol as the bench budget.
    """
    from biped_mpc_py_tpu.ops.pallas.substep_kernel import fused_substeps
    from biped_mpc_py_tpu.sim.engine import (
        feedback_and_soles,
        mass_matrix_inv,
    )

    model = model or hector_model()
    assert n_lowlevel % minv_ll_hold == 0, (n_lowlevel, minv_ll_hold)
    ll_dt = mpc.dt / n_lowlevel

    def control_stage(world: ArtWorld, biped: BipedParams):
        return _art_control_stage(world, biped, mpc, gait, model)

    def lowlevel_stage(sim, t_g, t0, contact, u0, world, biped):
        x, pf = feedback_and_soles(model, sim)
        t_ll = sim.t if not gait.contact_clock else t_g + (sim.t - t0)
        return low_level_control(
            x, t_ll, pf, sim.q, sim.qd, mpc, biped, contact, u0,
            gait=gait, cmd_ref=world.ctrl.cmd_ref,
            v_int=world.ctrl.v_int,
        )

    def post_stage(world, sim_new, energy, x_fb, sol, t_g, hold):
        return _art_post_stage(
            world, sim_new, energy, x_fb, sol, t_g, hold, mpc
        )

    def tick(worlds: ArtWorld, bipeds: BipedParams) -> ArtWorld:
        x_fb, t_g, hold, contact, sol = jax.vmap(
            control_stage
        )(worlds, bipeds)
        u0 = sol.controls[:, 0]
        sim = worlds.sim
        t0 = sim.t
        energy = jnp.zeros_like(sim.pos[:, 0])
        for _ in range(n_lowlevel // minv_ll_hold):
            Minv = jax.vmap(lambda q: mass_matrix_inv(model, q))(sim.q)
            for _ in range(minv_ll_hold):
                tau = jax.vmap(
                    lambda s, tg, tz, c, u, w, b: lowlevel_stage(
                        s, tg, tz, c, u, w, b
                    ),
                    in_axes=(0, 0, 0, 0, 0, 0, 0),
                )(sim, t_g, t0, contact, u0, worlds, bipeds)
                energy = energy + jnp.sum(
                    jnp.maximum(tau * sim.qd, 0.0), axis=1
                ) * ll_dt
                sim = fused_substeps(
                    model, sim, tau, Minv, ll_dt, n_substeps
                )
        return jax.vmap(post_stage)(
            worlds, sim, energy, x_fb, sol, t_g, hold
        )

    def fn(worlds: ArtWorld, bipeds: BipedParams) -> ArtWorld:
        def step(w, _):
            return tick(w, bipeds), None

        return jax.lax.scan(step, worlds, None, length=n_steps)[0]

    return fn


def batched_art_rollout_tick_kernel_fn(
    n_steps: int,
    mpc: MpcConfig,
    gait: GaitConfig,
    model: ArticulatedModel | None = None,
    biped: BipedParams | None = None,
    n_lowlevel: int = 8,
    n_substeps: int = 5,
):
    """Batched articulated rollout with the WHOLE low-level+physics
    hierarchy on the fused TICK kernel (ops/pallas/tick_kernel.py):
    ``(worlds, bipeds) -> worlds``.

    One kernel launch per 40 ms tick covers the 8 low-level periods
    (in-kernel FK feedback + swing PD + Jacobian-transpose torque
    mapping) AND their 5 physics substeps each; only the MPC layer
    (references -> SRB -> condensed ADMM) and the per-tick Newton-Schulz
    mass-matrix inverse stay on XLA. Replaces ~60 XLA launches per tick
    with one.

    Constraints (a superset of the substep-kernel path's): flat ground,
    env-constant model AND biped AND MpcConfig (gains/geometry fold into
    the kernel's instruction stream at factory time — the ``bipeds``
    batch is still used by the MPC stage, but the in-kernel low-level
    uses the factory ``biped``'s leg geometry), walking gaits
    (flight_steps == 0), whole 1024-env blocks, Minv held across the
    tick (minv_ll_hold == n_lowlevel semantics, the bench default).
    Parity at f32+atan-poly roundoff is pinned by
    tests/test_tick_kernel.py.
    """
    from biped_mpc_py_tpu.ops.pallas.tick_kernel import make_fused_tick
    from biped_mpc_py_tpu.sim.engine import mass_matrix_inv

    model = model or hector_model()
    biped_const = biped or BipedParams()
    tick_fn = make_fused_tick(
        model, biped_const, mpc, gait, n_lowlevel, n_substeps
    )

    def tick(worlds: ArtWorld, bipeds: BipedParams) -> ArtWorld:
        x_fb, t_g, hold, contact, sol = jax.vmap(
            lambda w, b: _art_control_stage(w, b, mpc, gait, model)
        )(worlds, bipeds)
        sim = worlds.sim
        u0 = sol.controls[:, 0]
        c0 = contact[:, 0, 0:2]
        t0 = sim.t if not gait.contact_clock else t_g
        Minv = jax.vmap(lambda q: mass_matrix_inv(model, q))(sim.q)
        sim_new, energy = tick_fn(
            sim, u0, c0, t0, worlds.ctrl.cmd_ref[:, 2],
            worlds.ctrl.v_int, Minv,
        )
        return jax.vmap(
            lambda w, s, e, x, so, tg, h: _art_post_stage(
                w, s, e, x, so, tg, h, mpc
            )
        )(worlds, sim_new, energy, x_fb, sol, t_g, hold)

    def fn(worlds: ArtWorld, bipeds: BipedParams) -> ArtWorld:
        def step(w, _):
            return tick(w, bipeds), None

        return jax.lax.scan(step, worlds, None, length=n_steps)[0]

    return fn


def batched_art_rollout_terrain_fn(
    n_steps: int,
    mpc: MpcConfig,
    gait: GaitConfig,
    model: ArticulatedModel | None = None,
    n_lowlevel: int = 8,
    n_substeps: int = 10,
    minv_ll_hold: int = 1,
    unroll: int = 1,
    ll_unroll: int = 1,
):
    """Batched articulated rollout with PER-ENV terrain:
    ``(world, biped, terrain) -> world`` where terrain is a batched
    :class:`~biped_mpc_py_tpu.sim.contact.Terrain`
    (``Terrain.rough_batch``) — BASELINE config 4/5 combined: randomized
    robots on randomized rough ground."""
    model = model or hector_model()

    def one(world: ArtWorld, biped: BipedParams, terrain) -> ArtWorld:
        def step(w, _):
            return (
                art_closed_loop_tick(
                    w, mpc, gait, biped, model, n_lowlevel, n_substeps,
                    terrain, minv_ll_hold, unroll, ll_unroll,
                ),
                None,
            )

        return jax.lax.scan(step, world, None, length=n_steps)[0]

    return jax.vmap(one)
