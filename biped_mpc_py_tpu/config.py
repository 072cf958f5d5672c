"""Configuration pytrees (L0).

The reference hard-codes every constant inside ``MPC.__init__``
(``bipedalLocomotionMPC.py:22-32``) and module globals (``:13-18``). Here the
same quantities are frozen dataclass *pytrees* so that

- they can be passed through ``jax.jit`` without retracing (static structure,
  dynamic leaves), and
- they can be **batched**: a domain-randomized population of robots/controllers
  is simply a vmapped ``MpcConfig``/``BipedParams`` whose leaves carry a
  leading batch axis.

State convention (13,): ``[roll, pitch, yaw, px, py, pz, wx, wy, wz, vx, vy,
vz, 1]`` with angular/linear velocity in the world frame and the constant 1 as
the gravity-augmentation state (reference ``bipedalLocomotionMPC.py:8-10``).

NOTE on Euler conventions: the reference uses TWO contradictory conventions in
one file — ``eul2rotm`` reads the state as [roll, pitch, yaw]
(``bipedalLocomotionMPC.py:124``) while ``get_simplified_dynamics`` reads
[yaw, pitch, roll] (``:151-153``). Both build the same matrix
``Rz(yaw)@Ry(pitch)@Rx(roll)``. This framework canonicalizes on
**state[0:3] = [roll, pitch, yaw]** everywhere; the two references agree at
zero attitude (the reference's only exercised configuration).

Control input (12,): ``[f_left(3), f_right(3), m_left(3), m_right(3)]``
(reference ``bipedalLocomotionMPC.py:10``).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class MpcConfig:
    """MPC horizon/weight/gain configuration.

    Mirrors reference ``class MPC`` (``bipedalLocomotionMPC.py:22-32``).
    ``h`` and ``n_admm_iters`` are static (pytree_node=False) so they fix
    trace-time shapes; everything else is a dynamic leaf and vmap-able.
    """

    # horizon length (static: determines QP shapes)
    h: int = struct.field(pytree_node=False, default=10)
    # MPC timestep [s]
    dt: float = 0.04
    # commanded state [roll,pitch,yaw, px,py,pz, wx,wy,wz, vx,vy,vz]
    x_cmd: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.array(
            [0, 0, 0, 0, 0, 0.55, 0, 0, 0, 0, 0, 0], dtype=jnp.float32
        )
    )
    # state tracking weights (13,)
    Q: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.array(
            [500, 100, 100, 300, 300, 700, 1, 1, 1, 1, 1, 1, 1],
            dtype=jnp.float32,
        )
    )
    # control effort weights (12,)
    R: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.full((12,), 1e-4, dtype=jnp.float32)
    )
    # Raibert foot-placement feedback gain
    kv: float = 0.01
    # swing-leg cartesian PD gains (isotropic; reference uses 500*I3 / 10*I3)
    kp_swing: float = 500.0
    kd_swing: float = 10.0
    # swing apex height [m]
    swing_height: float = 0.1
    # Swing z-profile: False (default) = the reference's half-sine
    # (``bipedalLocomotionMPC.py:436-437``; touchdown speed
    # swing_height*pi/T); True = sin^2 — same apex, zero-velocity liftoff
    # AND touchdown (control/swing.py::swing_phase_z).
    swing_z_sin2: bool = struct.field(pytree_node=False, default=False)
    # Touchdown-retraction damping [N·s/m]: extra horizontal damping on the
    # swing foot, ramped in over the last 40% of the phase, braking the
    # foot's tangential velocity before impact (suppresses the
    # stick-friction drag impulse at touchdown). 0 = reference behavior.
    swing_td_damp: float = 0.0
    # Swing TRACKING velocity feedforward (round 4; no reference analog).
    # The reference's swing PD damps ABSOLUTE foot velocity
    # (``kd·(0 − v_f)``, ``bipedalLocomotionMPC.py:439``) — i.e. it drags
    # against any foot motion, including motion along the trajectory. At
    # walking speeds that reads as damping; at running swing speeds
    # (foot ~2 m/s world) it IS the tracking lag: measured at a 1.3 m/s
    # run command the sole reaches its apex half a swing late and is
    # still airborne at the scheduled touchdown (the round-4 missed-
    # touchdown fall mode). swing_track_ff in [0, 1] blends the damping
    # set-point from zero to the TARGET velocity (Raibert xy target
    # moves with the body -> v_des_xy = v_com; z profile has a closed-
    # form derivative): ``kd·(ff·v_des − v_f)``. 0 (default) = the
    # reference map, bit-identical.
    swing_track_ff: float = 0.0
    # Fraction of the swing window by which the z-profile completes its
    # descent (RUNNING gaits only — consumed solely on the
    # flight_steps > 0 path of control/swing.py::swing_phase_z). The
    # swing PD tracks the descending profile with a kd_swing*v lag of
    # ~2-3 cm, so a profile that reaches 0 exactly at the scheduled
    # touchdown leaves the sole airborne when stance starts — fatal when
    # no other foot is planted (measured: the round-4 running-gait trip
    # mode). < 1 finishes the descent early and holds z=0 for the
    # remainder, giving the PD time to close the gap. 1.0 = the walking
    # profile's timing.
    swing_land_frac: float = 1.0
    # Swing foot-heading PD gains (control/lowlevel.py: world-z moment
    # wrench on the swing foot through the angular Jacobian). The 3-dof
    # Cartesian swing task leaves foot yaw uncontrolled; without this it
    # drifts to the articulated robot's hip-yaw joint limit within ~0.5 s
    # of walking and every touchdown fights the limit penalty. 0 (default)
    # = the reference's exact torque map (C13 parity); art_mpc_config
    # enables it.
    kp_hipyaw: float = 0.0
    kd_hipyaw: float = 0.0
    # Foot-heading channel clips (control/lowlevel.py): the hip-yaw
    # posture TARGET clip [rad] and the resulting swing-foot yaw-wrench
    # torque clip [N m]. Both bound the wrench's torso REACTION — on a
    # body with I_z = 0.0711 kg m² a 3 N m reaction slews yaw ~1.7 rad/s
    # per MPC period, so these are the dominant knobs of the
    # turning-stability loop (sweepable: dynamic leaves).
    hipyaw_target_clip: float = 0.6
    tau_yaw_clip: float = 3.0
    # FLIGHT-phase reaction-wheel yaw damping [N m s/rad] (round 5; no
    # reference analog — the reference has no aerial phase at all,
    # ``bipedalLocomotionMPC.py:52-58``). During running flight NEITHER
    # foot can react a yaw moment, and at running stance duty (~2 ticks
    # of single-point support) stick friction transmits almost none — the
    # measured MuJoCo yaw spin-out (DESIGN_NOTES round 4). The only
    # remaining actuation channel is internal momentum exchange: torque
    # BOTH hip-yaw motors against the torso's yaw-rate error while
    # airborne (tau0 += kd*(wz - wz_cmd), clipped at tau_yaw_clip), using
    # the legs as reaction wheels — the Raibert-hopper flight-attitude
    # trick. The feet's heading excursion is re-collected by the
    # foot-heading wrench before touchdown. Applied only when BOTH
    # contact flags are 0; walking gaits never see it. 0 (default) = off.
    flight_yaw_kd: float = 0.0
    # Touchdown foot-heading PRE-ROTATION against the measured yaw rate
    # [s] (round 5): the swing hip-yaw target becomes
    # clip(dyaw - lead*wz_err). A body spinning at +wz plants its foot
    # rotated -lead*wz from the command, so the stance stick-lock brakes
    # the rotation (skater's turned-foot plant) instead of ratcheting the
    # heading — the measured MuJoCo running spin-out mode. 0 = round-4
    # behavior.
    hipyaw_rate_lead: float = 0.0
    # Stance-pivot heading drive (control/lowlevel.py, round 3): a direct
    # hip-yaw joint torque on the STANCE leg rotating the body about the
    # planted foot at the commanded heading — the physical turning
    # mechanism (a human pivots on the planted foot). The round-2 design
    # routed ALL turning authority through the QP's yaw moment m_z, whose
    # reaction BACKDRIVES the unservoed stance hip-yaw: the hips ratchet
    # to the -0.8 rad joint limit within seconds of any >=0.2 rad/s turn
    # and the heading loop goes chaotic (measured in BOTH engines —
    # instrumented traces in docs/DESIGN_NOTES.md). Since foot yaw =
    # body yaw + q0, the pivot torque is stateless:
    #   tau0_stance = -kp_pivot*clip(dyaw) - kd_pivot*(qd0 + wz_cmd)
    # (negative: advancing body yaw about the planted foot DECREASES q0).
    # 0 (default) = reference-parity torque map.
    kp_pivot: float = 0.0
    kd_pivot: float = 0.0
    # Foot-frame wrench constraints (static): rotate each foot's QP moment
    # box and line-foot rollover rows into the foot's MEASURED heading
    # frame (ops/qp.py::condense). The reference's body-aligned rows give
    # the QP phantom cross-line moment authority whenever the hip-yaw
    # angle is nonzero (turning) — the planted line foot cannot react a
    # moment about its cross axis, and commanding one rolls the robot.
    # False (default) = reference parity; the articulated ticks enable it
    # by passing measured foot headings when this flag is set.
    foot_frame_wrench: bool = struct.field(pytree_node=False, default=False)
    # Per-foot YAW moment bound override [N m] (None = biped.tau_max[2],
    # the reference's 33.5, ``bipedalLocomotionMPC.py:48``). The reference
    # bound is physically untransmissible: a ~14 cm line foot at mu=0.5
    # under ~60 N supports a friction COUPLE of only a few N m, so a QP
    # allowed 33.5 plans yaw moments the ground cannot react. The
    # compliant engine leaks the excess through yaw micro-slip (masking
    # the defect); MuJoCo's stick friction transmits it and the measured
    # closed loop spins and falls within 2.5 s. art_mpc_config sets 4.0
    # (= mu * mg * half-foot-length, rounded); SRB/parity paths keep the
    # reference bound. Future refinement: a load-dependent torsional cone
    # row |m_z| <= mu_z * f_z like the friction pyramid.
    tau_z_max: float | None = struct.field(pytree_node=False, default=None)
    # Torsional friction coefficient [m] for the load-dependent yaw-couple
    # cone rows ``|m_z| <= mu_z * f_z`` (ops/qp.py::torsional_rows) — the
    # physically-correct replacement for the constant tau_z_max clamp: the
    # transmissible couple is load-proportional, so a lightly-loaded foot
    # (touchdown/liftoff) gets a proportionally small bound and the QP
    # plans yaw authority it can actually react. The stick-physical value
    # for the HECTOR line foot is ~mu*(lt+lh)/2 = 0.035; None (default) =
    # rows disabled (reference semantics — the 33.5 N m box alone).
    mu_z: float | None = struct.field(pytree_node=False, default=None)
    # Touchdown OVERDRIVE [m] (round 4): lower the swing z-target below
    # the (sampled) ground by this much over the last 40% of the swing —
    # the same quadratic ramp as swing_td_damp. Motivation (measured,
    # tools/sweep_mj_terrain2.py diag): on 4 cm fields the foot's actual
    # landing xy differs from the target the height was sampled at, so
    # the true local ground can be LOWER and the sole hangs airborne
    # through scheduled stance ticks (zero stance force -> attitude
    # cascade -> hfield wedge spike -> fall). Overdriving guarantees
    # contact engagement at the scheduled time; the penalty/stick
    # contact simply supplies the (small) extra normal force. 0 =
    # round-3 behavior. An OPERATING-POINT knob, not a default: 0.02
    # lifts the 4 cm MuJoCo battery 3/4 -> 4/4 but regresses 3 cm
    # 4/4 -> 2/4 (harder touchdowns cost where misses are rare) — see
    # DESIGN_NOTES "MuJoCo 4 cm terrain gap" for the full candidate
    # battery, incl. the measured-negative relief-scaled and
    # foothold-shift variants that were removed.
    swing_td_overdrive: float = 0.0
    # Line-foot rollover lever-arm margins [m] (ops/qp.py::
    # line_foot_rows): effective toe/heel levers are lt - lf_toe_shrink /
    # lh - lf_heel_shrink. Defaults = the reference's (0.01, 0.02)
    # (``bipedalLocomotionMPC.py:254-255``). The reference heel margin
    # eats 40% of the 0.05 m heel — measured (round 4,
    # tools/sweep_mj_push3.py) as THE binding constraint of backward push
    # recovery: the stance foot's heel row sits ACTIVE every tick of a
    # backward recovery, capping the nose-up CoP authority at
    # 0.03·f_z N·m while the toe keeps 0.08·f_z (the +x 0.4 / -x 0.25
    # envelope asymmetry). A smaller heel margin (e.g. 0.01 -> 0.04
    # lever) is still inside the physical support polygon.
    lf_toe_shrink: float = 0.01
    lf_heel_shrink: float = 0.02
    # Yaw-axis leak rate of the body-frame command anchor
    # (controller.advance_cmd_ref); x/y keep CMD_REF_LEAK. A slower yaw
    # leak holds heading error longer (more integral authority against the
    # articulated stack's noisy yaw transmission) at the cost of windup
    # when yaw authority saturates.
    cmd_leak_yaw: float = 0.05
    # lateral swing-target stance-width offset [m]. The reference hard-codes
    # 0.04 (``bipedalLocomotionMPC.py:427``; replicated under
    # compat_swing_yaw_bug); the corrected default 0.09 lands stepping feet
    # at the nominal standing width. Measured (10 s in-place walk): attitude
    # RMS 0.042 at 0.04 vs 0.005 at 0.09, and walk->stand transitions at an
    # arbitrary stop phase tip over at 0.04 (the capture point leaves the
    # narrow support polygon) but settle cleanly from 0.06 up.
    swing_y_offset: float = 0.09
    # Raibert placement velocity coefficient. 0.0 (default) = the
    # reference's formula ``v * lookahead/2`` (``bipedalLocomotionMPC.py:
    # 73-89``), whose effective gain (~0.1 s) is well short of the
    # capture-point gain sqrt(z/g) (~0.24 s at z=0.55) — measured to cap
    # push recovery at ~0.3 m/s. > 0 = use ``v * capture_gain *
    # sqrt(z_cmd/g)`` (1.0 = exact capture point; shoves to 0.5 m/s are
    # absorbed with zero falls).
    raibert_capture_gain: float = 0.0
    # Angular-momentum-aware (ALIP-style) foot placement [m per rad/s]
    # (round 5; no reference analog — the reference places on CoM velocity
    # only, ``bipedalLocomotionMPC.py:72-89``). The pendulum quantity that
    # is CONTINUOUS through a touchdown impact is the angular momentum
    # about the new contact point, L_c = L_com + m r x v, not the CoM
    # velocity — so the ALIP placement law uses the momentum-equivalent
    # velocity v_eff = L_c/(m z) in place of v:
    #   vx_eff = vx + raibert_am_y * wy,  vy_eff = vy - raibert_am_x * wx
    # with the physical coefficient I/(m z_cmd) (HECTOR: Iyy/(12*0.55) =
    # 0.143, Ixx -> 0.141). v_eff replaces v in BOTH the feedforward and
    # the capture-error terms of _raibert_xy. Against the running slow
    # attractor (DESIGN_NOTES round 4: braking impulses at forward-of-CoM
    # footholds pump nose-down angular momentum, and nose-down geometry
    # brakes more): placing against the measured pitch momentum catches
    # the rotation at touchdown instead of feeding the spiral. 0 (default)
    # = the reference's velocity-only placement, bit-identical.
    raibert_am_y: float = 0.0
    raibert_am_x: float = 0.0
    # LEAKY pitch reference (round 5): per-tick leak rate of the MPC's
    # pitch target toward the MEASURED pitch (carried in
    # ControllerState.pitch_ref, advanced like the cmd_ref anchor). The
    # running decay trace (tools/diag_run_decay.py) shows the fast hop
    # cycle rides a self-selected nose-up attitude (~+0.12) that the
    # fixed pitch target 0 grinds away at ~0.02 rad/s — the decay
    # spiral's driver. A leaked target keeps FULL stiffness against
    # tick-scale pitch oscillation (the transient stabilizer a free
    # pitch axis lacks — Q_pitch 5-20 falls immediately, round-5 screen)
    # while giving ZERO DC stiffness: the MPC damps pitch about
    # whatever attitude the gait settles into instead of fighting it.
    # 0 (default) = the reference's fixed x_cmd[1] target.
    pitch_ref_leak: float = 0.0
    # Shove-state-scheduled capture gain [1 per m/s] (round 5): the
    # effective capture coefficient becomes
    #   (raibert_capture_gain + capture_sched * |v_xy - v_cmd_xy|) (cap 1)
    # so large velocity errors (a push, a recovery overshoot) get
    # near-capture-point placement while steady walking keeps the tuned
    # soft gain. Motivation: the round-4 backward-push limit at -x 0.35
    # is a recovery-overshoot limit CYCLE (recover -> overshoot forward
    # -> rebound grows, DESIGN_NOTES "Backward push recovery") — the
    # proportional placement under-corrects exactly when the error is
    # largest. 0 (default) = fixed gain.
    capture_sched: float = 0.0
    # Pitch-ANGLE placement feedback [m/rad] (round 5): shift the Raibert
    # x-target by raibert_pitch_place * (pitch - raibert_pitch_nom). The
    # round-5 decay trace (tools/diag_run_decay.py) shows the running
    # slow-decay's driver directly: the fast hop cycle rides pitch ~+0.12
    # with the foot landing UNDER the CoM (lever ~0); the MPC's pitch
    # regulation drags pitch down ~0.02 rad/s, and as pitch falls the
    # realized foothold ends up +4-5 cm AHEAD of the CoM (braking) — vx
    # tracks pitch one-for-one down into the slow attractor. The pitch
    # RATE stays ~0.05 rad/s throughout, which is why rate-based (ALIP)
    # placement cannot see the spiral. This term closes it in angle:
    # pitch below its hop-natural value moves the foothold BACK, removing
    # the braking lever. 0 (default) = reference behavior.
    raibert_pitch_place: float = 0.0
    raibert_pitch_nom: float = 0.0
    # Late-swing foot-target RETRACTION [m] (round 5; no reference
    # analog): ramp the swing xy target backward along the body-frame
    # +x direction by up to this distance over the last 40% of the swing
    # (the td-damp/overdrive ramp). Two effects, both touchdown-braking
    # levers: the foot's world velocity at touchdown gains a backward
    # component (smaller stick-friction drag impulse — swing-leg
    # retraction in the Raibert/SLIP sense), and a LATE touchdown lands
    # the foot CLOSER to the CoM (the extra hold ticks retract it
    # further), directly shrinking the braking lever arm that drives the
    # running decay spiral. 0 (default) = reference behavior.
    swing_retract: float = 0.0
    # Scale on the Raibert feedforward term ``v * lookahead/2``
    # (control/reference.py::_raibert_xy). 1.0 (default) = the
    # reference's neutral-point placement. < 1 lands the feet BEHIND the
    # neutral point, converting part of each stance into net push — a
    # probe knob for the fast-band realized-speed ceiling (the bounded
    # velocity-reference integrator saturates with NO speed gain there,
    # so the binding constraint is placement geometry, not MPC force
    # authority — tools/sweep_vint.py).
    raibert_ff_scale: float = 1.0
    # Command-frame semantics (static: selects the reference-generation
    # trace). False (default) = the reference's WORLD-frame ``x_cmd``
    # (``bipedalLocomotionMPC.py:26``): velocity commands are fixed world
    # vectors, so a yaw-rate command makes the body crab rather than turn.
    # True = body/heading-frame velocity commands: x_cmd[9:11] is the
    # velocity in the HEADING frame and x_cmd[8] the turn rate; the CoM
    # reference integrates the commanded arc in closed form and the Raibert
    # foot placement rotates with the heading — walking turns track the
    # commanded rate (BASELINE config 3: turning and lateral stepping).
    cmd_body_frame: bool = struct.field(pytree_node=False, default=False)
    # Velocity-command integral action (round 3; no reference analog).
    # World-frame velocity commands re-anchor the position reference at
    # the MEASURED pose every tick (reference ``:61-70`` semantics kept
    # by com_reference), so the loop has zero position stiffness and the
    # realized speed settles at command - drag/velocity-gain (measured:
    # 0.59 realized at a 0.8 m/s command, 0.48 at 1.0 — the gap grows
    # with touchdown losses). cmd_v_int_gain > 0 adds a bounded per-tick
    # integrator on the xy velocity error that BOOSTS the velocity
    # reference (controller.advance_v_int -> com_reference); clipped at
    # +-cmd_v_int_max [m/s] for anti-windup (blocked/shoved robots stop
    # accumulating). Applied only on axes with a nonzero command; 0
    # (default) = reference behavior. Foot placement keeps using the RAW
    # command (the Raibert error term already self-consistently pushes
    # while v < cmd).
    cmd_v_int_gain: float = 0.0
    cmd_v_int_max: float = 0.4
    # Where the v_int accumulator acts (round 4). cmd_v_int_ref_scale
    # scales the MPC velocity-reference boost (1 = the round-3 behavior
    # above; 0 = accumulate only). raibert_vint shifts the Raibert foot
    # placement by -raibert_vint * v_int [m per m/s of integral]: when
    # persistently slower than command the foothold moves BEHIND the
    # neutral point (propulsive), the integral-action form of the
    # capture term's proportional error feedback — the Raibert hopper's
    # own speed controller. Motivation (measured, running gait): the
    # fast hop cycle decays through a pitch-velocity spiral whose
    # equilibrium is a steady-state velocity error that proportional
    # placement feedback cannot remove, while boosting the MPC
    # reference instead (ref_scale 1) destabilizes pitch
    # (DESIGN_NOTES round 4, "Running gait"). Defaults preserve
    # round-3 behavior exactly.
    cmd_v_int_ref_scale: float = 1.0
    raibert_vint: float = 0.0
    # --- solver settings (no reference analog; cvxopt defaults there) ---
    # number of ADMM iterations (static: unrolled/scanned at trace time)
    n_admm_iters: int = struct.field(pytree_node=False, default=60)
    # initial ADMM penalty on the Ruiz-equilibrated problem
    admm_rho: float = 0.3
    # number of rho-adaptation phases (static: one refactorization each)
    admm_rho_phases: int = struct.field(pytree_node=False, default=3)
    # OSQP-style active-set polish after the fixed iterations (static flag)
    admm_polish: bool = struct.field(pytree_node=False, default=True)
    admm_sigma: float = 1e-6
    # over-relaxation parameter
    admm_alpha: float = 1.6
    # Newton-Schulz iterations for the per-phase KKT inverse (static:
    # unrolled). 14 reaches the f32 floor on the MPC KKT (ops/qp.py
    # ns_inverse); the MXU-batched NS replaces XLA's slow batched Cholesky.
    kinv_ns_iters: int = struct.field(pytree_node=False, default=14)
    # Of those, run the FIRST kinv_bf16_iters Newton-Schulz steps with
    # bfloat16 operands (f32 accumulation): the climb phase of NS is
    # self-correcting, so bf16 rounding there is free while each bf16
    # matmul costs 1 MXU pass instead of the 6 that full-f32 ("highest")
    # costs (ops/qp.py::ns_inverse). 0 = all-f32 (default; parity/golden
    # tests). The remaining kinv_ns_iters - kinv_bf16_iters steps run in
    # f32 and restore the floor.
    kinv_bf16_iters: int = struct.field(pytree_node=False, default=0)
    # Apply the precomputed KKT inverse with bfloat16 operands inside the
    # ADMM iteration scan (f32 accumulation). The loop is HBM-bound on
    # re-reading Kinv each iteration; the bf16 copy halves that traffic.
    # 4e-3 operand rounding is ~15x below the measured closed-loop
    # degradation threshold (see ops/qp.py::solve_qp). Default off
    # (parity/golden tests); on in fast_mpc_config.
    admm_bf16_matvec: bool = struct.field(pytree_node=False, default=False)
    # Run the Ruiz norm reductions with bfloat16 operands (ops/qp.py::
    # ruiz_equilibrate): scalings steer ADMM convergence rate only (the
    # fixed point is unscaled) so the 4e-3 norm rounding is behaviorally
    # free, but it shifts the scalings 0.2-0.7% and, at a fixed iteration
    # count, perturbs returned iterates slightly. Default off
    # (parity/golden tests bit-stable); on in fast_mpc_config.
    ruiz_bf16_norms: bool = struct.field(pytree_node=False, default=False)
    # Ruiz equilibration iterations (static: fixed-count scan). Scalings
    # steer ADMM convergence rate only — the fixed point is unscaled — so
    # fewer iterations trade a slightly worse-equilibrated problem for less
    # per-tick work. 10 = OSQP-like default.
    ruiz_iters: int = struct.field(pytree_node=False, default=10)
    # --- compat flags (documented deviations from the reference) ---
    # reference ``:87`` computes foot_des_y_2 from x_fb[10] where the pattern
    # implies x_fb[4] (SURVEY.md C5). False = corrected behavior (default);
    # True = replicate the reference defect bit-for-bit.
    compat_foot_ref_bug: bool = struct.field(pytree_node=False, default=False)
    # reference ``:46`` sets f_min = [0,0,0] and applies it per-component
    # (``:245-246``), so horizontal forces can never be negative — the stance
    # foot cannot brake, which destabilizes closed-loop walking (the friction
    # pyramid alone correctly allows |f_xy| <= mu f_z). False (default) =
    # corrected: only f_z is bounded below by 0, horizontal components are
    # left to the friction cone. True = replicate the reference bit-for-bit.
    compat_force_box_bug: bool = struct.field(pytree_node=False, default=False)
    # reference ``:62-63`` targets x_ref column k at decision state X_k,
    # which its own dynamics places k+1 steps ahead, and pins column 0 to
    # the current feedback state — telling the QP to hold the current
    # velocity and dragging every maneuver (~50% velocity tracking, yaw
    # stall). False (default) = corrected one-step-shifted targets; True =
    # replicate the reference bit-for-bit.
    compat_ref_col0_bug: bool = struct.field(pytree_node=False, default=False)
    # Reference ``:461,468``: the leg Jacobians are BODY-frame operators
    # (functions of joint angles only), so world foot velocity is
    # ``R @ (Jf qd)`` and a WORLD swing force maps to joint torques via
    # ``Jfᵀ Rᵀ F`` — but the reference computes ``vf = R.T @ Jf @ qd``
    # (rotated by -2·yaw) and ``tau += Jfᵀ F`` (force applied rotated by
    # +yaw). Both coincide with the correct map at zero attitude, the only
    # configuration the reference ever runs — its stance path does the
    # SAME mapping correctly (``tau = Jmᵀ[Rᵀf; Rᵀm]``, ``:465``). The
    # defect is yaw-PROPORTIONAL: at 0.5 rad heading the swing-leg PD
    # pushes the foot ~30 deg off its intended direction, which measured
    # as the articulated turning ceiling (every yaw-actuation channel fell
    # at 0.2 rad/s until this fix; docs/DESIGN_NOTES.md round 3). False
    # (default) = corrected frames; True = replicate the reference.
    compat_swing_frame_bug: bool = struct.field(pytree_node=False, default=False)
    # reference ``:434`` adds the swing stance-width offset in WORLD y,
    # which collapses the stance width at yaw != 0 (turning). False
    # (default) = rotate the offset into the heading frame; True =
    # replicate the reference literally.
    compat_swing_yaw_bug: bool = struct.field(pytree_node=False, default=False)

    @property
    def nx(self) -> int:
        return 13

    @property
    def nu(self) -> int:
        return 12


@struct.dataclass
class GaitConfig:
    """Walking-gait schedule configuration.

    The reference hard-codes a 20-entry two-contact pattern with 5-step stance
    phases (``bipedalLocomotionMPC.py:50-59``). Here the pattern is derived
    from ``steps_per_phase`` so other cadences are expressible; the default
    reproduces the reference exactly.

    gait_mode: 1 = walking, 0 = standing (reference ``:18, 481-484``).
    """

    # MPC steps per single-stance phase (reference: 5)
    steps_per_phase: int = struct.field(pytree_node=False, default=5)
    # 1 = walking (alternating single stance), 0 = standing (double stance)
    gait_mode: int = 1
    # AERIAL steps between stances (round 4; no reference analog — the
    # reference's table, ``:52-58``, always has exactly one foot down).
    # flight_steps = f > 0 turns walking into RUNNING: the cycle becomes
    # [left stance p][flight f][right stance p][flight f] (period
    # 2(p+f) MPC steps); during flight both contact flags are 0, the QP
    # pins both wrenches to zero and the SRB model is ballistic — the
    # MPC loads the stance steps in its horizon to refill the vertical
    # momentum (the standard convex-MPC running formulation). Each leg's
    # swing then lasts p+2f steps and starts at a leg-specific cycle
    # point, so the swing clock is per-leg (control/gait.py::swing_clock).
    # 0 (default) = walking, bit-identical to the round-3 behavior.
    flight_steps: int = struct.field(pytree_node=False, default=0)
    # CONTACT-SENSED gait clock (round 4; no reference analog — the
    # reference's scheduler is a fixed wall-clock table, ``:50-59``).
    # When True, the schedule/swing clocks run on a gait-local time
    # carried in ControllerState (t_gait) that HOLDS at the last step
    # before a stance window whose foot has no measured ground contact
    # (sole height, control/gait.py::measured_contact), so a late
    # touchdown SHIFTS the stance window instead of consuming it. This
    # is the touchdown-triggered schedule re-anchoring the round-4
    # running transport analysis called for (DESIGN_NOTES "Where flight
    # breaks"): with the fixed clock, running touchdowns land ~1 MPC
    # step late and the effective support duty halves. False (default)
    # = the reference's fixed-clock semantics, bit-identical traces.
    contact_clock: bool = struct.field(pytree_node=False, default=False)
    # max CONSECUTIVE held ticks per stance entry (bounds the wait so a
    # foot that never lands — trip, fall — cannot freeze the gait)
    clock_max_hold: int = struct.field(pytree_node=False, default=3)
    # sole-height-above-ground threshold [m] that counts as contact for
    # the clock (terrain-relative when a Terrain is active)
    clock_z_tol: float = 0.012


def default_mpc_config(**overrides) -> MpcConfig:
    return dataclasses.replace(MpcConfig(), **overrides)


def fast_mpc_config(**overrides) -> MpcConfig:
    """The benched solver budget: 40 ADMM iterations / 1 rho phase,
    NO polish.

    Re-derived after the stance-width correction (swing_y_offset 0.09):
    the budget fragility that originally demanded 2-3 rho phases was the
    narrow reference stance, not the solver — at the corrected stance even
    40/1 matches the default 60/3/polish budget's closed-loop statistics
    (attitude RMS 0.0122 vs 0.0114 at a 0.3 m/s walk) and passes the full
    robustness battery (0.5 rad/s circles, 3-step cadence at 0.3 m/s,
    0.5 m/s push recovery, walk<->stand transitions). One rho phase = ONE
    Newton-Schulz KKT inversion per tick — the dominant tick cost (stage
    timings in docs/DESIGN_NOTES.md) — at 10 NS steps, the first 8 with
    bf16 operands (residual ~6e-3: well inside the behavioral band — the
    all-f32 NS(10) floor is 1.6e-4 and degradation only starts at the
    NS(8)-equivalent ~6e-2), and the Kinv matvec inside the iteration scan
    in bf16 (halves the loop's HBM traffic). Equivalence is pinned by
    tests/test_rollout.py::test_bench_budget_accuracy; cold-start
    golden-tick parity tests use the default (polished, all-f32) budget.
    """
    return dataclasses.replace(
        MpcConfig(), n_admm_iters=40, admm_rho_phases=1, admm_polish=False,
        kinv_ns_iters=10, kinv_bf16_iters=8, admm_bf16_matvec=True,
        ruiz_bf16_norms=True,
        **overrides
    )


def reference_compat_config(**overrides) -> MpcConfig:
    """MpcConfig replicating the reference bit-for-bit: every documented
    defect flag enabled (see docs/DESIGN_NOTES.md for the defect table).
    Use together with ``BipedParams(leg=HECTOR_LEG_FK, leg_jac=
    HECTOR_LEG_JAC)`` for full behavioral parity."""
    cfg = dataclasses.replace(
        MpcConfig(),
        compat_foot_ref_bug=True,
        compat_force_box_bug=True,
        compat_ref_col0_bug=True,
        compat_swing_yaw_bug=True,
        compat_swing_frame_bug=True,
    )
    return dataclasses.replace(cfg, **overrides)
