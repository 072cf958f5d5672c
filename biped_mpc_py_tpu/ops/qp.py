"""MPC QP assembly + on-device solver (L4/C8, C9) — TPU-first design.

The reference assembles a sparse 250-variable QP (stacked states AND controls,
130 equality + 360 inequality rows, ``bipedalLocomotionMPC.py:187-286``) and
ships it to cvxopt's dense interior-point solver in C (``:297``) — ~150-400 ms
per tick (BASELINE.md). That design is wrong for TPU: interior-point methods
branch on line searches, and sparse triangular solves starve the MXU.

This module does it the TPU way:

1. **Lossless condensation** (:func:`condense`). Every reference inequality
   touches only the controls (the state columns of A_mu/A_f/A_LF are all
   zero, ``:231,237,267``), and the equalities are exactly the dynamics — so
   eliminating the states via ``X = Sx·x0 + Su·U`` is an *exact* reformulation:
   a 120-variable strictly-convex dense QP whose 240 (280 with the
   torsional cone, see :func:`m_step`) constraint rows are
   block-diagonal per horizon step. Small dense matrices are what the MXU
   eats.

2. **Box/two-sided rows**. The reference encodes box bounds as 24 one-sided
   rows per step (``:234-251``); we use 12 two-sided rows ``l_k <= u_k <=
   u_k`` (OSQP form), halving the constraint block: per step
   ``A_step (m_step,12) = [friction(8); I12; line-foot(4); torsional(4 —
   only when mpc.mu_z is set)]``, identical across steps — only the
   bounds vary with contact. (The torsional-cone rows are a framework
   extension over the reference — see :func:`torsional_rows`.)

3. **ADMM (BoxOSQP-style) solve** (:func:`solve_qp`). The KKT matrix
   ``K = P + sigma·I + rho·blkdiag(A_stepᵀA_step)`` is inverted ONCE per tick
   (Cholesky, 120×120); each of the fixed ``n_admm_iters`` iterations is then
   two small matmuls + a clip — no branches, no data-dependent control flow,
   so the whole solve jits, vmaps over thousands of envs, and runs as batched
   MXU einsums (SURVEY.md §2 parallelism axis 3).

Warm starting across ticks is free: pass the previous :class:`QpSolution`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from biped_mpc_py_tpu.config import MpcConfig
from biped_mpc_py_tpu.models.biped import BipedParams
from biped_mpc_py_tpu.ops.rotations import eul2rotm

_BIG = 1e20  # stand-in for +inf in one-sided rows (f32-safe)


@struct.dataclass
class CondensedQp:
    """A condensed MPC QP instance (one env; vmap for a batch)."""

    P: jnp.ndarray  # (120,120) cost Hessian (strictly PD)
    q: jnp.ndarray  # (120,)
    A_step: jnp.ndarray  # (m_step,12) per-step constraint rows
    l: jnp.ndarray  # (h,m_step) lower bounds
    u: jnp.ndarray  # (h,m_step) upper bounds
    Sx: jnp.ndarray  # (h,13,13) free response maps
    Su: jnp.ndarray  # (h,13,12h) forced response map
    x0: jnp.ndarray  # (13,) initial augmented state


@struct.dataclass
class QpSolution:
    """ADMM iterates + recovered trajectories (doubles as warm-start state)."""

    controls: jnp.ndarray  # (h,12)
    states: jnp.ndarray  # (h,13)
    z: jnp.ndarray  # (h,m_step) constraint-space iterate
    y: jnp.ndarray  # (h,m_step) dual iterate
    res_prim: jnp.ndarray  # scalar, ||A u - z||_inf
    res_dual: jnp.ndarray  # scalar, ||P u + q + A^T y||_inf


def friction_rows(mu) -> jnp.ndarray:
    """Friction-pyramid rows (8,12): ±f_{x,y} - mu·f_z <= 0 per foot.

    Parity: reference ``A_mu1`` (``bipedalLocomotionMPC.py:220-229``).
    """
    mu = jnp.asarray(mu, jnp.float32)
    F = jnp.zeros((8, 12), jnp.float32)
    for foot in range(2):
        o = 3 * foot
        F = F.at[4 * foot + 0, o + 0].set(1.0)
        F = F.at[4 * foot + 1, o + 1].set(1.0)
        F = F.at[4 * foot + 2, o + 0].set(-1.0)
        F = F.at[4 * foot + 3, o + 1].set(-1.0)
        F = F.at[4 * foot : 4 * foot + 4, o + 2].set(-mu)
    return F


# Constraint rows per horizon step are CONFIG-DEPENDENT — use m_step(mpc)
# (friction 8 + box 12 + line-foot 4, + torsional cone 4 iff mpc.mu_z).
# There is deliberately no module-level row-count constant: a fixed 28
# would silently mis-size buffers for the 24-row (mu_z=0) problem.


def m_step(mpc: MpcConfig) -> int:
    """Constraint rows per horizon step for this config (STATIC — mu_z is
    a non-pytree field, so this is a trace-time Python branch): 24
    reference-semantics rows, +4 torsional-cone rows when ``mpc.mu_z``
    is set. Disabled configs build the smaller problem outright rather
    than carrying all-zero/free rows: the fused kernel pads rows to a
    lane multiple of 128, so 24x10 = 240 fits the 256 pad while
    28x10 = 280 forces 384 (+50% row work, measured ~4% single-env
    latency — 0.389 -> 0.403 ms/tick)."""
    return 28 if mpc.mu_z is not None else 24


def torsional_rows(mpc: MpcConfig) -> jnp.ndarray:
    """Load-dependent torsional friction cone rows (4,12):
    ``±m_z - mu_z·f_z <= 0`` per foot.

    The reference bounds the yaw moment with a CONSTANT box (33.5 N·m,
    ``bipedalLocomotionMPC.py:48``) that a ~14 cm line foot at mu=0.5 can
    only transmit under ~10x its weight in normal load; the physically
    transmissible yaw couple is load-proportional, ``|m_z| <= mu_z·f_z``
    with ``mu_z ~ mu·(lt+lh)/2`` [m] (each contact point of the toe/heel
    pair supplies tangential friction mu·f_z_i at its lever arm). Planning
    with the cone instead of a constant clamp means a lightly-loaded foot
    (touchdown/liftoff) is never commanded a couple it cannot react — the
    QP shifts yaw authority to foot placement instead.

    Only called when ``mpc.mu_z`` is set: disabled configs build the
    24-row problem without these rows at all (see :func:`m_step` —
    all-zero/free rows would be numerically identical but cost kernel
    padding; the equivalence is pinned by
    test_qp.py::test_torsional_cone_disabled_is_bit_identical).
    """
    Z = jnp.zeros((4, 12), jnp.float32)
    mz = jnp.asarray(mpc.mu_z, jnp.float32)
    # u layout: [f_L(0:3), f_R(3:6), m_L(6:9), m_R(9:12)]
    for foot, (fz, mzc) in enumerate(((2, 8), (5, 11))):
        Z = Z.at[2 * foot + 0, mzc].set(1.0)
        Z = Z.at[2 * foot + 1, mzc].set(-1.0)
        Z = Z.at[2 * foot : 2 * foot + 2, fz].set(-mz)
    return Z


def _rz(psi):
    """3x3 z-rotation for a traced heading angle."""
    c, s = jnp.cos(psi), jnp.sin(psi)
    z = jnp.zeros_like(c)
    o = jnp.ones_like(c)
    return jnp.stack([
        jnp.stack([c, -s, z]), jnp.stack([s, c, z]), jnp.stack([z, z, o])
    ])


def line_foot_rows(
    biped: BipedParams, R: jnp.ndarray, foot_yaw: jnp.ndarray | None = None,
    shrink: tuple | None = None,
) -> jnp.ndarray:
    """Line-foot (toe/heel rollover) rows (4,12).

    Parity: reference ``A_LF1`` (``bipedalLocomotionMPC.py:253-263``): with
    shrunk lever arms lt' = lt-0.01, lh' = lh-0.02, body-frame y-moment vs
    z-force through the current attitude R:
      -lh'·(e3ᵀRᵀ)·f + (e2ᵀRᵀ)·m <= 0   (heel)
      -lt'·(e3ᵀRᵀ)·f - (e2ᵀRᵀ)·m <= 0   (toe)      for each foot.

    ``foot_yaw`` (2,): ABSOLUTE per-foot headings (body yaw + hip-yaw
    angle). The reference implicitly assumes every foot is body-aligned —
    false whenever the robot turns (the hip-yaw joint rotates the foot's
    toe-heel line relative to the body), which hands the QP rollover rows
    about the WRONG axis. With foot_yaw the rows use each planted foot's
    own frame ``Rz(psi_i - yaw) @ R`` (round 5): the extra hip-yaw
    z-rotation composed ON the measured attitude, so the rows keep the
    body's roll/pitch tilt — on a slope a planted foot conforms to the
    surface the body tilt tracks, and the round-3 pure-Rz(psi) form
    mis-oriented the rollover axes there (the documented flat-ground
    caveat, now removed). Reduces exactly to Rz(psi) when R is a pure
    z-rotation and to the body-aligned R at zero hip-yaw.
    None = reference behavior (body-aligned full R).

    ``shrink``: (toe, heel) lever-arm margins [m]; None = the reference's
    (0.01, 0.02). See MpcConfig.lf_toe_shrink/lf_heel_shrink — the
    reference heel margin eats 40% of the 0.05 m heel, the measured
    binding constraint of backward push recovery (round 4).
    """
    toe_s, heel_s = (0.01, 0.02) if shrink is None else shrink
    lt = biped.lt - toe_s
    lh = biped.lh - heel_s
    if foot_yaw is None:
        a_l = a_r = R[:, 2]  # ([0,0,1] @ Rᵀ)_j = R[j,2]: third column
        b_l = b_r = R[:, 1]  # ([0,1,0] @ Rᵀ)_j = R[j,1]: second column
    else:
        from biped_mpc_py_tpu.ops.linalg3 import mm3

        # heading from the foot, tilt from the body: Rz(psi-yaw) @ R
        yaw = jnp.arctan2(R[1, 0], R[0, 0])
        Rl = mm3(_rz(foot_yaw[0] - yaw), R)
        Rr = mm3(_rz(foot_yaw[1] - yaw), R)
        a_l, a_r = Rl[:, 2], Rr[:, 2]
        b_l, b_r = Rl[:, 1], Rr[:, 1]
    z3 = jnp.zeros(3, R.dtype)
    rows = jnp.stack(
        [
            jnp.concatenate([-lh * a_l, z3, b_l, z3]),
            jnp.concatenate([-lt * a_l, z3, -b_l, z3]),
            jnp.concatenate([z3, -lh * a_r, z3, b_r]),
            jnp.concatenate([z3, -lt * a_r, z3, -b_r]),
        ]
    )
    return rows


def constraint_bounds(mpc: MpcConfig, biped: BipedParams, contact: jnp.ndarray):
    """Per-step bounds (l, u), each (h, m_step(mpc)), contact-gated.

    Rows 0:8 friction (one-sided <= 0), 8:20 box on u (two-sided, reference
    ``:239-250``), 20:24 line-foot (one-sided <= 0), 24:28 torsional cone
    (one-sided <= 0; present only when mpc.mu_z is set — see
    :func:`torsional_rows` / :func:`m_step`). Swing feet get [0, 0] boxes
    (f_min = 0, tau scaled to 0), pinning their wrench to zero exactly as
    the reference's gated bounds do.

    Force lower bound: corrected semantics bound only f_z below (horizontal
    components are governed by the friction pyramid); set
    ``mpc.compat_force_box_bug=True`` for the reference's per-component
    f_min = 0 (see config.py for why that defect breaks walking).
    """
    h = contact.shape[0]
    c = contact  # (h,2)
    if mpc.compat_force_box_bug:
        f_lo = jnp.broadcast_to(biped.f_min, (3,))
    else:
        f_lo = jnp.stack([-biped.f_max[0], -biped.f_max[1], biped.f_min[2]])
    tau_hi = biped.tau_max
    if mpc.tau_z_max is not None:
        # physically-transmissible yaw-couple bound (see config.tau_z_max)
        tau_hi = tau_hi.at[2].set(
            jnp.minimum(tau_hi[2], jnp.asarray(mpc.tau_z_max, tau_hi.dtype))
        )
    ub_box = jnp.concatenate(
        [
            c[:, 0:1] * biped.f_max[None, :],
            c[:, 1:2] * biped.f_max[None, :],
            c[:, 0:1] * tau_hi[None, :],
            c[:, 1:2] * tau_hi[None, :],
        ],
        axis=1,
    )  # (h,12)
    lb_box = jnp.concatenate(
        [
            c[:, 0:1] * f_lo[None, :],
            c[:, 1:2] * f_lo[None, :],
            c[:, 0:1] * (-tau_hi[None, :]),
            c[:, 1:2] * (-tau_hi[None, :]),
        ],
        axis=1,
    )
    ones = jnp.ones((h, 8), ub_box.dtype)
    l_parts = [-_BIG * ones, lb_box, -_BIG * ones[:, :4]]
    u_parts = [0.0 * ones, ub_box, 0.0 * ones[:, :4]]
    if mpc.mu_z is not None:
        # torsional-cone rows (one-sided <= 0); omitted entirely when
        # mu_z is None — the 24-row reference problem (see m_step)
        l_parts.append(-_BIG * ones[:, :4])
        u_parts.append(0.0 * ones[:, :4])
    return jnp.concatenate(l_parts, axis=1), jnp.concatenate(u_parts, axis=1)


def condense(
    mpc: MpcConfig,
    biped: BipedParams,
    x_fb: jnp.ndarray,
    x_ref: jnp.ndarray,
    A: jnp.ndarray,
    B: jnp.ndarray,
    contact: jnp.ndarray,
    foot_yaw: jnp.ndarray | None = None,
) -> CondensedQp:
    """Build the condensed QP from the horizon linearization.

    Dynamics convention (reference ``:203-216``): X_0 = A_0·x0 + B_0·u_0 and
    X_k = A_k·X_{k-1} + B_k·u_k, so ``Sx[k] = A_k···A_0`` and
    ``Su[k, :, 12j:12j+12] = A_k···A_{j+1}·B_j`` (j <= k). Cost tracks
    ``x_ref[:, k]`` at X_k with weights diag(Q), plus diag(R) on u (reference
    ``:277-286``; the factor 2 cancels in the minimizer).

    Args:
      x_fb: (12,) feedback state (augmented internally).
      x_ref: (13,h) state reference.
      A: (h,13,13), B: (h,13,12) from :func:`linearize_horizon`.
    """
    h, nx, nu = mpc.h, 13, 12
    dtype = A.dtype
    x0 = jnp.concatenate([x_fb[:12], jnp.ones((1,), dtype)])

    # Prediction maps with HALVED sequential depth. Each step is the affine
    # operator x -> A_k x + S_k U (S_k = B_k at block-column k); composing
    # two steps is (A_y A_x, A_y S_x + S_y). The dispatch count of the
    # sequential chain — not its FLOPs — dominates this stage on TPU
    # (small padded matmuls), so we pre-compose adjacent step PAIRS in one
    # parallel batched matmul, run the h/2-step chain, and recover the even
    # (mid-pair) rows with one more parallel combine.
    # (A full log-depth lax.associative_scan was measured SLOWER: its
    # up/down sweeps re-materialize the whole (h,13,12h) tensor per round.)
    S0 = (
        jnp.zeros((h, nx, h, nu), dtype)
        .at[jnp.arange(h), :, jnp.arange(h)]
        .set(B)
        .reshape(h, nx, nu * h)
    )
    if h % 2 == 0:
        A_ev, A_od = A[0::2], A[1::2]  # (h/2,13,13)
        A2 = A_od @ A_ev
        S2 = A_od @ S0[0::2] + S0[1::2]  # (h/2,13,12h)
        sx_p, su_p = jnp.eye(nx, dtype=dtype), jnp.zeros((nx, nu * h), dtype)
        sx_odd, su_odd = [], []
        for k in range(h // 2):
            sx_p = A2[k] @ sx_p
            su_p = A2[k] @ su_p + S2[k]
            sx_odd.append(sx_p)
            su_odd.append(su_p)
        sx_odd = jnp.stack(sx_odd)  # prefixes at steps 1,3,...,h-1
        su_odd = jnp.stack(su_odd)
        # even rows: prefix[2k] = step(2k) ∘ prefix[2k-1] (prefix[-1] = id)
        sx_prev = jnp.concatenate(
            [jnp.eye(nx, dtype=dtype)[None], sx_odd[:-1]], axis=0
        )
        su_prev = jnp.concatenate(
            [jnp.zeros((1, nx, nu * h), dtype), su_odd[:-1]], axis=0
        )
        sx_even = A_ev @ sx_prev
        su_even = A_ev @ su_prev + S0[0::2]
        Sx = jnp.stack([sx_even, sx_odd], axis=1).reshape(h, nx, nx)
        Su = jnp.stack([su_even, su_odd], axis=1).reshape(h, nx, nu * h)
    else:
        sx_rows, su_rows = [], []
        su_prev = jnp.zeros((nx, nu * h), dtype)
        sx_prev = jnp.eye(nx, dtype=dtype)
        for k in range(h):
            sx_prev = A[k] @ sx_prev
            su_prev = A[k] @ su_prev + S0[k]
            sx_rows.append(sx_prev)
            su_rows.append(su_prev)
        Sx = jnp.stack(sx_rows)
        Su = jnp.stack(su_rows)

    Qd = jnp.asarray(mpc.Q, dtype)  # (13,)
    Rd = jnp.asarray(mpc.R, dtype)  # (12,)
    # P = Suᵀ Q̄ Su + R̄ ; q = Suᵀ Q̄ (Sx x0 - xref)
    SuQ = Su * Qd[None, :, None]  # (h,13,120)
    Su_flat = Su.reshape(h * nx, nu * h)
    SuQ_flat = SuQ.reshape(h * nx, nu * h)
    # The (12h,13h)x(13h,12h) Gram product is the condense stage's FLOP
    # bulk; 3-pass f32 (HIGH) instead of the framework-wide 6-pass
    # "highest" — the ~1e-6 relative rounding on P is far below the QP's
    # model/solver error floor.
    P = jnp.matmul(
        SuQ_flat.T, Su_flat, precision=jax.lax.Precision.HIGH
    ) + jnp.diag(jnp.tile(Rd, h))
    free = jnp.einsum("kij,j->ki", Sx, x0) - x_ref.T  # (h,13)
    q = SuQ_flat.T @ free.reshape(h * nx)

    R = eul2rotm(x_fb[0:3])
    # Box rows: identity on u, EXCEPT that with foot_yaw the per-foot
    # moment bounds apply in each foot's own heading frame — the
    # reference's tau_max = (0, 67, 33.5) encodes the line foot's
    # transmissibility (NO moment about the cross-line axis), which is an
    # axis of the FOOT, not the body. A body-aligned box hands the QP up
    # to sin(q0)*67 N·m of phantom cross-line authority whenever the
    # hip-yaw angle q0 is nonzero (turning), which physically rolls the
    # foot instead of the body (measured: the round-3 turning falls).
    box = jnp.eye(nu, dtype=dtype)
    if foot_yaw is not None:
        RzL = _rz(foot_yaw[0]).astype(dtype)
        RzR = _rz(foot_yaw[1]).astype(dtype)
        box = box.at[6:9, 6:9].set(RzL.T).at[9:12, 9:12].set(RzR.T)
    rows = [friction_rows(biped.mu).astype(dtype), box,
            line_foot_rows(
                biped, R, foot_yaw,
                shrink=(mpc.lf_toe_shrink, mpc.lf_heel_shrink),
            ).astype(dtype)]
    if mpc.mu_z is not None:
        rows.append(torsional_rows(mpc).astype(dtype))
    A_step = jnp.concatenate(rows, axis=0)
    l, u = constraint_bounds(mpc, biped, contact)
    return CondensedQp(P=P, q=q, A_step=A_step, l=l.astype(dtype),
                       u=u.astype(dtype), Sx=Sx, Su=Su, x0=x0)


def _mm_bf16(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """One-pass MXU matmul: bfloat16 inputs, float32 accumulation/output.

    Under the framework-wide ``default_matmul_precision("highest")`` policy
    (utils/precision.py) every f32 matmul costs ~6 bf16 MXU passes; this
    explicit cast buys the 6x cheaper single pass where an algorithm is
    provably tolerant of bf16 operand rounding (Newton-Schulz climb steps,
    see :func:`ns_inverse`).
    """
    return jnp.matmul(
        a.astype(jnp.bfloat16),
        b.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )


def ns_inverse(
    K: jnp.ndarray, n_iters: int = 14, bf16_iters: int = 0
) -> jnp.ndarray:
    """SPD inverse by Jacobi-preconditioned Newton-Schulz iteration.

    TPU-first replacement for Cholesky + triangular inversion: XLA's batched
    small-matrix factorizations run as sequential scalar-ish loops (measured
    ~50 ms / 1024 envs for the 120x120 KKT), while this is 2·n_iters batched
    MXU matmuls (~30 ms, and the whole path is fusion- and vmap-friendly).

      Khat = S K S   (S = diag(1/sqrt(diag K)); undoes the ADMM rho spread)
      X_0  = I / ||Khat||_inf            (SPD: guarantees ||I - Khat X|| < 1)
      X    <- X (2I - Khat X)            (residual squares each step)

    n_iters=14 reaches the f32 floor (||K Kinv - I|| ~ 2e-6, measured on
    hardware — equal to Cholesky + 2 refinement steps) for the MPC KKT's
    cond (~1e2 Jacobi-equilibrated). Works on a single matrix or any leading
    batch axes.

    bf16_iters: run the FIRST bf16_iters steps with bfloat16 operands
    (f32 accumulation), the rest in full f32. NS is self-correcting — each
    step contracts whatever error the previous one carried — so the cheap
    climb phase (residual 1 -> ~0.05, where bf16 and f32 trajectories are
    measured to coincide) runs at 1 MXU pass per matmul instead of the 6
    passes "highest" costs, and the final f32 steps restore the floor.
    Measured on walking-rollout KKTs: bf16(8)+f32(3) reaches 4e-5 vs
    f32(11)'s 4e-5 — identical, at ~1/3 the MXU passes.
    """
    n = K.shape[-1]
    eye = jnp.eye(n, dtype=K.dtype)
    s = jax.lax.rsqrt(jnp.diagonal(K, axis1=-2, axis2=-1))
    Khat = K * s[..., :, None] * s[..., None, :]
    nrm = jnp.max(jnp.sum(jnp.abs(Khat), axis=-1), axis=-1)
    X = eye / nrm[..., None, None]
    two_eye = 2.0 * eye
    for _ in range(min(bf16_iters, n_iters)):
        X = _mm_bf16(X, two_eye - _mm_bf16(Khat, X))
    for _ in range(max(n_iters - bf16_iters, 0)):
        X = X @ (two_eye - Khat @ X)
    return X * s[..., :, None] * s[..., None, :]


def ruiz_equilibrate(
    qp: CondensedQp, n_iters: int = 10, bf16_norms: bool = False
):
    """Ruiz equilibration of the condensed QP (modified-Ruiz, as in OSQP).

    The raw MPC problem is badly scaled (P entries ~1e-4 from R, bounds
    ~5e2 N) — first-order methods stall on it. Returns scaled quantities and
    the diagonal scalings:

      P̂ = c·D P D,  q̂ = c·D q,  Â_k = E_k A_step D_k,  l̂ = E l,  û = E u

    with D (h,12) variable scaling, E (h,28) row scaling, c cost scaling.
    Fixed iteration count -> trace-friendly, vmappable.

    ``bf16_norms=True`` (fast path: MpcConfig.ruiz_bf16_norms) runs the
    norm reductions over |P| with bfloat16 operands. Scalings steer ADMM
    convergence RATE only — the fixed point is unscaled — so 4e-3 rounding
    in the norms is behaviorally free, but it does shift the scalings
    0.2-0.7% and (at a fixed iteration count) perturbs returned iterates
    slightly, so parity/golden paths keep the default f32.
    """
    h, m, nu = qp.l.shape[0], qp.A_step.shape[0], 12
    dtype = qp.P.dtype
    P, q = qp.P, qp.q
    # Norm-only iteration: the scaled matrices are never materialized inside
    # the loop — each iteration needs only weighted max-reductions over |P|
    # (fused multiply-reduce; optionally bf16 operands, see above) and over
    # the tiny shared A_step. This cuts the loop's HBM traffic ~8x vs
    # rescaling (h*nu)^2 matrices per iteration; the scaled Ph/Ah are built
    # once at the end in f32.
    norm_dtype = jnp.bfloat16 if bf16_norms else dtype
    absP = jnp.abs(P).astype(norm_dtype)
    absA = jnp.abs(qp.A_step)  # (m,nu), shared across steps

    def body(carry, _):
        D, E, c = carry
        Dg = D.reshape(-1).astype(norm_dtype)
        # column norms of the currently-scaled [P; A] per variable
        colP = (
            c
            * D.reshape(-1)
            * jnp.max(absP * Dg[:, None], axis=0).astype(dtype)
        ).reshape(h, nu)
        EA = E[:, :, None] * absA[None]  # (h,m,nu) scaled |A| rows
        colA = jnp.max(EA, axis=1) * D
        col = jnp.sqrt(jnp.maximum(jnp.maximum(colP, colA), 1e-8))
        d = 1.0 / col
        rowA = jnp.sqrt(jnp.maximum(jnp.max(EA * D[:, None, :], axis=2), 1e-8))
        e = 1.0 / rowA
        Dn = D * d
        # cost scaling: mean column norm of the d-rescaled P toward 1
        Dng = Dn.reshape(-1).astype(norm_dtype)
        colPn = (
            c * Dn.reshape(-1) * jnp.max(absP * Dng[:, None], axis=0).astype(dtype)
        )
        gamma = 1.0 / jnp.maximum(jnp.mean(colPn), 1e-8)
        # clamp the row scaling: an ALL-ZERO row (disabled torsional-cone
        # rows, mu_z=None) has rowA at the 1e-8 floor every iteration, so
        # unclamped E would compound 1e4 per iteration into f32 inf (and
        # inf*0 = NaN downstream). 1e6 is far above any real row's scaling.
        return (Dn, jnp.minimum(E * e, 1e6), c * gamma), None

    (D, E, c), _ = jax.lax.scan(
        body,
        (jnp.ones((h, nu), dtype), jnp.ones((h, m), dtype),
         jnp.asarray(1.0, dtype)),
        None,
        length=n_iters,
    )
    d_flat = D.reshape(-1)
    Ph = c * P * d_flat[:, None] * d_flat[None, :]
    Ah = qp.A_step[None] * E[:, :, None] * D[:, None, :]
    qh = c * d_flat * q
    lh = E * qp.l
    uh = E * qp.u
    return Ph, qh, Ah, lh, uh, D, E, c


def solve_qp(
    qp: CondensedQp, mpc: MpcConfig, warm: QpSolution | None = None
) -> QpSolution:
    """Fixed-iteration ADMM (BoxOSQP) solve of the condensed QP.

    Replaces cvxopt's interior point (reference ``:297``). After Ruiz
    equilibration, the iteration

        v   <- Kinv @ (sigma·x - q + Aᵀ(rho·z - y))
        x   <- alpha·v + (1-alpha)·x          (over-relaxation)
        z   <- clip(A v_relax + y/rho, l, u)
        y   <- y + rho·(A v_relax - z)

    uses a per-tick precomputed dense inverse of
    ``K = P + sigma I + blkdiag(Â_kᵀ rho_k Â_k)`` so every iteration is
    matmul+clip: branch-free, fuses under jit, batches under vmap (the
    batched iteration is one (b,120,120)x(b,120) MXU contraction).
    """
    h, nu, m = mpc.h, 12, qp.A_step.shape[0]
    dtype = qp.P.dtype
    Ph, qh, Ah, lh, uh, D, E, c = ruiz_equilibrate(
        qp, mpc.ruiz_iters, mpc.ruiz_bf16_norms
    )

    sigma = jnp.asarray(mpc.admm_sigma, dtype)
    alpha = jnp.asarray(mpc.admm_alpha, dtype)
    is_eq = (uh - lh) < 1e-6
    idx = jnp.arange(h * nu).reshape(h, nu)
    qh_steps = qh.reshape(h, nu)
    eyeN = jnp.eye(nu * h, dtype=dtype)

    if warm is None:
        x = jnp.zeros((h, nu), dtype)
        z = jnp.zeros((h, m), dtype)
        y = jnp.zeros((h, m), dtype)
    else:
        # map unscaled warm iterates into the scaled space
        x = warm.controls.astype(dtype) / D
        z = E * warm.z.astype(dtype)
        y = c * warm.y.astype(dtype) / E

    def run_phase(x, z, y, rho, n_iters):
        """Factor K for this rho and run n_iters ADMM steps (one scan)."""
        rho_vec = jnp.where(is_eq, rho * 1e3, rho)  # (h,m)
        AtRA = jnp.einsum("kji,kj,kjl->kil", Ah, rho_vec, Ah)  # (h,12,12)
        K = (Ph + sigma * eyeN).at[idx[:, :, None], idx[:, None, :]].add(AtRA)
        # dense inverse once per phase -> iterations are pure matmuls.
        # ns_inverse instead of Cholesky: see its docstring (MXU-batched,
        # faster, and its ||K Kinv - I|| ~ 2e-6 floor makes the
        # fixed-iteration ADMM trajectory factorization-roundoff-insensitive
        # — the fused Pallas kernel refines to the same floor).
        Kinv = ns_inverse(K, mpc.kinv_ns_iters, mpc.kinv_bf16_iters)
        # Optional bf16 x-update matvec: the iteration loop is HBM-bound on
        # re-reading Kinv every step; a bf16 copy (cast ONCE, outside the
        # scan) halves that traffic. The 4e-3 operand rounding is ~15x below
        # the measured behavioral threshold (closed loop degrades only once
        # the applied inverse is ~6e-2 wrong — the NS(8) budget edge).
        Kinv_apply = (
            Kinv.astype(jnp.bfloat16) if mpc.admm_bf16_matvec else Kinv
        )

        def iteration(carry, _):
            x, z, y = carry
            rhs = sigma * x - qh_steps + jnp.einsum(
                "kji,kj->ki", Ah, rho_vec * z - y
            )
            v = jnp.matmul(
                Kinv_apply,
                rhs.reshape(-1).astype(Kinv_apply.dtype),
                preferred_element_type=dtype,
            ).reshape(h, nu)
            x_new = alpha * v + (1 - alpha) * x
            Av = jnp.einsum("kij,kj->ki", Ah, v)
            z_tilde = alpha * Av + (1 - alpha) * z
            z_new = jnp.clip(z_tilde + y / rho_vec, lh, uh)
            y_new = y + rho_vec * (z_tilde - z_new)
            return (x_new, z_new, y_new), None

        return jax.lax.scan(iteration, (x, z, y), None, length=n_iters)[0]

    # OSQP-style rho adaptation on a fixed schedule: split the iteration
    # budget into phases; between phases re-pick rho from the scaled
    # primal/dual residual ratio and refactor (trace-friendly: static phase
    # count, traced rho).
    n_phases = mpc.admm_rho_phases
    iters_per_phase = max(1, mpc.n_admm_iters // n_phases)
    rho = jnp.asarray(mpc.admm_rho, dtype)
    for p in range(n_phases):
        x, z, y = run_phase(x, z, y, rho, iters_per_phase)
        if p < n_phases - 1:
            Av = jnp.einsum("kij,kj->ki", Ah, x)
            Px = (Ph @ x.reshape(-1)).reshape(h, nu)
            Aty = jnp.einsum("kji,kj->ki", Ah, y)
            eps = jnp.asarray(1e-8, dtype)
            rp = jnp.max(jnp.abs(Av - z)) / (
                jnp.maximum(jnp.max(jnp.abs(Av)), jnp.max(jnp.abs(z))) + eps
            )
            rd = jnp.max(jnp.abs(Px + qh_steps + Aty)) / (
                jnp.maximum(
                    jnp.maximum(jnp.max(jnp.abs(Px)), jnp.max(jnp.abs(Aty))),
                    jnp.max(jnp.abs(qh_steps)),
                )
                + eps
            )
            # clip range [1e-2, 1e2]: the box rows are identity blocks, so
            # rho >= 1e-2 keeps lambda_min(K) bounded away from P's
            # small-eigenvalue directions — cond(K) stays within the
            # Newton-Schulz budget (a 1e-4 floor let cond blow past
            # what 14 NS steps resolve, diverging articulated solves)
            rho = jnp.clip(rho * jnp.sqrt(rp / (rd + eps)), 1e-2, 1e2)

    if mpc.admm_polish:
        # OSQP-style polish: detect the active set from the converged
        # iterates, then solve the equality-constrained QP on that set by an
        # augmented-Lagrangian penalty with ONE extra factorization and 3
        # multiplier updates (re-using the factor). Reaches the f32 accuracy
        # floor (~1e-4 relative); branch-free — a wrong active set is
        # rejected by the violation check below.
        tol = 1e-5
        w_act = ((z <= lh + tol) | (z >= uh - tol)).astype(dtype)  # (h,28)
        b_act = jnp.clip(z, lh, uh)
        rho_pol = jnp.asarray(1e4, dtype)
        AtWA = jnp.einsum("kji,kj,kjl->kil", Ah, rho_pol * w_act, Ah)
        K_pol = Ph + sigma * jnp.eye(nu * h, dtype=dtype)
        K_pol = K_pol.at[idx[:, :, None], idx[:, None, :]].add(AtWA)
        Kinv_pol = ns_inverse(K_pol, mpc.kinv_ns_iters, mpc.kinv_bf16_iters)

        def al_step(carry, _):
            _, lam = carry
            rhs = -qh_steps + jnp.einsum(
                "kji,kj->ki", Ah, w_act * (rho_pol * b_act - lam)
            )
            x_p = (Kinv_pol @ rhs.reshape(-1)).reshape(h, nu)
            r = (jnp.einsum("kij,kj->ki", Ah, x_p) - b_act) * w_act
            return (x_p, lam + rho_pol * r), None

        (x_pol, lam), _ = jax.lax.scan(
            al_step, (x, jnp.zeros_like(b_act)), None, length=3
        )
        # accept polish only if it wins on an exact-penalty merit
        # (objective + stiff constraint violation): a mis-detected active set
        # yields a feasible-but-suboptimal point, which this rejects
        def merit(v):
            Av = jnp.einsum("kij,kj->ki", Ah, v)
            viol = jnp.sum(jnp.abs(Av - jnp.clip(Av, lh, uh)))
            vf = v.reshape(-1)
            obj = 0.5 * vf @ (Ph @ vf) + qh @ vf
            return obj + 1e4 * viol

        accept = merit(x_pol) <= merit(x)
        # update x and z together so the stored pair stays consistent
        # (z = A x̂*); keep the ADMM duals y — the AL multipliers satisfy
        # stationarity but can carry wrong SIGNS on degenerate active sets
        # (e.g. a swing foot's friction rows are linearly dependent with its
        # zero force box), which poisons warm starts
        Av_pol = jnp.einsum("kij,kj->ki", Ah, x_pol)
        x = jnp.where(accept, x_pol, x)
        z = jnp.where(accept, jnp.clip(Av_pol, lh, uh), z)

    # unscale (scaled stationarity cDPD·x̂ + cDq + DAᵀE·ŷ = 0 implies the
    # unscaled dual is y = E·ŷ/c)
    x_u = D * x  # (h,12)
    z_u = z / E
    y_u = E * y / c

    U = x_u.reshape(-1)
    states = jnp.einsum("kij,j->ki", qp.Sx, qp.x0) + (qp.Su @ U)
    Ax = jnp.einsum("ij,kj->ki", qp.A_step, x_u)
    res_prim = jnp.max(jnp.abs(Ax - jnp.clip(Ax, qp.l, qp.u)))
    res_dual = jnp.max(
        jnp.abs(qp.P @ U + qp.q + jnp.einsum("ji,kj->ki", qp.A_step, y_u).reshape(-1))
    )
    return QpSolution(
        controls=x_u, states=states, z=z_u, y=y_u,
        res_prim=res_prim, res_dual=res_dual,
    )


def solve_qp_batch(
    qp: CondensedQp,
    mpc: MpcConfig,
    warm: QpSolution | None = None,
    backend: str = "xla",
    block_envs: int | None = None,
    interpret: bool = False,
) -> QpSolution:
    """Solve a BATCH of condensed QPs (leading env axis on every leaf).

    backend="xla": vmap of :func:`solve_qp`.
    backend="pallas": the fused VMEM-resident kernel
    (ops/pallas/qp_kernel.py) — the ENTIRE multi-phase ADMM + polish solve
    in one kernel launch per block of envs, replacing the ~50 XLA dispatches
    whose launch latency dominates small-batch solves. Same algorithm
    (NS-inverse KKT, OSQP rho schedule, merit-checked polish), so the two
    backends agree to f32 roundoff.
    """
    if backend == "xla":
        if warm is None:
            return jax.vmap(lambda q: solve_qp(q, mpc))(qp)
        return jax.vmap(lambda q, w: solve_qp(q, mpc, w))(qp, warm)

    from biped_mpc_py_tpu.ops.pallas.qp_kernel import fused_qp_solve

    h, nu = mpc.h, 12
    m = qp.A_step.shape[-2]  # constraint rows per step (m_step(mpc))
    N = qp.P.shape[0]
    dtype = qp.P.dtype
    Ph, qh, Ah, lh, uh, D, E, c = jax.vmap(
        lambda q: ruiz_equilibrate(q, mpc.ruiz_iters, mpc.ruiz_bf16_norms)
    )(qp)

    def blockdiag(Ah_one):
        out = jnp.zeros((h * m, h * nu), dtype)
        for k in range(h):
            out = jax.lax.dynamic_update_slice(out, Ah_one[k], (m * k, nu * k))
        return out

    A_dense = jax.vmap(blockdiag)(Ah)

    if warm is None:
        x0 = jnp.zeros((N, h * nu), dtype)
        z0 = jnp.zeros((N, h * m), dtype)
        y0 = jnp.zeros((N, h * m), dtype)
    else:
        x0 = (warm.controls / D).reshape(N, -1)
        z0 = (E * warm.z).reshape(N, -1)
        y0 = (c[:, None, None] * warm.y / E).reshape(N, -1)

    x, z, y = fused_qp_solve(
        Ph, A_dense, qh, lh.reshape(N, -1), uh.reshape(N, -1), x0, z0, y0,
        rho=mpc.admm_rho, n_iters=mpc.n_admm_iters,
        n_phases=mpc.admm_rho_phases, ns_iters=mpc.kinv_ns_iters,
        sigma=float(mpc.admm_sigma), alpha=float(mpc.admm_alpha),
        polish=mpc.admm_polish, block_envs=block_envs, interpret=interpret,
    )
    x_u = D * x.reshape(N, h, nu)
    z_u = z.reshape(N, h, m) / E
    y_u = E * y.reshape(N, h, m) / c[:, None, None]

    def finish(qp1, x1, z1, y1):
        U = x1.reshape(-1)
        states = jnp.einsum("kij,j->ki", qp1.Sx, qp1.x0) + (qp1.Su @ U)
        Ax = jnp.einsum("ij,kj->ki", qp1.A_step, x1)
        res_prim = jnp.max(jnp.abs(Ax - jnp.clip(Ax, qp1.l, qp1.u)))
        res_dual = jnp.max(
            jnp.abs(
                qp1.P @ U + qp1.q
                + jnp.einsum("ji,kj->ki", qp1.A_step, y1).reshape(-1)
            )
        )
        return QpSolution(
            controls=x1, states=states, z=z1, y=y1,
            res_prim=res_prim, res_dual=res_dual,
        )

    return jax.vmap(finish)(qp, x_u, z_u, y_u)


def sparse_qp_matrices(
    mpc: MpcConfig,
    biped: BipedParams,
    x_fb: jnp.ndarray,
    x_ref: jnp.ndarray,
    A: jnp.ndarray,
    B: jnp.ndarray,
    contact: jnp.ndarray,
):
    """The reference's ORIGINAL sparse QP form (C8 parity surface).

    Assembles the 250-variable stacked-states-and-controls matrices exactly
    as the reference does (H/f: ``bipedalLocomotionMPC.py:277-286``,
    equality: ``:202-216``, inequalities: ``:219-274``) from the same
    horizon linearization — provided for users porting code that consumes
    the sparse form, for oracle cross-checks, and as executable
    documentation that the condensed form (the fast path) is equivalent.

    Returns (H, f, Aeq, beq, G, h_vec) with h = mpc.h:
    H (25h, 25h), f (25h,), Aeq (13h, 25h), beq (13h,), G (36h, 25h),
    h_vec (36h,).
    """
    h, nx, nu = mpc.h, 13, 12
    dtype = A.dtype
    n = nx * h + nu * h
    Qd = jnp.asarray(mpc.Q, dtype)
    Rd = jnp.asarray(mpc.R, dtype)
    H = 2.0 * jnp.diag(
        jnp.concatenate([jnp.tile(Qd, h), jnp.tile(Rd, h)])
    )
    f = 2.0 * jnp.concatenate(
        [-(x_ref.T * Qd[None, :]).reshape(-1), jnp.zeros(nu * h, dtype)]
    )

    x0 = jnp.concatenate([x_fb[:12], jnp.ones((1,), dtype)])
    Aeq = jnp.zeros((nx * h, n), dtype)
    for i in range(h):
        Aeq = jax.lax.dynamic_update_slice(
            Aeq, jnp.eye(nx, dtype=dtype), (nx * i, nx * i)
        )
        Aeq = jax.lax.dynamic_update_slice(
            Aeq, -B[i], (nx * i, nx * h + nu * i)
        )
        if i > 0:
            Aeq = jax.lax.dynamic_update_slice(
                Aeq, -A[i], (nx * i, nx * (i - 1))
            )
    beq = jnp.concatenate(
        [A[0] @ x0, jnp.zeros(nx * (h - 1), dtype)]
    )

    # inequalities in the reference's grouped layout: all friction rows
    # (8h, ``:230-232``), then all box rows (24h upper-then-lower per step,
    # ``:235-251``), then all line-foot rows (4h, ``:266-271``)
    R = eul2rotm(x_fb[0:3])
    F = friction_rows(biped.mu).astype(dtype)
    LF = line_foot_rows(biped, R).astype(dtype)
    l, u = constraint_bounds(mpc, biped, contact)
    ctrl0 = nx * h  # first control column

    def place(rows_per_step, block_fn):
        G_blk = jnp.zeros((rows_per_step * h, n), dtype)
        for k in range(h):
            G_blk = jax.lax.dynamic_update_slice(
                G_blk, block_fn(k), (rows_per_step * k, ctrl0 + nu * k)
            )
        return G_blk

    G_mu = place(8, lambda k: F)
    G_box = place(
        24,
        lambda k: jnp.concatenate(
            [jnp.eye(nu, dtype=dtype), -jnp.eye(nu, dtype=dtype)], axis=0
        ),
    )
    G_lf = place(4, lambda k: LF)
    G = jnp.concatenate([G_mu, G_box, G_lf], axis=0)
    h_box = jnp.concatenate(
        [jnp.concatenate([u[k, 8:20], -l[k, 8:20]]) for k in range(h)]
    )
    h_vec = jnp.concatenate(
        [jnp.zeros(8 * h, dtype), h_box, jnp.zeros(4 * h, dtype)]
    )
    return H, f, Aeq, beq, G, h_vec
