"""Fused QP solve as a single Pallas TPU kernel.

The XLA composition of one MPC solve (per-phase K build -> inverse -> 30+
ADMM iterations -> rho adaptation -> polish) executes as ~50 dispatches
whose launch latency dominates wall time for small batches (measured: a
single-env tick is ~0.4 ms of which most is dispatch). This kernel runs the
WHOLE solve for a block of envs inside VMEM, in one launch:

  per rho-phase (static count):
    1. K = P + sigma I + A' diag(rho) A            (batched MXU matmul)
    2. Kinv by Jacobi-preconditioned Newton-Schulz (2 MXU matmuls/step;
       residual squares per step -> f32 floor in ~14 steps; the same
       algorithm as ops/qp.py::ns_inverse, so kernel and XLA core agree to
       f32 roundoff)
    3. n_iters/n_phases ADMM steps, everything VMEM-resident
    4. OSQP rho re-pick from the primal/dual residual ratio
  then (optional) active-set polish: K_pol inverse by the same NS, 3
  augmented-Lagrangian steps, exact-penalty merit accept/reject.

Shapes are padded to the 128-lane tile: n=120 -> 128 variables, constraint
rows to the next multiple of 128 (m=240 -> 256 at the 24-row reference
semantics; m=280 -> 384 with the torsional-cone extension, see
ops/qp.py::m_step); padding rows/cols carry identity/free bounds so the math
is exact. All reductions keep 2-D (B, 1) shapes — rank-1 (B,) intermediates
crash this toolchain's Mosaic relayout pass.

Numerics: identical algorithm to ops/qp.py::solve_qp's scaled core
(validated in interpret mode in tests/test_qp_kernel.py and on hardware to
~3e-3 N in unscaled controls).

Replaces the cvxopt interior point of the reference
(``bipedalLocomotionMPC.py:297``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_PAD = 128  # padded variable count (real: 120)
# Constraint rows pad to the next lane multiple of 128 from the INPUT
# shape: 240 real rows (10 steps x 24, mu_z off — the reference-semantics
# default) -> 256; 280 (x28 with the torsional cone) -> 384. Building the
# smaller problem when the cone is disabled is worth ~4% single-env
# latency (ops/qp.py::m_step).
EQ_RHO_BOOST = 1e3  # rho multiplier on (near-)equality rows, as in OSQP


def _ns_inverse_padded(K, ns_iters: int):
    """Jacobi-preconditioned Newton-Schulz inverse of a (B,128,128) SPD
    block (padding diag must be identity). Mirrors ops/qp.py::ns_inverse."""
    f32 = jnp.float32
    eyef = (
        jax.lax.broadcasted_iota(jnp.int32, (N_PAD, N_PAD), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (N_PAD, N_PAD), 1)
    ).astype(f32)
    diag = jnp.sum(K * eyef[None], axis=2)  # (B,128)
    s = jax.lax.rsqrt(jnp.maximum(diag, 1e-30))
    Khat = K * s[:, :, None] * s[:, None, :]
    nrm = jnp.max(
        jnp.sum(jnp.abs(Khat), axis=2), axis=1, keepdims=True
    )  # (B,1)
    X = eyef[None] / nrm[:, :, None]
    two_eye = 2.0 * eyef[None]
    for _ in range(ns_iters):
        KX = jax.lax.dot_general(
            Khat, X, (((2,), (1,)), ((0,), (0,))), preferred_element_type=f32
        )
        X = jax.lax.dot_general(
            X, two_eye - KX, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=f32,
        )
    return X * s[:, :, None] * s[:, None, :]


def _build_K(P, A, rho, sigma):
    """K = P + sigma I + A' diag(rho) A, identity on the padding block."""
    f32 = jnp.float32
    eyef = (
        jax.lax.broadcasted_iota(jnp.int32, (N_PAD, N_PAD), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (N_PAD, N_PAD), 1)
    ).astype(f32)
    rA = rho[:, :, None] * A
    AtRA = jax.lax.dot_general(
        A, rA, (((1,), (1,)), ((0,), (0,))), preferred_element_type=f32
    )
    pad_eye = eyef[None] * (
        jax.lax.broadcasted_iota(jnp.int32, (N_PAD, N_PAD), 0)[None] >= 120
    ).astype(f32)
    return P + AtRA + (sigma + 1e-30) * eyef[None] + pad_eye


def _qp_kernel(
    P_ref, A_ref, q_ref, l_ref, u_ref, eq_ref, rho0_ref, x0_ref, z0_ref,
    y0_ref, x_out, z_out, y_out,
    *, n_iters: int, n_phases: int, ns_iters: int, sigma: float,
    alpha: float, polish: bool, m_real: int,
):
    """One grid step = one block of envs, everything resident in VMEM.

    Block shapes: P (B,128,128), A (B,M_PAD,128); every vector operand ships
    as (B,1,PAD) — Pallas TPU requires 2-D block sublane dims divisible by
    8, the middle singleton sidesteps that for any block_envs — and is
    squeezed on load. eq is the {0,1} mask of (near-)equality rows; rho0
    carries the scalar initial rho in every real row.
    """
    f32 = jnp.float32
    P = P_ref[:]
    A = A_ref[:]
    q = q_ref[:][:, 0, :]
    l = l_ref[:][:, 0, :]
    u = u_ref[:][:, 0, :]
    eq = eq_ref[:][:, 0, :]
    sig = jnp.asarray(sigma, f32)
    al = jnp.asarray(alpha, f32)

    # scalar per-env rho from the carrier vector (min over rows: real rows
    # hold the scalar, padding holds 1e20)
    rho_s = jnp.min(rho0_ref[:][:, 0, :], axis=1, keepdims=True)  # (B,1)

    x = x0_ref[:][:, 0, :]
    z = z0_ref[:][:, 0, :]
    y = y0_ref[:][:, 0, :]

    iters_per_phase = max(1, n_iters // n_phases)
    for p in range(n_phases):
        rho = jnp.where(eq > 0.5, EQ_RHO_BOOST * rho_s, rho_s)  # (B,M_PAD)
        # padding rows: rho = 1 so K's padding stays identity-dominated
        is_pad = (
            jax.lax.broadcasted_iota(jnp.int32, rho.shape, 1) >= m_real
        ).astype(f32)
        rho = rho * (1.0 - is_pad) + is_pad
        inv_rho = 1.0 / rho
        K = _build_K(P, A, rho, sigma)
        Kinv = _ns_inverse_padded(K, ns_iters)

        def admm_step(_, carry, rho=rho, inv_rho=inv_rho, Kinv=Kinv):
            x, z, y = carry
            w = rho * z - y
            Atw = jax.lax.dot_general(
                w[:, None, :], A, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=f32,
            )[:, 0, :]
            rhs = sig * x - q + Atw
            v = jax.lax.dot_general(
                rhs[:, None, :], Kinv, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=f32,
            )[:, 0, :]
            x_new = al * v + (1 - al) * x
            Av = jax.lax.dot_general(
                v[:, None, :], A, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=f32,
            )[:, 0, :]
            z_t = al * Av + (1 - al) * z
            z_new = jnp.clip(z_t + y * inv_rho, l, u)
            y_new = y + rho * (z_t - z_new)
            return (x_new, z_new, y_new)

        x, z, y = jax.lax.fori_loop(0, iters_per_phase, admm_step, (x, z, y))

        if p < n_phases - 1:
            # OSQP rho re-pick from scaled residual ratio (ops/qp.py:347-356)
            eps = jnp.asarray(1e-8, f32)
            Av = jax.lax.dot_general(
                x[:, None, :], A, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=f32,
            )[:, 0, :]
            Px = jax.lax.dot_general(
                x[:, None, :], P, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=f32,
            )[:, 0, :]
            Aty = jax.lax.dot_general(
                y[:, None, :], A, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=f32,
            )[:, 0, :]
            mx = lambda t: jnp.max(jnp.abs(t), axis=1, keepdims=True)
            rp = mx(Av - z) / (jnp.maximum(mx(Av), mx(z)) + eps)
            rd = mx(Px + q + Aty) / (
                jnp.maximum(jnp.maximum(mx(Px), mx(Aty)), mx(q)) + eps
            )
            # same [1e-2, 1e2] clip as ops/qp.py (cond(K) stays within
            # the Newton-Schulz budget)
            rho_s = jnp.clip(
                rho_s * jnp.sqrt(rp / (rd + eps)), 1e-2, 1e2
            )

    if polish:
        # active-set polish (ops/qp.py:358-406): AL penalty on the detected
        # active rows, merit-checked accept
        tol = jnp.asarray(1e-5, f32)
        w_act = jnp.logical_or(z <= l + tol, z >= u - tol).astype(f32)
        b_act = jnp.clip(z, l, u)
        rho_pol = jnp.asarray(1e4, f32)
        K_pol = _build_K(P, A, rho_pol * w_act, sigma)
        Kinv_pol = _ns_inverse_padded(K_pol, ns_iters)
        lam = jnp.zeros_like(b_act)
        x_p = x
        for _ in range(3):
            w = w_act * (rho_pol * b_act - lam)
            rhs = -q + jax.lax.dot_general(
                w[:, None, :], A, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=f32,
            )[:, 0, :]
            x_p = jax.lax.dot_general(
                rhs[:, None, :], Kinv_pol, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=f32,
            )[:, 0, :]
            Axp = jax.lax.dot_general(
                x_p[:, None, :], A, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=f32,
            )[:, 0, :]
            lam = lam + rho_pol * (Axp - b_act) * w_act

        def merit(v):
            Av = jax.lax.dot_general(
                v[:, None, :], A, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=f32,
            )[:, 0, :]
            viol = jnp.sum(
                jnp.abs(Av - jnp.clip(Av, l, u)), axis=1, keepdims=True
            )
            Pv = jax.lax.dot_general(
                v[:, None, :], P, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=f32,
            )[:, 0, :]
            obj = 0.5 * jnp.sum(v * Pv, axis=1, keepdims=True) + jnp.sum(
                q * v, axis=1, keepdims=True
            )
            return obj + 1e4 * viol  # (B,1)

        accept = (merit(x_p) <= merit(x)).astype(f32)  # (B,1)
        Av_pol = jax.lax.dot_general(
            x_p[:, None, :], A, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=f32,
        )[:, 0, :]
        x = accept * x_p + (1.0 - accept) * x
        z = accept * jnp.clip(Av_pol, l, u) + (1.0 - accept) * z

    x_out[:] = x[:, None, :]
    z_out[:] = z[:, None, :]
    y_out[:] = y[:, None, :]


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_iters", "n_phases", "ns_iters", "sigma", "alpha", "polish",
        "block_envs", "interpret",
    ),
)
def fused_qp_solve(
    P: jnp.ndarray,  # (N,120,120) scaled Hessian
    A: jnp.ndarray,  # (N,m,120) scaled stacked constraint matrix (m = h*m_step)
    q: jnp.ndarray,  # (N,120)
    l: jnp.ndarray,  # (N,m)
    u: jnp.ndarray,  # (N,m)
    x0: jnp.ndarray,  # (N,120)
    z0: jnp.ndarray,  # (N,m)
    y0: jnp.ndarray,  # (N,m)
    rho: float = 0.3,
    n_iters: int = 60,
    n_phases: int = 3,
    ns_iters: int = 14,
    sigma: float = 1e-6,
    alpha: float = 1.6,
    polish: bool = True,
    block_envs: int | None = None,
    interpret: bool = False,
):
    """Solve a batch of Ruiz-scaled box-QPs with the fused kernel.

    The (near-)equality rows (u - l < 1e-6) get the OSQP 1e3 rho boost, as
    in ops/qp.py. Returns (x (N,120), z (N,m), y (N,m)) — scaled space.

    ``block_envs`` defaults by constraint-row padding: the kernel scopes
    ~11.4 MB of VMEM per 4-env block at M_PAD=256 (the 24-row problem,
    measured — block 8 = 22.8 MB exceeds the 16 MB per-core VMEM limit and
    fails Mosaic compilation; docs/DESIGN_NOTES.md "Backend selection").
    With the torsional cone enabled (mpc.mu_z, m_step=28) M_PAD grows to
    384 (+50% on every M_PAD-shaped buffer), so the auto default halves to
    block 2 to stay under the limit. Pass an explicit value to override.
    """
    N = P.shape[0]
    n, m = P.shape[1], A.shape[1]
    M_PAD = -(-m // 128) * 128  # next lane multiple (see module docstring)
    if block_envs is None:
        block_envs = 4 if M_PAD <= 256 else 2
    assert N % block_envs == 0, (N, block_envs)
    f32 = jnp.float32

    def pad(arr, dims, cval=0.0):
        cfg = [(0, 0)] * arr.ndim
        for axis, target in dims:
            cfg[axis] = (0, target - arr.shape[axis])
        return jnp.pad(arr.astype(f32), cfg, constant_values=cval)

    def vec(arr):  # (N, PAD) -> (N, 1, PAD): see kernel docstring
        return arr[:, None, :]

    Pp = pad(P, [(1, N_PAD), (2, N_PAD)])
    Ap = pad(A, [(1, M_PAD), (2, N_PAD)])
    qp_ = vec(pad(q, [(1, N_PAD)]))
    # padded constraint rows: free so z stays at Av=0
    lp = vec(pad(l, [(1, M_PAD)], cval=-1e20))
    up = vec(pad(u, [(1, M_PAD)], cval=1e20))
    eq = vec(pad(((u - l) < 1e-6).astype(f32), [(1, M_PAD)]))
    # rho carrier: scalar in real rows, huge in padding (min-reduce extracts
    # the scalar)
    rho0 = vec(pad(jnp.full((N, m), rho, f32), [(1, M_PAD)], cval=1e20))
    x0p = vec(pad(x0, [(1, N_PAD)]))
    z0p = vec(pad(z0, [(1, M_PAD)]))
    y0p = vec(pad(y0, [(1, M_PAD)]))

    grid = (N // block_envs,)
    bspec = lambda shape: pl.BlockSpec(
        (block_envs,) + shape, lambda i: (i,) + (0,) * len(shape),
        memory_space=pltpu.VMEM,
    )
    kernel = functools.partial(
        _qp_kernel, n_iters=n_iters, n_phases=n_phases, ns_iters=ns_iters,
        sigma=sigma, alpha=alpha, polish=polish, m_real=m,
    )
    x, z, y = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            bspec((N_PAD, N_PAD)),
            bspec((M_PAD, N_PAD)),
            bspec((1, N_PAD)),
            bspec((1, M_PAD)),
            bspec((1, M_PAD)),
            bspec((1, M_PAD)),
            bspec((1, M_PAD)),
            bspec((1, N_PAD)),
            bspec((1, M_PAD)),
            bspec((1, M_PAD)),
        ],
        out_specs=[bspec((1, N_PAD)), bspec((1, M_PAD)), bspec((1, M_PAD))],
        out_shape=[
            jax.ShapeDtypeStruct((N, 1, N_PAD), f32),
            jax.ShapeDtypeStruct((N, 1, M_PAD), f32),
            jax.ShapeDtypeStruct((N, 1, M_PAD), f32),
        ],
        interpret=interpret,
    )(Pp, Ap, qp_, lp, up, eq, rho0, x0p, z0p, y0p)
    return x[:, 0, :n], z[:, 0, :m], y[:, 0, :m]
