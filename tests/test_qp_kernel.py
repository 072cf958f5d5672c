"""Fused Pallas ADMM kernel vs the plain-XLA scaled core (exactness) and
vs the certified oracle (optimality)."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from biped_mpc_py_tpu.config import GaitConfig, MpcConfig
from biped_mpc_py_tpu.control.gait import contact_sequence
from biped_mpc_py_tpu.control.mpc import build_mpc_qp
from biped_mpc_py_tpu.ops.pallas.qp_kernel import fused_admm_solve
from biped_mpc_py_tpu.ops.qp import ruiz_equilibrate
from biped_mpc_py_tpu.models.biped import BipedParams


def _reference_iteration(P, A, q, l, u, rho, x, z, y, n_iters, sigma=1e-6,
                         alpha=1.6):
    """Plain-JAX replica of the kernel's ADMM core (dense K inverse)."""
    K = P + sigma * jnp.eye(P.shape[-1]) + jnp.einsum(
        "bmi,bm,bmj->bij", A, rho, A
    )
    Kinv = jnp.linalg.inv(K)
    # same two Newton-Schulz refinement steps as the kernel and the XLA core
    # (see ops/qp.py): without them any two f32 inverses of this
    # cond~1e5 K differ enough to decohere 30 ADMM iterations
    eye = jnp.eye(P.shape[-1])[None]
    for _ in range(2):
        Kinv = jnp.einsum(
            "bij,bjk->bik", Kinv, 2.0 * eye - jnp.einsum("bij,bjk->bik", K, Kinv)
        )
    for _ in range(n_iters):
        w = rho * z - y
        rhs = sigma * x - q + jnp.einsum("bmi,bm->bi", A, w)
        v = jnp.einsum("bij,bj->bi", Kinv, rhs)
        x = alpha * v + (1 - alpha) * x
        Av = jnp.einsum("bmi,bi->bm", A, v)
        z_t = alpha * Av + (1 - alpha) * z
        z_new = jnp.clip(z_t + y / rho, l, u)
        y = y + rho * (z_t - z_new)
        z = z_new
    return x, z, y


def _scaled_mpc_batch(n_envs=8):
    """A batch of Ruiz-scaled MPC QPs (the kernel's real workload)."""
    mpc, biped = MpcConfig(), BipedParams()
    contact = contact_sequence(0.0, mpc, GaitConfig())
    rng = np.random.default_rng(0)
    xs = jnp.asarray(
        rng.normal(size=(n_envs, 12)) * 0.05
        + np.array([0, 0, 0, 0, 0, 0.53, 0, 0, 0, 0, 0, 0]),
        jnp.float32,
    )
    foot = jnp.tile(
        jnp.asarray([-0.02, 0.09, 0, -0.02, -0.09, 0], jnp.float32),
        (n_envs, 1),
    )
    qp = jax.vmap(lambda x, f: build_mpc_qp(x, 0.0, f, mpc, biped, contact))(
        xs, foot
    )
    Ph, qh, Ah, lh, uh, D, E, c = jax.vmap(ruiz_equilibrate)(qp)
    rho_vec = jnp.where((uh - lh) < 1e-6, 0.3 * 1e3, 0.3)
    # stack the per-step A blocks into the dense block-diagonal form
    B_, h, m, nu = Ah.shape[0], 10, 24, 12

    def blockdiag(Ah_one):
        out = jnp.zeros((h * m, h * nu), jnp.float32)
        for k in range(h):
            out = jax.lax.dynamic_update_slice(out, Ah_one[k], (m * k, nu * k))
        return out

    A_dense = jax.vmap(blockdiag)(Ah)
    return (
        Ph, A_dense, qh,
        lh.reshape(B_, -1), uh.reshape(B_, -1), rho_vec.reshape(B_, -1),
    )


@pytest.mark.parametrize("n_iters", [5, 30])
def test_kernel_matches_xla_core(n_iters):
    Ph, A, qh, l, u, rho = _scaled_mpc_batch(8)
    B = Ph.shape[0]
    x0 = jnp.zeros((B, 120))
    z0 = jnp.zeros((B, 240))
    y0 = jnp.zeros((B, 240))
    x_k, z_k, y_k = fused_admm_solve(
        Ph, A, qh, l, u, rho, x0, z0, y0, n_iters=n_iters, interpret=True
    )
    x_r, z_r, y_r = _reference_iteration(
        Ph, A, qh, l, u, rho, x0, z0, y0, n_iters
    )
    # f32 accumulation differs (Cholesky-substitution inverse vs LU inverse);
    # relative deviation stays ~2e-4 over 30 iterations
    np.testing.assert_allclose(np.array(x_k), np.array(x_r), atol=2e-2)
    np.testing.assert_allclose(np.array(z_k), np.array(z_r), atol=5e-2)


def test_kernel_reaches_solver_quality():
    """30 kernel iterations land near the XLA solver's converged solution."""
    from biped_mpc_py_tpu.control.mpc import solve_mpc

    Ph, A, qh, l, u, rho = _scaled_mpc_batch(8)
    B = Ph.shape[0]
    x_k, _, _ = fused_admm_solve(
        Ph, A, qh, l, u, rho,
        jnp.zeros((B, 120)), jnp.zeros((B, 240)), jnp.zeros((B, 240)),
        n_iters=120, interpret=True,
    )
    x_r, _, _ = _reference_iteration(
        Ph, A, qh, l, u, rho,
        jnp.zeros((B, 120)), jnp.zeros((B, 240)), jnp.zeros((B, 240)), 120,
    )
    np.testing.assert_allclose(np.array(x_k), np.array(x_r), atol=3e-2)


def test_solve_qp_batch_backends_agree():
    """solve_qp_batch(pallas, interpret) == solve_qp_batch(xla) on the MPC
    workload (no polish, same iterations)."""
    import dataclasses
    from biped_mpc_py_tpu.control.gait import contact_sequence
    from biped_mpc_py_tpu.control.mpc import build_mpc_qp
    from biped_mpc_py_tpu.ops.qp import solve_qp_batch

    mpc = dataclasses.replace(
        MpcConfig(), n_admm_iters=30, admm_rho_phases=1, admm_polish=False
    )
    biped = BipedParams()
    contact = contact_sequence(0.0, mpc, GaitConfig())
    rng = np.random.default_rng(1)
    n = 8
    xs = jnp.asarray(
        rng.normal(size=(n, 12)) * 0.05
        + np.array([0, 0, 0, 0, 0, 0.53, 0, 0, 0, 0, 0, 0]),
        jnp.float32,
    )
    foot = jnp.tile(
        jnp.asarray([-0.02, 0.09, 0, -0.02, -0.09, 0], jnp.float32), (n, 1)
    )
    qp = jax.vmap(lambda x, f: build_mpc_qp(x, 0.0, f, mpc, biped, contact))(
        xs, foot
    )
    sol_x = solve_qp_batch(qp, mpc, backend="xla")
    sol_p = solve_qp_batch(qp, mpc, backend="pallas", interpret=True)
    np.testing.assert_allclose(
        np.array(sol_p.controls), np.array(sol_x.controls), atol=5e-2
    )
    np.testing.assert_allclose(
        np.array(sol_p.states), np.array(sol_x.states), atol=5e-3
    )
