"""The QP chain (C8+C9): reference assembly -> IPM oracle -> condensation ->
ADMM, each link certified against the previous one."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from biped_mpc_py_tpu.config import GaitConfig, MpcConfig
from biped_mpc_py_tpu.control.gait import contact_sequence
from biped_mpc_py_tpu.control.mpc import build_mpc_qp, solve_mpc
from biped_mpc_py_tpu.models.biped import BipedParams
from biped_mpc_py_tpu.ops.qp import solve_qp

from tests._reference import load_reference, reference_available
from tests.oracle_qp import kkt_residuals, solve_qp_ipm

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not mounted"
)

H = 10


def _reference_tick_qp():
    """The QP the reference assembled for its own import-time tick (t=0,
    walking), captured through the fake cvxopt."""
    ref, fake = load_reference()
    return ref, fake.solvers.captured[0]


def _expand_condensed_constraints(qp):
    """CondensedQp (A_step, l, u) -> stacked one-sided (G, h) for the oracle."""
    A_step = np.array(qp.A_step, float)
    l = np.array(qp.l, float)
    u = np.array(qp.u, float)
    h_, m = l.shape
    n = 12 * h_
    G_rows, h_rows = [], []
    for k in range(h_):
        blk = np.zeros((m, n))
        blk[:, 12 * k : 12 * (k + 1)] = A_step
        # drop FREE bounds (e.g. disabled torsional-cone rows): a 0·x <= BIG
        # row is harmless to ADMM but degenerate for the IPM oracle
        upper = u[k] < 1e19
        G_rows.append(blk[upper])
        h_rows.append(u[k][upper])
        lower = l[k] > -1e19
        G_rows.append(-blk[lower])
        h_rows.append(-l[k][lower])
    return np.vstack(G_rows), np.concatenate(h_rows)


@pytest.fixture(scope="module")
def tick_golden():
    """Oracle solution of the reference's own captured t=0 walking QP."""
    ref, cap = _reference_tick_qp()
    x, info = solve_qp_ipm(
        cap["P"], cap["q"], G=cap["G"], h=cap["h"], A=cap["A"], b=cap["b"]
    )
    assert info["status"] == "optimal"
    res = kkt_residuals(
        x, cap["P"], cap["q"], cap["G"], cap["h"], cap["A"], cap["b"],
        z=info["z"], y=info["y"],
    )
    assert max(res.values()) < 1e-7, res
    states = x[: 13 * H].reshape(H, 13)
    controls = x[13 * H :].reshape(H, 12)
    return ref, cap, states, controls


def test_oracle_reference_tick_solution_sane(tick_golden):
    _, _, states, controls = tick_golden
    # height stays in a physically plausible band (the optimum dips during
    # the single-stance phase, then recovers toward the 0.55 command)
    assert 0.3 < states[:, 5].min() and states[:, 5].max() < 0.6
    assert states[-1, 5] > states[:, 5].min()  # recovering by horizon end
    # left foot in stance at t=0: fz>0 on foot 1, foot 2 forced to 0
    assert controls[0, 2] > 50.0  # left fz carries weight
    np.testing.assert_allclose(controls[0, 3:6], 0, atol=1e-7)  # right swing


def _framework_tick_inputs(ref):
    mpc = dataclasses.replace(MpcConfig(), compat_foot_ref_bug=True, compat_force_box_bug=True, compat_ref_col0_bug=True)
    biped = BipedParams()
    x_fb = jnp.asarray(ref.x_fb, jnp.float32)
    foot = jnp.asarray(ref.foot, jnp.float32)
    contact = contact_sequence(0.0, mpc, GaitConfig())
    return mpc, biped, x_fb, foot, contact


def test_condensation_equivalent_to_reference_qp(tick_golden):
    """Oracle-solve the CONDENSED QP; controls/states must match the oracle
    solution of the reference's own 250-var sparse QP — proving condensation
    is lossless."""
    ref, cap, states_ref, controls_ref = tick_golden
    mpc, biped, x_fb, foot, contact = _framework_tick_inputs(ref)
    qp = build_mpc_qp(x_fb, 0.0, foot, mpc, biped, contact)
    G, h_vec = _expand_condensed_constraints(qp)
    U, info = solve_qp_ipm(np.array(qp.P, float), np.array(qp.q, float), G=G, h=h_vec)
    assert info["status"] == "optimal"
    controls = U.reshape(H, 12)
    np.testing.assert_allclose(controls, controls_ref, atol=2e-3)
    states = (
        np.einsum("kij,j->ki", np.array(qp.Sx, float), np.array(qp.x0, float))
        + np.array(qp.Su, float) @ U
    )
    np.testing.assert_allclose(states, states_ref, atol=1e-4)


def test_admm_matches_oracle_on_reference_tick(tick_golden):
    ref, cap, states_ref, controls_ref = tick_golden
    mpc, biped, x_fb, foot, contact = _framework_tick_inputs(ref)
    sol = jax.jit(
        lambda x, f, c: solve_mpc(x, 0.0, f, mpc, biped, c)
    )(x_fb, foot, contact)
    # res_dual is reported from the pre-polish ADMM duals (the polished x is
    # far more accurate than the dual residual suggests — see controls check)
    assert float(sol.res_prim) < 1e-4 and float(sol.res_dual) < 0.05, (
        float(sol.res_prim), float(sol.res_dual),
    )
    # forces within 0.05 N of the interior-point golden solution (f32 floor
    # after active-set polish is ~0.01 N on a ~120 N scale)
    np.testing.assert_allclose(np.array(sol.controls), controls_ref, atol=0.05)
    np.testing.assert_allclose(np.array(sol.states), states_ref, atol=1e-3)


def test_admm_warm_start_converges_fast(tick_golden):
    ref, *_ = tick_golden
    mpc, biped, x_fb, foot, contact = _framework_tick_inputs(ref)
    sol = solve_mpc(x_fb, 0.0, foot, mpc, biped, contact)
    mpc_short = dataclasses.replace(mpc, n_admm_iters=5)
    warm = solve_mpc(x_fb, 0.0, foot, mpc_short, biped, contact, warm=sol)
    np.testing.assert_allclose(
        np.array(warm.controls), np.array(sol.controls), atol=0.2
    )


def test_admm_standing_double_stance(tick_golden):
    ref, *_ = tick_golden
    mpc, biped, x_fb, foot, _ = _framework_tick_inputs(ref)
    contact = jnp.ones((H, 2))
    sol = solve_mpc(x_fb, 0.0, foot, mpc, biped, contact)
    qp = build_mpc_qp(x_fb, 0.0, foot, mpc, biped, contact)
    G, h_vec = _expand_condensed_constraints(qp)
    U, info = solve_qp_ipm(np.array(qp.P, float), np.array(qp.q, float), G=G, h=h_vec)
    np.testing.assert_allclose(np.array(sol.controls), U.reshape(H, 12), atol=0.5)
    # weight shared: both feet push up ~ mg/2 across the horizon
    fz = np.array(sol.controls)[:, [2, 5]]
    np.testing.assert_allclose(fz.sum(1).mean(), biped.m * biped.g, rtol=0.3)


def test_admm_batch_consistency(tick_golden):
    """vmap(solve) on N identical problems == N x single solve (SURVEY §4)."""
    ref, *_ = tick_golden
    mpc, biped, x_fb, foot, contact = _framework_tick_inputs(ref)
    single = solve_mpc(x_fb, 0.0, foot, mpc, biped, contact)
    xs = jnp.tile(x_fb, (4, 1))
    fs = jnp.tile(foot, (4, 1))
    batched = jax.vmap(lambda x, f: solve_mpc(x, 0.0, f, mpc, biped, contact))(xs, fs)
    for i in range(4):
        np.testing.assert_allclose(
            np.array(batched.controls[i]), np.array(single.controls), atol=1e-4
        )


def test_admm_random_box_qps(rng):
    """ADMM vs oracle on random strictly-convex QPs with the same block
    structure (generality beyond the MPC instance)."""
    from biped_mpc_py_tpu.ops.qp import CondensedQp

    mpc = dataclasses.replace(MpcConfig(), n_admm_iters=150, admm_rho=1.0)
    for trial in range(3):
        n = 12 * H
        M = rng.normal(size=(n, n)) / np.sqrt(n)
        P = M @ M.T + 0.1 * np.eye(n)
        q = rng.normal(size=n)
        A_step = np.vstack([np.eye(12), rng.normal(size=(4, 12)) * 0.5])
        u = np.abs(rng.normal(size=(H, 16))) + 0.5
        l = -np.abs(rng.normal(size=(H, 16))) - 0.5
        qp = CondensedQp(
            P=jnp.asarray(P, jnp.float32),
            q=jnp.asarray(q, jnp.float32),
            A_step=jnp.asarray(A_step, jnp.float32),
            l=jnp.asarray(l, jnp.float32),
            u=jnp.asarray(u, jnp.float32),
            Sx=jnp.zeros((H, 13, 13), jnp.float32),
            Su=jnp.zeros((H, 13, n), jnp.float32),
            x0=jnp.zeros(13, jnp.float32),
        )
        sol = jax.jit(lambda qp: solve_qp(qp, mpc))(qp)
        G, h_vec = _expand_condensed_constraints(qp)
        x_star, info = solve_qp_ipm(P, q, G=G, h=h_vec)
        assert info["status"] == "optimal"
        np.testing.assert_allclose(
            np.array(sol.controls).reshape(-1), x_star, atol=5e-3,
            err_msg=f"trial {trial}",
        )


def test_sparse_assembly_matches_reference_matrices(tick_golden):
    """sparse_qp_matrices reproduces the reference's captured 250-var QP
    bit-for-bit (H, f, Aeq, beq, G, h) — C8 assembly parity."""
    from biped_mpc_py_tpu.control.reference import com_reference, foot_reference
    from biped_mpc_py_tpu.models.srb import linearize_horizon
    from biped_mpc_py_tpu.ops.qp import sparse_qp_matrices

    ref, cap, *_ = tick_golden
    mpc, biped, x_fb, foot, contact = _framework_tick_inputs(ref)
    x_ref = com_reference(x_fb, mpc)
    foot_ref = foot_reference(x_fb, 0.0, foot, mpc, contact)
    A, B = linearize_horizon(mpc, biped, x_ref, foot_ref)
    H, f, Aeq, beq, G, h_vec = sparse_qp_matrices(
        mpc, biped, x_fb, x_ref, A, B, contact
    )
    np.testing.assert_allclose(np.array(H), cap["P"], atol=1e-4)
    np.testing.assert_allclose(np.array(f), cap["q"], atol=1e-3)
    np.testing.assert_allclose(np.array(Aeq), cap["A"], atol=1e-5)
    np.testing.assert_allclose(np.array(beq), cap["b"], atol=1e-5)
    np.testing.assert_allclose(np.array(G), cap["G"], atol=1e-5)
    np.testing.assert_allclose(np.array(h_vec), cap["h"], atol=1e-4)


def test_admm_extreme_states_stay_finite(tick_golden):
    """Solver robustness: extreme feedback states (post-shove, mid-fall)
    produce finite, bounded solutions — the failure-detection contract
    (residuals reported, no NaNs) holds far off-nominal."""
    ref, *_ = tick_golden
    mpc, biped, _, foot, contact = _framework_tick_inputs(ref)
    rng_l = np.random.default_rng(11)
    for trial in range(4):
        x_fb = jnp.asarray(
            rng_l.normal(size=12) * np.array([0.4] * 3 + [0.5] * 3 + [2.0] * 6),
            jnp.float32,
        ).at[5].set(0.3 + 0.4 * rng_l.random())
        sol = solve_mpc(x_fb, 0.12, foot, mpc, biped, contact)
        assert np.isfinite(np.array(sol.controls)).all(), trial
        assert np.isfinite(float(sol.res_prim))
        # force bounds respected to within the fixed-iteration tolerance
        # (sub-Newton violations at extreme off-nominal states are expected
        # and REPORTED via res_prim — unlike the reference, which never
        # checks its solver status)
        u = np.array(sol.controls)
        assert (u[:, [2, 5]] <= 500.0 + 1.0).all()
        assert (u[:, [2, 5]] >= -1.0).all()
        assert float(sol.res_prim) < 5.0


def test_ns_inverse_bf16_hybrid(tick_golden):
    """The bf16-climb + f32-refine Newton-Schulz hybrid (fast_mpc_config's
    kinv_bf16_iters) reaches the behavioral accuracy band on the real MPC
    KKT matrix: bf16 rounding in the climb phase is self-corrected by the
    final f32 steps (ops/qp.py::ns_inverse)."""
    from biped_mpc_py_tpu.ops.qp import (
        condense, ns_inverse, ruiz_equilibrate,
    )
    from biped_mpc_py_tpu.control.reference import com_reference, foot_reference
    from biped_mpc_py_tpu.models.srb import linearize_horizon

    mpc, biped, gait = MpcConfig(), BipedParams(), GaitConfig()
    x_fb = jnp.asarray(
        [0.02, -0.01, 0.1, 0.05, 0.02, 0.54, 0.1, 0.0, 0.2, 0.25, 0.05, 0.0],
        jnp.float32,
    )
    t = jnp.asarray(0.48)
    foot = jnp.asarray([0.03, 0.09, 0.0, 0.06, -0.09, 0.0], jnp.float32)
    contact = contact_sequence(t, mpc, gait)
    x_ref = com_reference(x_fb, mpc)
    foot_ref = foot_reference(x_fb, t, foot, mpc, contact, gait)
    A, B = linearize_horizon(mpc, biped, x_ref, foot_ref)
    qp = condense(mpc, biped, x_fb, x_ref, A, B, contact)
    Ph, qh, Ah, lh, uh, D, E, c = ruiz_equilibrate(qp)
    rho = jnp.where((uh - lh) < 1e-6, 0.3e3, 0.3)
    AtRA = jnp.einsum("kji,kj,kjl->kil", Ah, rho, Ah)
    idx = jnp.arange(120).reshape(10, 12)
    K = (Ph + 1e-6 * jnp.eye(120)).at[
        idx[:, :, None], idx[:, None, :]
    ].add(AtRA)

    eye = jnp.eye(120)
    res = lambda X: float(jnp.max(jnp.abs(eye - K @ X)))
    r_f32 = res(ns_inverse(K, 10))
    r_hyb = res(ns_inverse(K, 10, 8))
    # the hybrid lands in the same behavioral band as all-f32 NS(10)
    # (closed-loop degradation starts only around residual ~6e-2)
    assert r_hyb < 2e-2, r_hyb
    assert r_f32 < 2e-2, r_f32
    # and the full-f32 tail exists: all-bf16 would plateau well above this
    r_floor = res(ns_inverse(K, 14))
    assert r_floor < 5e-5, r_floor


def test_torsional_cone_binds_with_load(tick_golden):
    """The load-dependent torsional cone |m_z| <= mu_z f_z
    (ops/qp.py::torsional_rows): an aggressive yaw-rate command that the
    33.5 N m reference box would satisfy with an untransmissible couple is
    clipped to the load-proportional bound, per stance foot, per step."""
    ref, cap, *_ = tick_golden
    mu_z = 0.035
    # an aggressive yaw-rate step with a heavier wz tracking weight so the
    # planned couple demand (~5.5 N m) exceeds the stance foot's
    # transmissible bound (~0.035 * 140 N ~ 4.9 N m)
    x_cmd = jnp.zeros(12).at[5].set(0.55).at[8].set(4.0)
    Q = jnp.array(
        [500, 100, 100, 300, 300, 700, 1, 1, 20, 1, 1, 1, 1], jnp.float32
    )
    mpc = dataclasses.replace(MpcConfig(), mu_z=mu_z, x_cmd=x_cmd, Q=Q)
    biped = BipedParams()
    x_fb = jnp.zeros(12).at[5].set(0.55)
    foot = jnp.asarray([-0.02, 0.09, 0.0, -0.02, -0.09, 0.0], jnp.float32)
    contact = contact_sequence(0.0, mpc, GaitConfig())
    sol = solve_mpc(x_fb, 0.0, foot, mpc, biped, contact)
    u = np.array(sol.controls)  # (h,12)
    for foot_i, (fz, mz) in enumerate(((2, 8), (5, 11))):
        viol = np.abs(u[:, mz]) - mu_z * u[:, fz]
        assert np.all(viol < 5e-2), (foot_i, viol)
    # and the cone actually BINDS: without it, the same tick plans a couple
    # that VIOLATES the transmissibility inequality somewhere
    mpc_off = dataclasses.replace(mpc, mu_z=None)
    sol_off = solve_mpc(x_fb, 0.0, foot, mpc_off, biped, contact)
    u_off = np.array(sol_off.controls)
    viol_off = max(
        np.max(np.abs(u_off[:, mz]) - mu_z * u_off[:, fz])
        for fz, mz in ((2, 8), (5, 11))
    )
    assert viol_off > 0.5, viol_off


def test_torsional_cone_disabled_is_bit_identical(tick_golden):
    """mu_z=None builds the 24-row problem outright (ops/qp.py::m_step —
    smaller kernel padding); appending 4 all-zero rows with free bounds
    must leave the solution numerically identical, proving the omission
    is exact (golden-parity safety)."""
    ref, cap, *_ = tick_golden
    mpc = MpcConfig()
    biped = BipedParams()
    x_fb = jnp.asarray(ref.x_fb, jnp.float32)
    foot = jnp.asarray([-0.02, 0.09, 0.0, -0.02, -0.09, 0.0], jnp.float32)
    contact = contact_sequence(0.0, mpc, GaitConfig())
    qp = build_mpc_qp(x_fb, 0.0, foot, mpc, biped, contact)
    assert qp.A_step.shape == (24, 12)
    h = qp.l.shape[0]
    big = jnp.full((h, 4), 1e20, qp.l.dtype)
    qp28 = dataclasses.replace(
        qp,
        A_step=jnp.concatenate(
            [qp.A_step, jnp.zeros((4, 12), qp.A_step.dtype)], axis=0
        ),
        l=jnp.concatenate([qp.l, -big], axis=1),
        u=jnp.concatenate([qp.u, big], axis=1),
    )
    sol24 = solve_qp(qp, mpc)
    sol28 = solve_qp(qp28, mpc)
    np.testing.assert_allclose(
        np.array(sol24.controls), np.array(sol28.controls), atol=2e-4
    )


def test_line_foot_rows_foot_frame_tilt_composition():
    """Foot-frame rollover rows compose heading ON the measured attitude
    (ops/qp.py::line_foot_rows, round 5): Rz(psi - yaw) @ R. Three pinned
    identities: (a) zero hip-yaw reduces to the reference's body-aligned
    rows (``bipedalLocomotionMPC.py:253-263``); (b) on a pure z-rotation
    attitude it reduces to the round-3 pure-Rz(psi) form; (c) on a pitched
    attitude the rows KEEP the tilt (the round-3 form lost it — the
    documented flat-ground caveat this composition removes)."""
    from biped_mpc_py_tpu.ops.qp import _rz, line_foot_rows
    from biped_mpc_py_tpu.ops.rotations import eul2rotm

    biped = BipedParams()
    yaw = 0.4

    # (a) zero hip-yaw on a tilted attitude == body-aligned rows
    R_tilt = eul2rotm(jnp.array([0.1, 0.2, yaw], jnp.float32))
    rows_none = np.array(line_foot_rows(biped, R_tilt))
    rows_zero = np.array(
        line_foot_rows(biped, R_tilt, foot_yaw=jnp.array([yaw, yaw]))
    )
    np.testing.assert_allclose(rows_zero, rows_none, atol=1e-6)

    # (b) pure z-rotation attitude: per-foot rows == body-aligned rows
    # evaluated at Rz(psi_foot)
    psi = np.array([yaw + 0.3, yaw - 0.2], np.float32)
    R_yaw = eul2rotm(jnp.array([0.0, 0.0, yaw], jnp.float32))
    rows = np.array(line_foot_rows(biped, R_yaw, foot_yaw=jnp.asarray(psi)))
    rows_l = np.array(
        line_foot_rows(biped, eul2rotm(jnp.array([0.0, 0.0, psi[0]])))
    )
    rows_r = np.array(
        line_foot_rows(biped, eul2rotm(jnp.array([0.0, 0.0, psi[1]])))
    )
    np.testing.assert_allclose(rows[:2], rows_l[:2], atol=1e-6)
    np.testing.assert_allclose(rows[2:], rows_r[2:], atol=1e-6)

    # (c) pitched attitude + hip-yaw: the heel row is built from the
    # COMPOSED frame Rz(dpsi) @ R (keeps the pitch), not from the flat
    # Rz(psi) frame
    dpsi = 0.3
    R_pitch = eul2rotm(jnp.array([0.0, 0.15, yaw], jnp.float32))
    rows_t = np.array(
        line_foot_rows(
            biped, R_pitch, foot_yaw=jnp.array([yaw + dpsi, yaw + dpsi])
        )
    )
    Rl = np.array(_rz(jnp.asarray(dpsi, jnp.float32))) @ np.array(R_pitch)
    lh = float(biped.lh) - 0.02
    np.testing.assert_allclose(rows_t[0, :3], -lh * Rl[:, 2], atol=1e-6)
    np.testing.assert_allclose(rows_t[0, 6:9], Rl[:, 1], atol=1e-6)
    rows_flat = np.array(
        line_foot_rows(biped, eul2rotm(jnp.array([0.0, 0.0, yaw + dpsi])))
    )
    assert not np.allclose(rows_t[:2, :3], rows_flat[:2, :3], atol=1e-3)
