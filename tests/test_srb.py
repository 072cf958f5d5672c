"""L4 SRB linearization parity (C7) with documented convention deviations."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from biped_mpc_py_tpu.config import MpcConfig
from biped_mpc_py_tpu.models.biped import BipedParams
from biped_mpc_py_tpu.models.srb import linearize, linearize_horizon

from tests._reference import load_reference, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not mounted"
)


def _ref_x(x_new):
    """Map canonical [roll,pitch,yaw,...] to the reference dynamics path's
    [yaw,pitch,roll,...] state order (bipedalLocomotionMPC.py:151-153)."""
    x = np.array(x_new, float).copy()
    x[0], x[2] = x_new[2], x_new[0]
    return x


def _compare(x_new, foot, atol=1e-6):
    ref, _ = load_reference()
    mpc, biped = MpcConfig(), BipedParams()
    A_ref, B_ref = ref.get_simplified_dynamics(
        ref.MPC(), ref.Biped(), _ref_x(x_new), np.array(foot, float)
    )
    A, B = linearize(mpc, biped, jnp.asarray(x_new), jnp.asarray(foot))
    np.testing.assert_allclose(np.array(A), A_ref, atol=atol)
    np.testing.assert_allclose(np.array(B), B_ref, atol=atol)


def test_linearize_matches_reference_zero_attitude(rng):
    for _ in range(5):
        x = np.zeros(13)
        x[3:12] = rng.normal(size=9) * 0.4
        x[12] = 1.0
        foot = rng.normal(size=6) * 0.3
        _compare(x, foot)


@pytest.mark.parametrize("axis", [0, 1, 2])
def test_linearize_matches_reference_single_axis_attitude(rng, axis):
    # canonical intrinsic ZYX and the reference's extrinsic zyx rotations
    # coincide for single-axis attitudes — parity must be exact there
    for _ in range(3):
        x = np.zeros(13)
        x[axis] = rng.uniform(-0.8, 0.8)
        x[3:12] = rng.normal(size=9) * 0.4
        x[12] = 1.0
        _compare(x, rng.normal(size=6) * 0.3, atol=1e-5)


def test_linearize_general_attitude_A_matches(rng):
    # the A matrix involves only the Euler-rate inverse (same pitch/yaw in
    # both conventions) -> must match even at general attitude
    ref, _ = load_reference()
    x = np.zeros(13)
    x[0:3] = rng.uniform(-0.5, 0.5, 3)
    x[3:12] = rng.normal(size=9) * 0.3
    x[12] = 1.0
    foot = rng.normal(size=6) * 0.2
    A_ref, B_ref = ref.get_simplified_dynamics(
        ref.MPC(), ref.Biped(), _ref_x(x), foot
    )
    A, _ = linearize(MpcConfig(), BipedParams(), jnp.asarray(x), jnp.asarray(foot))
    np.testing.assert_allclose(np.array(A), A_ref, atol=1e-5)


def test_linearize_horizon_batches(rng):
    mpc, biped = MpcConfig(), BipedParams()
    x_ref = jnp.asarray(rng.normal(size=(13, 10)) * 0.2)
    foot_ref = jnp.asarray(rng.normal(size=(6, 10)) * 0.2)
    A, B = jax.jit(lambda x, f: linearize_horizon(mpc, biped, x, f))(x_ref, foot_ref)
    assert A.shape == (10, 13, 13) and B.shape == (10, 13, 12)
    A0, B0 = linearize(mpc, biped, x_ref[:, 0], foot_ref[:, 0])
    np.testing.assert_allclose(np.array(A[0]), np.array(A0), atol=1e-6)
    np.testing.assert_allclose(np.array(B[0]), np.array(B0), atol=1e-6)


def test_forward_euler_structure(rng):
    # A = I + Ac dt: gravity feeds vz via the augmented state; positions
    # integrate velocities
    mpc, biped = MpcConfig(), BipedParams()
    x = jnp.zeros(13).at[12].set(1.0).at[5].set(0.55)
    A, B = linearize(mpc, biped, x, jnp.zeros(6))
    A = np.array(A)
    np.testing.assert_allclose(A[11, 12], -biped.g * mpc.dt, atol=1e-6)
    np.testing.assert_allclose(A[3, 9], mpc.dt, atol=1e-6)
    np.testing.assert_allclose(np.array(B)[9:12, 0:3], np.eye(3) / biped.m * mpc.dt, atol=1e-7)
