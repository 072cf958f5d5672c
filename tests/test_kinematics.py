"""L2 kinematics: parity with BOTH reference symbolic blocks + autodiff
consistency (the property the reference lacks, SURVEY.md §4)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from biped_mpc_py_tpu.models import kinematics as kin
from biped_mpc_py_tpu.models.biped import (
    BipedParams,
    HECTOR_LEG_FK,
    HECTOR_LEG_JAC,
)

from tests._reference import load_reference, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not mounted"
)


def _rand_q(rng):
    return rng.uniform(-1.2, 1.2, 5)


def test_fk_body_matches_reference(rng):
    ref, _ = load_reference()
    for _ in range(30):
        q = _rand_q(rng)
        for side in (1, -1):
            pf_ref = ref.getFootPositionBody(*q, side)
            pf_new = np.array(
                kin.leg_fk_body(jnp.asarray(q), float(side), HECTOR_LEG_FK)
            )
            np.testing.assert_allclose(pf_new, pf_ref, atol=2e-6)


def test_jacobian_matches_reference(rng):
    # jacfwd of OUR chain with the JAC geometry preset reproduces the
    # reference's hand-exported 6x5 Jm (bipedalLocomotionMPC.py:306-365)
    ref, _ = load_reference()
    for _ in range(30):
        q = _rand_q(rng)
        for side in (1, -1):
            Jm_ref, Jf_ref = ref.getLegKinematics(*q, side)
            Jm_new, Jf_new = kin.leg_jacobians(
                jnp.asarray(q), float(side), HECTOR_LEG_JAC
            )
            np.testing.assert_allclose(np.array(Jm_new), Jm_ref, atol=2e-6)
            np.testing.assert_allclose(np.array(Jf_new), Jf_ref, atol=2e-6)


def test_reference_fk_vs_jacobian_inconsistency_documented(rng):
    """The reference's own Jm does NOT equal d(FK)/dq (different constants).

    This pins the inconsistency documented in models/biped.py: finite
    differences of the reference FK disagree with the reference Jacobian by
    ~1e-2, while our jacfwd matches our FK to machine precision.
    """
    ref, _ = load_reference()
    q = _rand_q(np.random.default_rng(42))
    eps = 1e-6
    fd = np.zeros((3, 5))
    for j in range(5):
        qp, qm = q.copy(), q.copy()
        qp[j] += eps
        qm[j] -= eps
        fd[:, j] = (
            np.array(ref.getFootPositionBody(*qp, 1))
            - np.array(ref.getFootPositionBody(*qm, 1))
        ) / (2 * eps)
    _, Jf_ref = ref.getLegKinematics(*q, 1)
    assert np.abs(fd - Jf_ref).max() > 1e-3  # reference is self-inconsistent
    # ours is consistent by construction
    _, Jf_ours = kin.leg_jacobians(jnp.asarray(q), 1.0, HECTOR_LEG_FK)
    np.testing.assert_allclose(np.array(Jf_ours), fd, atol=1e-5)


def test_foot_positions_world_matches_reference(rng):
    ref, _ = load_reference()
    biped = BipedParams()
    for _ in range(10):
        x_fb = rng.uniform(-0.3, 0.3, 12)
        q = rng.uniform(-1.0, 1.0, 10)
        pf_ref = ref.getFootPositionWorld(x_fb, q, ref.Biped()).reshape(-1)
        pf_new = np.array(
            kin.foot_positions_world(jnp.asarray(x_fb), jnp.asarray(q), biped)
        )
        np.testing.assert_allclose(pf_new, pf_ref, atol=2e-6)


def test_default_pose_golden():
    # the reference's initial configuration (bipedalLocomotionMPC.py:13-15)
    biped = BipedParams()
    x_fb = jnp.array([0, 0, 0, 0, 0, 0.53, 0, 0, 0, 0, 0, 0], jnp.float32)
    q = jnp.array(
        [0, 0, -np.pi / 4, np.pi / 2, -np.pi / 4, 0, 0, -np.pi / 4, np.pi / 2, -np.pi / 4],
        jnp.float32,
    )
    pf_w = np.array(kin.foot_positions_world(x_fb, q, biped))
    # feet mirrored in y, on/near ground, same x
    np.testing.assert_allclose(pf_w[0], pf_w[3], atol=1e-6)
    np.testing.assert_allclose(pf_w[1], -pf_w[4], atol=1e-6)
    np.testing.assert_allclose(pf_w[2], pf_w[5], atol=1e-6)
    assert abs(pf_w[2]) < 0.06  # near the ground


def test_jacobians_vmap_and_jit(rng):
    q = jnp.asarray(rng.uniform(-1, 1, (64, 5)), jnp.float32)
    sides = jnp.ones((64,), jnp.float32)
    f = jax.jit(jax.vmap(lambda qq, s: kin.leg_jacobians(qq, s, HECTOR_LEG_FK)))
    Jm, Jf = f(q, sides)
    assert Jm.shape == (64, 6, 5) and Jf.shape == (64, 3, 5)
    Jm0, _ = kin.leg_jacobians(q[0], 1.0, HECTOR_LEG_FK)
    np.testing.assert_allclose(np.array(Jm[0]), np.array(Jm0), atol=1e-6)
