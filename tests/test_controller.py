"""L5/L6: swing PD, torque mapping, and the full golden control tick.

The parity chain for the full tick (SURVEY.md §4 golden-value tests):
reference assembly + certified IPM oracle give golden (states, controls); the
reference's own lowLevelControl maps the golden u0 to golden torques; the
framework's fused control_tick must land on the same torques.
"""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from biped_mpc_py_tpu.config import GaitConfig, MpcConfig
from biped_mpc_py_tpu.control.controller import ControllerState, control_tick
from biped_mpc_py_tpu.control.lowlevel import low_level_control
from biped_mpc_py_tpu.control.swing import swing_leg_force
from biped_mpc_py_tpu.models.biped import (
    BipedParams,
    HECTOR_LEG_FK,
    HECTOR_LEG_JAC,
)

from tests._reference import load_reference, reference_available
from tests.oracle_qp import solve_qp_ipm

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not mounted"
)


def _parity_setup():
    """Configs replicating the reference bit-for-bit (compat flags on,
    mismatched FK/Jacobian geometries as in the reference)."""
    ref, fake = load_reference()
    mpc = dataclasses.replace(
        MpcConfig(),
        compat_foot_ref_bug=True,
        compat_force_box_bug=True,
        compat_swing_yaw_bug=True,
        compat_ref_col0_bug=True,
        compat_swing_frame_bug=True,
    )
    biped = BipedParams(leg=HECTOR_LEG_FK, leg_jac=HECTOR_LEG_JAC)
    return ref, fake, mpc, biped


def test_swing_leg_force_matches_reference(rng):
    ref, _, mpc, _ = _parity_setup()
    for _ in range(10):
        x_fb = rng.normal(size=12) * 0.3
        t = rng.uniform(0, 1)
        pf = rng.normal(size=3) * 0.2
        vf = rng.normal(size=3) * 0.5
        for side in (1, -1):
            F_ref = ref.swingLegControl(
                x_fb, t, pf.reshape(3, 1), vf.reshape(3, 1), ref.MPC(), side
            ).reshape(-1)
            F_new = np.array(
                swing_leg_force(
                    jnp.asarray(x_fb), t, jnp.asarray(pf), jnp.asarray(vf),
                    mpc, float(side),
                )
            )
            np.testing.assert_allclose(F_new, F_ref, atol=1e-3)


def test_low_level_control_matches_reference(rng):
    ref, _, mpc, biped = _parity_setup()
    for trial in range(8):
        x_fb = rng.normal(size=12) * 0.2
        t = rng.uniform(0, 1)
        q = rng.uniform(-1, 1, 10)
        qd = rng.normal(size=10)
        u0 = rng.normal(size=12) * 50
        contact = ref.get_contact_sequence(t, ref.MPC())
        pf_w = ref.getFootPositionWorld(x_fb, q, ref.Biped())
        tau_ref = ref.lowLevelControl(
            x_fb, t, pf_w, q, qd, ref.MPC(), ref.Biped(), contact,
            u0.reshape(-1, 1),
        ).reshape(-1)
        tau_new = np.array(
            low_level_control(
                jnp.asarray(x_fb), t, jnp.asarray(pf_w.reshape(-1)),
                jnp.asarray(q), jnp.asarray(qd), mpc, biped,
                jnp.asarray(contact), jnp.asarray(u0),
            )
        )
        np.testing.assert_allclose(tau_new, tau_ref, atol=5e-3, err_msg=f"trial {trial}")


@pytest.fixture(scope="module")
def golden_tick():
    """Golden full tick: reference QP -> certified oracle -> reference
    lowLevelControl. Returns everything needed to check the fused tick."""
    ref, fake, mpc, biped = _parity_setup()
    cap = fake.solvers.captured[0]
    x_opt, info = solve_qp_ipm(
        cap["P"], cap["q"], G=cap["G"], h=cap["h"], A=cap["A"], b=cap["b"]
    )
    assert info["status"] == "optimal"
    states = x_opt[:130].reshape(10, 13)
    controls = x_opt[130:].reshape(10, 12)
    contact = ref.get_contact_sequence(0, ref.MPC())
    pf_w = ref.getFootPositionWorld(ref.x_fb, ref.q, ref.Biped())
    tau = ref.lowLevelControl(
        ref.x_fb, 0, pf_w, ref.q, ref.qd, ref.MPC(), ref.Biped(), contact,
        controls[0].reshape(-1, 1),
    ).reshape(-1)
    return ref, mpc, biped, states, controls, tau


def test_full_tick_matches_golden(golden_tick):
    ref, mpc, biped, states_g, controls_g, tau_g = golden_tick
    gait = GaitConfig()
    x_fb = jnp.asarray(ref.x_fb, jnp.float32)
    q = jnp.asarray(ref.q, jnp.float32)
    qd = jnp.asarray(ref.qd, jnp.float32)
    tau, _, sol = jax.jit(
        lambda x, q, qd: control_tick(x, q, qd, 0.0, mpc, gait, biped)
    )(x_fb, q, qd)
    np.testing.assert_allclose(np.array(sol.controls), controls_g, atol=0.05)
    np.testing.assert_allclose(np.array(sol.states), states_g, atol=1e-3)
    np.testing.assert_allclose(np.array(tau), tau_g, atol=0.02)
    # persist the golden tick for reference-free runs
    import os

    out = os.path.join(os.path.dirname(__file__), "golden", "tick_t0_walking.npz")
    np.savez(
        out, states=states_g, controls=controls_g, tau=tau_g,
        x_fb=ref.x_fb, q=ref.q, qd=ref.qd,
    )


def test_full_tick_standing(golden_tick):
    ref, mpc, biped, *_ = golden_tick
    gait = GaitConfig(gait_mode=0)
    tau, _, sol = control_tick(
        jnp.asarray(ref.x_fb, jnp.float32),
        jnp.asarray(ref.q, jnp.float32),
        jnp.asarray(ref.qd, jnp.float32),
        0.0, mpc, gait, biped,
    )
    fz = np.array(sol.controls)[0, [2, 5]]
    assert (fz > 20).all()  # both feet loaded
    assert np.isfinite(np.array(tau)).all()


def test_tick_warm_start_stable(golden_tick):
    ref, mpc, biped, *_ = golden_tick
    gait = GaitConfig()
    x_fb = jnp.asarray(ref.x_fb, jnp.float32)
    q = jnp.asarray(ref.q, jnp.float32)
    qd = jnp.asarray(ref.qd, jnp.float32)
    tau0, cs, sol0 = control_tick(x_fb, q, qd, 0.0, mpc, gait, biped)
    tau1, _, sol1 = control_tick(x_fb, q, qd, 0.0, mpc, gait, biped, cs)
    np.testing.assert_allclose(np.array(tau1), np.array(tau0), atol=1e-3)
