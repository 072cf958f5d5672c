"""L3 planning: gait schedule + CoM/foot reference parity (C3, C4, C5)."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from biped_mpc_py_tpu.config import GaitConfig, MpcConfig
from biped_mpc_py_tpu.control.gait import contact_sequence
from biped_mpc_py_tpu.control.reference import com_reference, foot_reference

from tests._reference import load_reference, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not mounted"
)


def test_contact_sequence_matches_reference_all_phases():
    ref, _ = load_reference()
    mpc = MpcConfig()
    gait = GaitConfig()
    ref_mpc = ref.MPC()
    for step in range(25):
        t = step * 0.04 + 0.001
        c_ref = ref.get_contact_sequence(t, ref_mpc)
        c_new = np.array(contact_sequence(t, mpc, gait))
        np.testing.assert_array_equal(c_new, c_ref, err_msg=f"t={t}")


@pytest.mark.parametrize("p", [2, 3, 4, 7])
def test_contact_sequence_nondefault_cadence_phase_continuity(p):
    """Each stance phase lasts exactly p MPC steps over several periods of
    absolute time (regression: a `% h` wrap at gait.py corrupted every
    cadence with 2p != h, ADVICE round 1)."""
    mpc, gait = MpcConfig(), GaitConfig(steps_per_phase=p)
    n_steps = 6 * 2 * p  # six full gait periods
    # Left-stance flag of the window's FIRST column at each absolute step.
    left = np.array(
        [contact_sequence(k * mpc.dt + 1e-3, mpc, gait)[0, 0]
         for k in range(n_steps)]
    )
    expected = ((np.arange(n_steps) % (2 * p)) < p).astype(float)
    np.testing.assert_array_equal(left, expected)
    # And the whole window is consistent: column j at step k equals
    # column 0 at step k+j (the window is a pure slide over one timeline).
    for k in range(0, n_steps - mpc.h, 3):
        win = np.array(contact_sequence(k * mpc.dt + 1e-3, mpc, gait))
        np.testing.assert_array_equal(win[:, 0], expected[k:k + mpc.h])
        np.testing.assert_array_equal(win[:, 1], 1.0 - expected[k:k + mpc.h])


def test_contact_sequence_standing():
    c = np.array(contact_sequence(0.12, MpcConfig(), GaitConfig(gait_mode=0)))
    np.testing.assert_array_equal(c, np.ones((10, 2)))


def test_contact_sequence_jit_vmap():
    mpc, gait = MpcConfig(), GaitConfig()
    ts = jnp.arange(16) * 0.04
    cs = jax.jit(jax.vmap(lambda t: contact_sequence(t, mpc, gait)))(ts)
    assert cs.shape == (16, 10, 2)
    # complementary single stance at every step
    np.testing.assert_array_equal(np.array(cs.sum(-1)), np.ones((16, 10)))


def test_com_reference_matches_reference(rng):
    ref, _ = load_reference()
    mpc = dataclasses.replace(MpcConfig(), compat_ref_col0_bug=True)
    ref_mpc = ref.MPC()
    for _ in range(5):
        x_fb = rng.normal(size=12) * 0.3
        r_ref = ref.get_reference_trajectory(x_fb, ref_mpc)
        r_new = np.array(com_reference(jnp.asarray(x_fb, jnp.float64), mpc))
        np.testing.assert_allclose(r_new, r_ref, atol=1e-6)


def test_com_reference_velocity_command_integration(rng):
    # nonzero commanded velocity -> pose integrates from feedback
    ref, _ = load_reference()
    ref_mpc = ref.MPC()
    x_cmd = np.array([0, 0, 0.3, 0, 0, 0.55, 0, 0, 0.5, 0.4, 0.0, 0], float)
    ref_mpc.x_cmd = x_cmd
    mpc = dataclasses.replace(
        MpcConfig(), x_cmd=jnp.asarray(x_cmd), compat_ref_col0_bug=True
    )
    x_fb = rng.normal(size=12) * 0.2
    r_ref = ref.get_reference_trajectory(x_fb, ref_mpc)
    r_new = np.array(com_reference(jnp.asarray(x_fb), mpc))
    np.testing.assert_allclose(r_new, r_ref, atol=1e-5)


def test_foot_reference_matches_reference_compat(rng):
    # compat_foot_ref_bug=True replicates the reference bit-for-bit,
    # including the ``:87`` x_fb[10] defect
    ref, _ = load_reference()
    ref_mpc = ref.MPC()
    mpc = dataclasses.replace(MpcConfig(), compat_foot_ref_bug=True)
    gait = GaitConfig()
    for step in range(12):
        t = step * 0.04 + 0.001
        x_fb = rng.normal(size=12) * 0.3
        foot = rng.normal(size=6) * 0.2
        contact = ref.get_contact_sequence(t, ref_mpc)
        f_ref = ref.get_reference_foot_trajectory(x_fb, t, foot, ref_mpc, contact)
        f_new = np.array(
            foot_reference(
                jnp.asarray(x_fb), t, jnp.asarray(foot), mpc, jnp.asarray(contact)
            )
        )
        np.testing.assert_allclose(f_new, f_ref, atol=1e-5, err_msg=f"t={t}")


def test_foot_reference_double_stance_tiles_current_foot(rng):
    mpc, x_fb = MpcConfig(), jnp.asarray(rng.normal(size=12))
    foot = jnp.asarray(rng.normal(size=6))
    contact = jnp.ones((10, 2))
    f = np.array(foot_reference(x_fb, 0.0, foot, mpc, contact))
    np.testing.assert_allclose(f, np.tile(np.array(foot)[:, None], (1, 10)), atol=1e-7)


def test_foot_reference_bugfix_only_changes_y2():
    # the corrected default differs from compat only in the y rows of the
    # full-horizon (foot_2) columns
    rng = np.random.default_rng(3)
    x_fb = jnp.asarray(rng.normal(size=12))
    foot = jnp.asarray(rng.normal(size=6))
    mpc_fix = MpcConfig()
    mpc_bug = dataclasses.replace(MpcConfig(), compat_foot_ref_bug=True)
    contact = contact_sequence(0.09, mpc_fix, GaitConfig())  # kk=2 -> 2 foot_2 cols
    f_fix = np.array(foot_reference(x_fb, 0.09, foot, mpc_fix, contact))
    f_bug = np.array(foot_reference(x_fb, 0.09, foot, mpc_bug, contact))
    diff = f_fix != f_bug
    assert diff[:, :8].sum() == 0  # current + foot_1 columns identical
    assert set(np.nonzero(diff[:, 8:])[0]) <= {1, 4}  # only y rows differ


def test_running_contact_sequence_and_swing_clock():
    """The flight-phase (running) schedule, GaitConfig.flight_steps (round 4).

    p=2 f=1: cycle [L L _ R R _] (period 6, neither foot down on the
    flight steps); f=0 must be BIT-identical to the walking formula; the
    per-leg swing clock covers each leg's p+2f-step swing and agrees with
    the shared walking clock inside every swing window.
    """
    from biped_mpc_py_tpu.control.gait import swing_clock

    mpc = MpcConfig()
    run = GaitConfig(steps_per_phase=2, flight_steps=1)
    c = np.array(contact_sequence(0.0, mpc, run))
    np.testing.assert_array_equal(c[:, 0], [1, 1, 0, 0, 0, 0, 1, 1, 0, 0])
    np.testing.assert_array_equal(c[:, 1], [0, 0, 0, 1, 1, 0, 0, 0, 0, 1])
    # flight steps: both flags zero exactly on s % 6 in {2, 5}
    assert (c.sum(axis=1) == np.array([1, 1, 0, 1, 1, 0, 1, 1, 0, 1])).all()

    # f=0 reduces bit-identically to walking at every cadence/phase
    for p in (2, 3, 5):
        for t in np.arange(0.0, 1.0, 0.04):
            walk = GaitConfig(steps_per_phase=p)
            zero = GaitConfig(steps_per_phase=p, flight_steps=0)
            np.testing.assert_array_equal(
                np.array(contact_sequence(jnp.float32(t), mpc, walk)),
                np.array(contact_sequence(jnp.float32(t), mpc, zero)),
            )

    # per-leg clock: left swing spans cycle steps [2, 6) (p+2f=4 steps);
    # right touches down at step 3 and lifts off at step 5
    fl, T = swing_clock(0.081, mpc, run, +1.0, jnp.float32)
    fr, _ = swing_clock(0.081, mpc, run, -1.0, jnp.float32)
    assert abs(float(T) - 0.16) < 1e-6
    assert float(fl) < 0.05  # left just lifted off (swing starts at 0.08)
    assert 0.7 < float(fr) < 0.8  # right in late swing, lands at 0.12
    # walking (f=0): shared clock equals the legacy t mod t_p fraction
    g0 = GaitConfig(steps_per_phase=5)
    f0, T0 = swing_clock(0.13, mpc, g0, -1.0, jnp.float32)
    assert abs(float(T0) - 0.2) < 1e-6
    np.testing.assert_allclose(float(f0), (0.13 % 0.2) / 0.2, rtol=1e-5)


def test_swing_phase_z_vel_matches_numeric_derivative():
    """swing_phase_z_vel is the exact derivative of swing_phase_z on both
    branches (walking shared clock; running per-leg clock with the
    early-landing compression)."""
    from biped_mpc_py_tpu.control.swing import swing_phase_z, swing_phase_z_vel

    eps = 1e-4
    for sin2 in (False, True):
        mpc = dataclasses.replace(
            MpcConfig(), swing_z_sin2=sin2, swing_land_frac=0.8
        )
        for gait, side in (
            (GaitConfig(steps_per_phase=5), None),
            (GaitConfig(steps_per_phase=2, flight_steps=1), +1.0),
            (GaitConfig(steps_per_phase=2, flight_steps=1), -1.0),
        ):
            for t in (0.013, 0.05, 0.11, 0.17):
                z0 = float(swing_phase_z(t - eps, mpc, gait, jnp.float32, side=side))
                z1 = float(swing_phase_z(t + eps, mpc, gait, jnp.float32, side=side))
                dz = float(swing_phase_z_vel(t, mpc, gait, jnp.float32, side=side))
                np.testing.assert_allclose(dz, (z1 - z0) / (2 * eps), atol=2e-2)


def test_swing_td_overdrive_lowers_late_swing_force():
    """swing_td_overdrive (round 4): adds a downward late-swing force
    (kp*overdrive at touchdown), zero in early swing, zero when disabled."""
    from biped_mpc_py_tpu.control.swing import swing_leg_force

    x_fb = jnp.zeros(12).at[5].set(0.55)
    pf = jnp.zeros(3)
    vf = jnp.zeros(3)
    base = MpcConfig()
    over = dataclasses.replace(MpcConfig(), swing_td_overdrive=0.02)
    gait = GaitConfig()
    t_late = 0.19  # frac 0.95 of the 0.2 s phase -> ramp ~0.77
    f0 = np.array(swing_leg_force(x_fb, t_late, pf, vf, base, 1.0, gait))
    f1 = np.array(swing_leg_force(x_fb, t_late, pf, vf, over, 1.0, gait))
    np.testing.assert_allclose(f1[:2], f0[:2], atol=1e-6)  # xy untouched
    ramp = ((0.95 - 0.6) / 0.4) ** 2
    np.testing.assert_allclose(
        f0[2] - f1[2], base.kp_swing * 0.02 * ramp, rtol=1e-3
    )
    t_early = 0.05  # frac 0.25 -> ramp 0
    e0 = np.array(swing_leg_force(x_fb, t_early, pf, vf, base, 1.0, gait))
    e1 = np.array(swing_leg_force(x_fb, t_early, pf, vf, over, 1.0, gait))
    np.testing.assert_array_equal(e0, e1)
