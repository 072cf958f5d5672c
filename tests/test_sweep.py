"""Config-batched stability sweeps (parallel/sweep.py)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from biped_mpc_py_tpu.config import GaitConfig
from biped_mpc_py_tpu.models.biped import BipedParams
from biped_mpc_py_tpu.parallel.rollout_art import art_mpc_config
from biped_mpc_py_tpu.parallel.sweep import (
    art_sweep_fn,
    perturbed_worlds,
    stack_configs,
)
from biped_mpc_py_tpu.sim.model import hector_model


def test_stack_configs_batches_only_differing_leaves():
    base = art_mpc_config()
    cfgs = [dataclasses.replace(base, kp_hipyaw=k) for k in (1.0, 2.0, 3.0)]
    mpc_batch, in_axes = stack_configs(cfgs)
    assert mpc_batch.kp_hipyaw.shape == (3,)
    assert in_axes.kp_hipyaw == 0
    # identical leaves stay unbatched (concrete at trace time)
    assert in_axes.x_cmd is None
    assert np.asarray(mpc_batch.x_cmd).shape == (12,)


def test_stack_configs_rejects_static_mismatch():
    base = art_mpc_config()
    other = art_mpc_config(cmd_body_frame=True)
    with pytest.raises(ValueError):
        stack_configs([base, other])


@pytest.mark.slow
def test_art_sweep_runs_config_batch():
    """3 configs x perturbed worlds roll forward in ONE vmapped program and
    produce per-config metrics."""
    base = art_mpc_config()
    cfgs = [
        dataclasses.replace(base, kp_hipyaw=k, kd_hipyaw=d)
        for k, d in ((2.4, 0.3), (2.4, 0.3), (0.0, 0.0))
    ]
    mpc_batch, in_axes = stack_configs(cfgs)
    # scale=0: all three worlds identical, so any trajectory difference is
    # the CONFIG axis reaching the controller
    worlds = perturbed_worlds(base, 3, jax.random.PRNGKey(0), scale=0.0)
    f = jax.jit(
        art_sweep_fn(2, GaitConfig(), in_axes, model=hector_model())
    )
    out = f(worlds, BipedParams(), mpc_batch)
    falls = np.asarray(out.metrics.falls)
    assert falls.shape == (3,)
    q = np.asarray(out.sim.q)
    assert np.isfinite(q).all()
    # identical config + identical world -> identical trajectory
    np.testing.assert_array_equal(q[0], q[1])
    # different config (no posture PD) -> different trajectory
    assert not np.allclose(q[0], q[2], atol=1e-5)
