"""Aux subsystems: precision policy, metrics, logging, profiling, demo."""

import json
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp

from biped_mpc_py_tpu.utils.logging import log_event, metrics_to_dict
from biped_mpc_py_tpu.utils.metrics import RolloutMetrics
from biped_mpc_py_tpu.utils.precision import f32_precision
from biped_mpc_py_tpu.utils.profiling import time_fn


def test_metrics_accumulate_and_flatten():
    m = RolloutMetrics.zeros()
    x = jnp.zeros(12).at[5].set(0.50)
    cmd = jnp.zeros(12).at[5].set(0.55)
    u0 = jnp.zeros(12).at[2].set(60.0).at[5].set(58.0)
    m = m.update(x, cmd, u0, jnp.asarray(0.01), jnp.asarray(0.0))
    m = m.update(x, cmd, u0, jnp.asarray(0.5), jnp.asarray(1.0))
    d = metrics_to_dict(m)
    assert d["n_steps"] == 2
    assert abs(d["height_err_sq"] - 2 * 0.05**2) < 1e-6
    assert d["falls"] == 1
    assert abs(d["res_prim_max"] - 0.5) < 1e-6


def test_log_event_emits_json(capsys):
    log_event("bench", stream=sys.stdout, value=1.5, tag="x")
    line = capsys.readouterr().out.strip()
    rec = json.loads(line)
    assert rec["event"] == "bench" and rec["value"] == 1.5


def test_f32_precision_wraps():
    @f32_precision
    def f(a, b):
        return a @ b

    out = f(jnp.ones((4, 4)), jnp.ones((4, 4)))
    np.testing.assert_allclose(np.array(out), 4.0)


def test_time_fn_reports_rate():
    f = jax.jit(lambda x: x * 2)
    stats = time_fn(f, jnp.ones(8), warmup=1, iters=3)
    assert stats["sec_per_call"] > 0 and stats["calls_per_sec"] > 0


def test_demo_module_runs():
    """C14 driver parity: the one-tick demo runs end to end."""
    out = subprocess.run(
        [sys.executable, "-m", "biped_mpc_py_tpu.demo", "--rollout-steps", "5"],
        capture_output=True, text=True, timeout=420,
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin",
             "PYTHONPATH": "/root/repo", "HOME": "/root"},
        cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "Torques:" in out.stdout
    assert "closed-loop rollout" in out.stdout
