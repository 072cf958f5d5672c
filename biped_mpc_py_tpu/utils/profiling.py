"""Profiling / tracing helpers (SURVEY.md §5).

The reference's profiling is ``time.time()`` around one call
(``bipedalLocomotionMPC.py:486-489``). Here: ``jax.profiler`` trace capture
for TPU timeline analysis, ``named_scope`` labels so stages are identifiable
in the trace, and a steady-state timing harness that handles compile warmup
and device sync.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(dir_path: str = "/tmp/biped_tpu_trace"):
    """Capture a jax.profiler trace (view with TensorBoard/XProf)."""
    jax.profiler.start_trace(dir_path)
    try:
        yield dir_path
    finally:
        jax.profiler.stop_trace()


scope = jax.named_scope  # stage labels inside jitted code


def time_fn(fn, *args, warmup: int = 2, iters: int = 10) -> dict:
    """Steady-state wall time of a jitted fn (seconds per call)."""
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    return {"sec_per_call": dt, "calls_per_sec": 1.0 / dt}
