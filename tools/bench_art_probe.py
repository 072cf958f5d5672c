"""Articulated-tick perf probe (round 5, VERDICT item 3).

End-to-end (scan-embedded) timings of the 1024-env articulated rollout on
the real chip, attributing cost by VARIANT DELTAS (the round-3 lesson:
isolated stage timings bound FLOPs, not schedule stalls — only end-to-end
deltas are trustworthy):

  base        the exact BENCH_MODE=art path (fast budget, 1 kHz, hold=8)
  unroll      substep scan unrolled (numerics-identical)
  unroll+ll   + low-level-period scan unrolled
  sub1        n_substeps 5 -> 1 (delta = the substep chain's cost)
  solver1     ADMM budget 40 -> 1 iteration (delta ~= the iteration cost)

Also reports XLA's own FLOP estimate for the rollout (compiled
cost_analysis) and the implied MFU vs the chip's bf16 peak — the roofline
number the round-4 verdict asked for.

Usage: python tools/bench_art_probe.py [envs] [steps]   (TPU; ONE process)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from biped_mpc_py_tpu.config import GaitConfig
from biped_mpc_py_tpu.models.biped import BipedParams
from biped_mpc_py_tpu.parallel.rollout_art import (
    art_mpc_config,
    batched_art_rollout_fn,
    init_art_world,
)
from biped_mpc_py_tpu.utils.precision import f32_precision

N_ENVS = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
N_STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 20

# v5e bf16 peak per chip [FLOP/s] (public spec: 394 TFLOPS int8, 197 bf16)
PEAK_BF16 = 197e12


def fast_art_mpc(**kw):
    base = dict(
        n_admm_iters=40, admm_rho_phases=1, admm_polish=False,
        kinv_ns_iters=10, kinv_bf16_iters=8, admm_bf16_matvec=True,
        ruiz_bf16_norms=True,
    )
    base.update(kw)
    return art_mpc_config(**base)


def probe(name, mpc, report_flops=False, **rollout_kw):
    gait = GaitConfig()
    worlds = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (N_ENVS,) + jnp.shape(x)),
        init_art_world(mpc),
    )
    bipeds = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (N_ENVS,) + jnp.shape(x)), BipedParams()
    )
    kw = dict(n_substeps=5, minv_ll_hold=8)
    kw.update(rollout_kw)
    fn = jax.jit(f32_precision(batched_art_rollout_fn(N_STEPS, mpc, gait, **kw)))
    t0 = time.time()
    w = fn(worlds, bipeds)
    jax.block_until_ready(w)
    compile_s = time.time() - t0
    t0 = time.time()
    w = fn(worlds, bipeds)
    jax.block_until_ready(w)
    dt = time.time() - t0
    eps = N_ENVS * N_STEPS / dt
    line = (
        f"{name}: {eps:9.0f} env-steps/s  {dt / N_STEPS * 1e3:6.2f} ms/tick "
        f"falls={float(jnp.sum(w.metrics.falls)):.0f} "
        f"(compile {compile_s:.0f}s)"
    )
    if report_flops:
        try:
            lowered = jax.jit(
                f32_precision(batched_art_rollout_fn(N_STEPS, mpc, gait, **kw))
            ).lower(worlds, bipeds)
            cost = lowered.compile().cost_analysis()
            flops = cost.get("flops", float("nan"))
            per_tick = flops / N_STEPS
            mfu = flops / dt / PEAK_BF16
            line += (
                f"\n  XLA flops/rollout={flops:.3e} "
                f"(per tick {per_tick:.3e}) -> MFU vs bf16 peak = "
                f"{100 * mfu:.2f}%"
            )
        except Exception as e:  # cost_analysis may be unsupported remotely
            line += f"\n  cost_analysis unavailable: {e}"
    print(line, flush=True)
    return eps, dt


if __name__ == "__main__":
    print(f"devices: {jax.devices()}  envs={N_ENVS} steps={N_STEPS}",
          flush=True)
    base = fast_art_mpc()
    probe("base           ", base, report_flops=True)
    probe("unroll=5       ", base, unroll=5)
    probe("unroll+ll      ", base, unroll=5, ll_unroll=8)
    probe("sub1 (ablation)", base, n_substeps=1)
    probe("sub1+unroll+ll ", base, n_substeps=1, unroll=1, ll_unroll=8)
    probe("solver1 (abl.) ", fast_art_mpc(n_admm_iters=1, kinv_ns_iters=1,
                                          kinv_bf16_iters=0))
