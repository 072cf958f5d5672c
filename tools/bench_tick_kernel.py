"""Hardware bench: fused TICK kernel vs fused substep kernel (round 5).

Measures the full articulated closed loop on the real chip with the
low-level control chain moved INTO the Pallas kernel
(ops/pallas/tick_kernel.py, one launch per 40 ms tick) against the
round-5 substep-kernel path (one launch per 5 ms low-level period,
control on XLA) at the exact BENCH_MODE=art operating point (fast
solver budget, 1 kHz physics, Minv held per tick, walking gait,
1024-env blocks).

Usage (TPU; ONE process, no concurrent TPU clients, do NOT SIGTERM
mid-compile): ``python tools/bench_tick_kernel.py [envs] [steps]``
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
    batched_art_rollout_kernel_fn,
    batched_art_rollout_tick_kernel_fn,
    init_art_world,
)
from biped_mpc_py_tpu.utils.precision import f32_precision

N_ENVS = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
N_STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 50


def fast_art_mpc(**kw):
    base = dict(
        n_admm_iters=40, admm_rho_phases=1, admm_polish=False,
        kinv_ns_iters=10, kinv_bf16_iters=8, admm_bf16_matvec=True,
        ruiz_bf16_norms=True,
    )
    base.update(kw)
    return art_mpc_config(**base)


def probe(name, make_fn, **mpc_kw):
    mpc = fast_art_mpc(**mpc_kw)
    gait = GaitConfig()
    worlds = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (N_ENVS,) + jnp.shape(x)),
        init_art_world(mpc),
    )
    bipeds = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (N_ENVS,) + jnp.shape(x)),
        BipedParams(),
    )
    fn = jax.jit(f32_precision(make_fn(mpc, gait)))
    t0 = time.time()
    w = fn(worlds, bipeds)
    jax.block_until_ready(w)
    compile_s = time.time() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        w = fn(worlds, bipeds)
        jax.block_until_ready(w)
        best = min(best, time.time() - t0)
    eps = N_ENVS * N_STEPS / best
    print(
        f"{name}: {eps:9.0f} env-steps/s  {best / N_STEPS * 1e3:6.2f} ms/tick"
        f"  falls={float(jnp.sum(w.metrics.falls)):.0f}"
        f"  z_mean={float(w.sim.pos[:, 2].mean()):.3f}"
        f"  (compile {compile_s:.0f}s)",
        flush=True,
    )
    return eps


if __name__ == "__main__":
    print(
        f"devices: {jax.devices()}  envs={N_ENVS} steps={N_STEPS}",
        flush=True,
    )
    eps_tick = probe(
        "tick-kernel   ",
        lambda mpc, gait: batched_art_rollout_tick_kernel_fn(
            N_STEPS, mpc, gait
        ),
    )
    eps_sub = probe(
        "substep-kernel",
        lambda mpc, gait: batched_art_rollout_kernel_fn(
            N_STEPS, mpc, gait, minv_ll_hold=8
        ),
    )
    print(f"speedup: {eps_tick / eps_sub:.2f}x", flush=True)
    # attribution deltas on the tick-kernel path (end-to-end variant
    # deltas, the round-3 lesson): ADMM budget -> 1 iteration bounds the
    # ADMM loop cost; QP-Kinv NS budget -> 1 bounds the KKT-inverse
    # build (the sim mass-matrix NS(12) is fixed in engine.py)
    tick = lambda mpc, gait: batched_art_rollout_tick_kernel_fn(
        N_STEPS, mpc, gait
    )
    probe("tick admm1 abl", tick, n_admm_iters=1)
    probe("tick ns1 abl  ", tick, kinv_ns_iters=1, kinv_bf16_iters=0)
    probe(
        "tick admm1+ns1", tick, n_admm_iters=1, kinv_ns_iters=1,
        kinv_bf16_iters=0,
    )
    # kernel-shape ablations (timing-only; dynamics fidelity irrelevant):
    # sub1 bounds the in-kernel substep arithmetic (8 periods x 1 substep);
    # ll4/sub10 keeps 40 substeps but halves the in-kernel control evals
    probe(
        "tick sub1 abl ",
        lambda mpc, gait: batched_art_rollout_tick_kernel_fn(
            N_STEPS, mpc, gait, n_substeps=1
        ),
    )
    probe(
        "tick ll4 abl  ",
        lambda mpc, gait: batched_art_rollout_tick_kernel_fn(
            N_STEPS, mpc, gait, n_lowlevel=4, n_substeps=10
        ),
    )
