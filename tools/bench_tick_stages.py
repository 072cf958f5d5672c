"""Hardware stage-bound probes for the fused-TICK-kernel rollout (round 5).

The tick-kernel ablations (tools/bench_tick_kernel.py) showed the
in-kernel arithmetic is nearly free (substeps 40->8 saves 0.18 ms,
halving control evals 0.15 ms) while ~11 ms/tick persists even with the
QP budget cut to 1 ADMM iter + 1 NS iter. This tool bounds the four XLA
stages that remain OUTSIDE the kernel, by end-to-end variant deltas
(the round-3 lesson: isolated timings bound FLOPs, not schedule
stalls):

  base      = batched_art_rollout_tick_kernel_fn (exact bench path)
  mpc-off   = skip solve_mpc + gait clock entirely (hold the previous
              QP solution; contact flags pinned to stance) -> bounds
              the WHOLE MPC layer (references + SRB linearization +
              condense + Ruiz/ADMM/Kinv)
  +fb-off   = additionally skip the XLA feedback_and_soles whole-body
              FK (the kernel recomputes feedback in-kernel anyway)
  +minv-off = additionally hold one standing-pose Minv for all ticks
              -> bounds the per-tick Newton-Schulz 16x16 inverse
  +post-off = additionally skip fall-reset/ref-advance/metrics ->
              what is left is ONE kernel launch + pack/unpack glue +
              scan carry: the floor of the current architecture.

Timing-only ablations: dynamics fidelity is irrelevant (falls expected;
they auto-reset and the tick's compute shape is state-independent).

Usage (TPU; ONE process, no concurrent TPU clients, do NOT SIGTERM
mid-compile): ``python tools/bench_tick_stages.py [envs] [steps]``
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
    _art_control_stage,
    _art_post_stage,
    art_mpc_config,
    batched_art_rollout_tick_kernel_fn,
    hector_model,
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


def variant_fn(n_steps, mpc, gait, *, mpc_off=False, fb_off=False,
               minv_off=False, post_off=False):
    """tick-kernel rollout with named XLA stages removed (timing probe)."""
    import dataclasses

    from biped_mpc_py_tpu.ops.pallas.tick_kernel import make_fused_tick
    from biped_mpc_py_tpu.sim.engine import (
        feedback_and_soles,
        mass_matrix_inv,
    )

    model = hector_model()
    biped_const = BipedParams()
    tick_fn = make_fused_tick(model, biped_const, mpc, gait, 8, 5)
    minv_hold0 = None
    if minv_off:
        from biped_mpc_py_tpu.sim.engine import ArtState

        q0 = ArtState.standing().q
        minv_hold0 = mass_matrix_inv(model, q0)

    def tick(worlds, bipeds):
        sim = worlds.sim
        if mpc_off:
            sol = worlds.ctrl.qp  # hold the previous solution
            t_g, hold = sim.t, worlds.ctrl.hold_count
            if fb_off:
                x_fb = jnp.zeros((sim.q.shape[0], 12), sim.q.dtype)
            else:
                x_fb, _ = jax.vmap(
                    lambda s: feedback_and_soles(model, s)
                )(sim)
            c0 = jnp.ones((sim.q.shape[0], 2), sim.q.dtype)
        else:
            x_fb, t_g, hold, contact, sol = jax.vmap(
                lambda w, b: _art_control_stage(w, b, mpc, gait, model)
            )(worlds, bipeds)
            c0 = contact[:, 0, 0:2]
        u0 = sol.controls[:, 0]
        t0 = sim.t if not gait.contact_clock else t_g
        if minv_off:
            Minv = jnp.broadcast_to(
                minv_hold0, (sim.q.shape[0],) + minv_hold0.shape
            )
        else:
            Minv = jax.vmap(lambda q: mass_matrix_inv(model, q))(sim.q)
        sim_new, energy = tick_fn(
            sim, u0, c0, t0, worlds.ctrl.cmd_ref[:, 2],
            worlds.ctrl.v_int, Minv,
        )
        if post_off:
            return dataclasses.replace(worlds, sim=sim_new)
        return jax.vmap(
            lambda w, s, e, x, so, tg, h: _art_post_stage(
                w, s, e, x, so, tg, h, mpc
            )
        )(worlds, sim_new, energy, x_fb, sol, t_g, hold)

    def fn(worlds, bipeds):
        def step(w, _):
            return tick(w, bipeds), None

        return jax.lax.scan(step, worlds, None, length=n_steps)[0]

    return fn


def probe(name, make_fn):
    mpc = fast_art_mpc()
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
    best = compile_s
    for _ in range(int(os.environ.get("BENCH_REPS", "3"))):
        t0 = time.time()
        w = fn(worlds, bipeds)
        jax.block_until_ready(w)
        best = min(best, time.time() - t0)
    ms = best / N_STEPS * 1e3
    print(f"{name}: {ms:6.2f} ms/tick  (compile {compile_s:.0f}s)",
          flush=True)
    return ms


VARIANTS = {
    "base": ("base (bench path)     ", lambda mpc, gait:
             batched_art_rollout_tick_kernel_fn(N_STEPS, mpc, gait)),
    "mpc": ("mpc-off               ", lambda mpc, gait:
            variant_fn(N_STEPS, mpc, gait, mpc_off=True)),
    "fb": ("mpc-off fb-off        ", lambda mpc, gait:
           variant_fn(N_STEPS, mpc, gait, mpc_off=True, fb_off=True)),
    "minv": ("mpc/fb/minv-off       ", lambda mpc, gait:
             variant_fn(N_STEPS, mpc, gait, mpc_off=True, fb_off=True,
                        minv_off=True)),
    "post": ("mpc/fb/minv/post-off  ", lambda mpc, gait:
             variant_fn(N_STEPS, mpc, gait, mpc_off=True, fb_off=True,
                        minv_off=True, post_off=True)),
}

if __name__ == "__main__":
    print(
        f"devices: {jax.devices()}  envs={N_ENVS} steps={N_STEPS}",
        flush=True,
    )
    sel = os.environ.get("BENCH_VARIANTS", "base,mpc,fb,minv,post")
    ms = {}
    for key in sel.split(","):
        name, make = VARIANTS[key]
        ms[key] = probe(name, make)
    if set(ms) == set(VARIANTS):
        base, m, f, v, p = (ms[k] for k in ("base", "mpc", "fb", "minv",
                                            "post"))
        print(
            f"\nattribution @ {N_ENVS} envs:\n"
            f"  MPC layer (ref+lin+condense+solve): {base - m:6.2f} ms\n"
            f"  XLA FK feedback_and_soles:          {m - f:6.2f} ms\n"
            f"  per-tick NS(16) mass-matrix inv:    {f - v:6.2f} ms\n"
            f"  post stage (reset/refs/metrics):    {v - p:6.2f} ms\n"
            f"  kernel launch + glue + scan floor:  {p:6.2f} ms",
            flush=True,
        )
