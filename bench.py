"""Headline benchmark: batched fused sim+MPC env-steps/sec on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline (BASELINE.md): the reference runs ONE env at an estimated 150-400 ms
per MPC tick on CPU (cvxopt dense IPM; midpoint 250 ms -> 4 ticks/s). The
north star is >=4096 envs at real-time on a v5e-8 slice, i.e. >=102,400
env-steps/s per slice (25 Hz control). vs_baseline is measured env-steps/s
per chip over the reference's 4/s.

Env knobs: BENCH_ENVS (default 1024), BENCH_STEPS (default 50),
BENCH_GAIT (1 walking / 0 standing), BENCH_ITERS/BENCH_PHASES/BENCH_POLISH
(ADMM budget), BENCH_MODE (srb = SRB closed loop [headline], art = full
articulated stack with 2 kHz Featherstone physics), BENCH_RANDOMIZE
(1 = domain-randomized robot population instead of identical envs).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

from biped_mpc_py_tpu.config import GaitConfig, MpcConfig
from biped_mpc_py_tpu.models.biped import BipedParams
from biped_mpc_py_tpu.parallel.rollout import batch_worlds, batched_rollout_fn
from biped_mpc_py_tpu.utils.precision import f32_precision

REFERENCE_STEPS_PER_SEC = 4.0  # BASELINE.md: est. 250 ms per reference tick


def _fail(kind: str, exc: BaseException) -> None:
    """Structured failure mode (VERDICT r3 weak #1): when the backend is
    down, the driver artifact should record ONE parseable JSON line, not a
    180-line traceback. Full traceback still goes to stderr for debugging.

    Backend-init UNAVAILABLE (the axon pool momentarily refusing the claim —
    a fast, clean failure, distinct from the round-3 wedge hang) gets a
    bounded re-exec retry: jax caches the failed backend in-process, so the
    only way to retry is a fresh process. BENCH_INIT_RETRIES (default 2)
    attempts, 60 s apart, ~3 min worst case — small enough to stay inside
    any reasonable driver timeout, large enough to ride out a blip."""
    import traceback

    traceback.print_exc(file=sys.stderr)
    msg = f"{type(exc).__name__}: {exc}"
    transient = "Unable to initialize backend" in msg and "UNAVAILABLE" in msg
    retries = int(os.environ.get("BENCH_INIT_RETRIES", "2"))
    if transient and retries > 0:
        print(
            json.dumps({"note": "retrying_backend_init", "left": retries}),
            file=sys.stderr,
            flush=True,
        )
        time.sleep(60)
        os.environ["BENCH_INIT_RETRIES"] = str(retries - 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)
    print(json.dumps({"error": kind, "detail": msg[:400]}))
    raise SystemExit(1)


def _start_watchdog(deadline_s: float = 240.0):
    """Stderr-only heartbeat: if the first device op hasn't completed by the
    deadline (the wedged-axon-claim hang of round 3 — jax.devices() blocks
    forever, no exception to catch), leave a diagnosable note in the
    artifact. Deliberately does NOT kill anything: SIGTERM/exit mid-claim
    re-wedges the pool (CLAUDE.md recovery protocol)."""
    import threading

    done = threading.Event()

    def _watch():
        if not done.wait(deadline_s):
            print(
                json.dumps(
                    {
                        "note": "watchdog",
                        "detail": (
                            f"first device op still pending after "
                            f"{deadline_s:.0f}s — likely wedged axon pool "
                            "claim; not killing (would re-wedge)"
                        ),
                    }
                ),
                file=sys.stderr,
                flush=True,
            )

    t = threading.Thread(target=_watch, daemon=True)
    t.start()
    return done


def _bipeds(biped, n_envs, randomize):
    if randomize:
        from biped_mpc_py_tpu.parallel.rollout import randomize_params

        return randomize_params(jax.random.PRNGKey(0), n_envs, biped)
    return jax.tree.map(
        lambda x: jnp.broadcast_to(x, (n_envs,) + jnp.shape(x)), biped
    )


def main() -> None:
    import dataclasses

    # BENCH_PLATFORM=cpu: the ONLY reliable way to keep a bench run off the
    # TPU in this container — the sitecustomize merges axon into
    # JAX_PLATFORMS (env "cpu" still yields config "axon,cpu", which
    # initializes axon first), so pin via jax.config before any device op.
    plat = os.environ.get("BENCH_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)

    # Covers backend init too: the first jnp array in world construction
    # already claims the device, before the jitted fn ever runs.
    watchdog_done = _start_watchdog()

    n_envs = int(os.environ.get("BENCH_ENVS", "1024"))
    n_steps = int(os.environ.get("BENCH_STEPS", "50"))
    gait_mode = int(os.environ.get("BENCH_GAIT", "1"))

    mode = os.environ.get("BENCH_MODE", "srb")
    mpc = dataclasses.replace(
        MpcConfig(),
        # defaults = fast_mpc_config: the budget whose closed-loop accuracy
        # is pinned by tests (test_bench_budget_accuracy); see the
        # fast_mpc_config docstring for the measured budget sweep.
        n_admm_iters=int(os.environ.get("BENCH_ITERS", "40")),
        admm_rho_phases=int(os.environ.get("BENCH_PHASES", "1")),
        admm_polish=bool(int(os.environ.get("BENCH_POLISH", "0"))),
        kinv_ns_iters=int(os.environ.get("BENCH_NS_ITERS", "10")),
        kinv_bf16_iters=int(os.environ.get("BENCH_NS_BF16", "8")),
        admm_bf16_matvec=bool(int(os.environ.get("BENCH_BF16_MATVEC", "1"))),
        ruiz_bf16_norms=bool(int(os.environ.get("BENCH_RUIZ_BF16", "1"))),
    )
    gait = GaitConfig(gait_mode=gait_mode)
    biped = BipedParams()
    # BENCH_RANDOMIZE=1: domain-randomized robot population (mass/inertia/
    # friction, parallel.rollout.randomize_params) instead of N broadcast
    # copies — BASELINE config 5's wording, and precludes any
    # identical-env fast-path artifact in the measurement.
    randomize = bool(int(os.environ.get("BENCH_RANDOMIZE", "0")))

    if mode == "art":
        from biped_mpc_py_tpu.parallel.rollout_art import (
            art_mpc_config, batched_art_rollout_fn, init_art_world,
        )

        mpc = art_mpc_config(
            n_admm_iters=mpc.n_admm_iters,
            admm_rho_phases=mpc.admm_rho_phases,
            admm_polish=mpc.admm_polish,
            kinv_ns_iters=mpc.kinv_ns_iters,
            kinv_bf16_iters=mpc.kinv_bf16_iters,
            admm_bf16_matvec=mpc.admm_bf16_matvec,
            ruiz_bf16_norms=mpc.ruiz_bf16_norms,
        )
        worlds = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (n_envs,) + jnp.shape(x)),
            init_art_world(mpc),
        )
        bipeds = _bipeds(biped, n_envs, randomize)
        # physics substep count: default 5 (1 kHz) — validated against the
        # MuJoCo closed-loop force oracle to the same fidelity as the
        # round-2 2 kHz (total stance force 1.2% vs 1.8%, identical duty
        # and per-foot stance forces; docs/DESIGN_NOTES.md round 3)
        n_sub = int(os.environ.get("BENCH_ART_SUBSTEPS", "5"))
        # mass-matrix-inverse hold (low-level periods per NS refresh):
        # default 8 = one inverse per 40 ms MPC tick, the round-3 3.2x
        # throughput lever (10.3k -> 33.3k); fidelity vs the hold=1
        # oracle cadence validated per-operating-point in
        # tools/sweep_minv.py and pinned by
        # test_articulated_bench_budget_accuracy. BENCH_MINV_HOLD=1
        # restores the oracle cadence.
        minv_hold = int(os.environ.get("BENCH_MINV_HOLD", "8"))
        # BENCH_TERRAIN=<amplitude m>: per-env random rough ground
        # (BASELINE config 4/5 combined — pair with BENCH_RANDOMIZE=1 for
        # the fully domain-randomized stress bench; falls auto-reset
        # in-batch and are reported)
        terrain_amp = float(os.environ.get("BENCH_TERRAIN", "0"))
        # BENCH_ART_BACKEND: "tick" (default where eligible) = the round-5
        # fused TICK kernel — low-level control AND physics in ONE Pallas
        # launch per 40 ms tick (ops/pallas/tick_kernel.py; hardware: 72.4k
        # vs the substep kernel's 65.9k and the XLA path's 33.9k
        # env-steps/s/chip at 1024 envs; parity pinned by
        # tests/test_tick_kernel.py). Requires flat ground, whole 1024-env
        # blocks, and the tick-held mass-matrix cadence (minv hold = 8
        # low-level periods, the bench default). "kernel" = physics-only
        # substep kernel (any minv hold); "xla" = the round-3/4 path.
        if n_envs % 1024 == 0 and minv_hold == 8:
            default_backend = "tick"
        elif n_envs % 1024 == 0:
            default_backend = "kernel"
        else:
            default_backend = "xla"
        art_backend = os.environ.get("BENCH_ART_BACKEND", default_backend)
        if terrain_amp > 0:
            from biped_mpc_py_tpu.parallel.rollout_art import (
                batched_art_rollout_terrain_fn,
            )
            from biped_mpc_py_tpu.sim.contact import Terrain

            terrains = Terrain.rough_batch(
                jax.random.PRNGKey(1), n_envs, amplitude=terrain_amp
            )
            tfn = jax.jit(
                f32_precision(
                    batched_art_rollout_terrain_fn(
                        n_steps, mpc, gait, n_substeps=n_sub,
                        minv_ll_hold=minv_hold,
                    )
                )
            )
            fn = lambda w, b: tfn(w, b, terrains)
        elif art_backend == "tick":
            # BENCH_ART_BACKEND=tick: the round-5 fused TICK kernel —
            # low-level control AND physics in ONE launch per 40 ms tick
            # (ops/pallas/tick_kernel.py; parity pinned by
            # tests/test_tick_kernel.py). Implies minv_ll_hold =
            # n_lowlevel (the bench default).
            from biped_mpc_py_tpu.parallel.rollout_art import (
                batched_art_rollout_tick_kernel_fn,
            )

            fn = jax.jit(
                f32_precision(
                    batched_art_rollout_tick_kernel_fn(
                        n_steps, mpc, gait, n_substeps=n_sub,
                    )
                )
            )
        elif art_backend == "kernel":
            from biped_mpc_py_tpu.parallel.rollout_art import (
                batched_art_rollout_kernel_fn,
            )

            fn = jax.jit(
                f32_precision(
                    batched_art_rollout_kernel_fn(
                        n_steps, mpc, gait, n_substeps=n_sub,
                        minv_ll_hold=minv_hold,
                    )
                )
            )
        else:
            fn = jax.jit(
                f32_precision(
                    batched_art_rollout_fn(
                        n_steps, mpc, gait, n_substeps=n_sub,
                        minv_ll_hold=minv_hold,
                    )
                )
            )
    else:
        backend = os.environ.get("BENCH_BACKEND", "xla")
        # 0 = auto (derived from the padded constraint-row count; see
        # ops/pallas/qp_kernel.fused_qp_solve)
        block_envs = int(os.environ.get("BENCH_BLOCK_ENVS", "0")) or None
        worlds = batch_worlds(mpc, n_envs)
        bipeds = _bipeds(biped, n_envs, randomize)
        fn = jax.jit(
            f32_precision(
                batched_rollout_fn(
                    n_steps, mpc, gait, backend=backend, block_envs=block_envs
                )
            )
        )

    t0 = time.time()
    try:
        w = fn(worlds, bipeds)
        jax.block_until_ready(w)
    except Exception as e:  # backend unreachable / compile failure
        _fail("backend_or_compile_failure", e)
    finally:
        watchdog_done.set()
    compile_s = time.time() - t0
    print(f"compile+first run: {compile_s:.1f}s", file=sys.stderr)

    t0 = time.time()
    w = fn(worlds, bipeds)
    jax.block_until_ready(w)
    elapsed = time.time() - t0

    env_steps_per_sec = n_envs * n_steps / elapsed
    falls = float(jnp.sum(w.metrics.falls))
    rt_factor_total = env_steps_per_sec * mpc.dt  # envs simultaneously real-time
    print(
        f"envs={n_envs} steps={n_steps} elapsed={elapsed:.3f}s "
        f"rt_envs={rt_factor_total:.0f} falls={falls}",
        file=sys.stderr,
    )

    print(
        json.dumps(
            {
                "metric": "fused_sim_mpc_env_steps_per_sec_per_chip",
                "value": round(env_steps_per_sec, 1),
                "unit": "env-steps/s/chip (25 Hz sim+MPC ticks)",
                "vs_baseline": round(env_steps_per_sec / REFERENCE_STEPS_PER_SEC, 1),
            }
        )
    )


if __name__ == "__main__":
    try:
        main()
    except SystemExit:
        raise
    except Exception as e:
        _fail("bench_setup_failure", e)
