"""Closed-loop rollouts: fused sim+MPC scan, env batching, randomization.

The flagship inner loop (BASELINE.json north star): one tick = MPC solve +
SRB dynamics step, traced once and scanned over time — zero host round-trips
for an entire rollout. ``vmap`` adds the env-batch axis (SURVEY.md §2
parallelism axis 1); parallel/sharding.py shards that axis over the device
mesh (axis 2).

Elastic recovery (SURVEY.md §5): a fall detector (height band) auto-resets
envs in-batch — the batched-RL analog of failure detection + restart; falls
are counted in the metrics.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import struct

from biped_mpc_py_tpu.config import GaitConfig, MpcConfig
from biped_mpc_py_tpu.control.controller import ControllerState
from biped_mpc_py_tpu.control.gait import contact_sequence
from biped_mpc_py_tpu.control.mpc import build_mpc_qp, solve_mpc
from biped_mpc_py_tpu.models.biped import BipedParams
from biped_mpc_py_tpu.ops.qp import solve_qp_batch
from biped_mpc_py_tpu.sim.srb_sim import SrbState, srb_step
from biped_mpc_py_tpu.utils.metrics import RolloutMetrics

# fall detection band [m]: outside -> reset (elastic recovery)
FALL_Z_MIN = 0.25
FALL_Z_MAX = 0.85


@struct.dataclass
class World:
    """One env's complete world state — a single pytree, so checkpointing a
    rollout is just serializing this (SURVEY.md §5 checkpoint/resume)."""

    sim: SrbState
    ctrl: ControllerState
    metrics: RolloutMetrics


def init_world(mpc: MpcConfig, z0: float = 0.53) -> World:
    return World(
        sim=SrbState.standing(z0=z0),
        ctrl=ControllerState.init(mpc),
        metrics=RolloutMetrics.zeros(),
    )


def _finish_tick(sim_new, sol, cmd_ref, metrics, mpc: MpcConfig,
                 v_int=None) -> World:
    """Per-env fall detection + in-batch auto reset + metrics update
    (shared by the single-env tick and the batched-solver tick; vmap for
    batches)."""
    z = sim_new.x_fb[5]
    fell = jnp.logical_or(z < FALL_Z_MIN, z > FALL_Z_MAX)
    reset = SrbState.standing(dtype=sim_new.x_fb.dtype)
    reset = dataclasses.replace(reset, t=sim_new.t)  # keep the clock
    sim_next = jax.tree.map(
        lambda r, s: jnp.where(fell, r, s), reset, sim_new
    )
    ctrl_reset = ControllerState.init(mpc, dtype=sim_new.x_fb.dtype)
    if v_int is None:
        v_int = jnp.zeros(2, sim_new.x_fb.dtype)
    ctrl_next = jax.tree.map(
        lambda r, s: jnp.where(fell, r, s), ctrl_reset,
        ControllerState(qp=sol, cmd_ref=cmd_ref, v_int=v_int),
    )
    metrics = metrics.update(
        sim_new.x_fb, mpc.x_cmd, sol.controls[0], sol.res_prim,
        fell.astype(sim_new.x_fb.dtype),
    )
    return World(sim=sim_next, ctrl=ctrl_next, metrics=metrics)


def closed_loop_tick(
    world: World, mpc: MpcConfig, gait: GaitConfig, biped: BipedParams
) -> World:
    """One fused sim+MPC tick on the SRB abstraction."""
    from biped_mpc_py_tpu.control.controller import (
        advance_cmd_ref, advance_v_int,
    )

    sim = world.sim
    contact = contact_sequence(sim.t, mpc, gait)
    sol = solve_mpc(
        sim.x_fb, sim.t, sim.foot, mpc, biped, contact, warm=world.ctrl.qp,
        gait=gait, cmd_ref=world.ctrl.cmd_ref, v_int=world.ctrl.v_int,
    )
    sim_new = srb_step(sim, sol.controls[0], mpc, gait, biped)
    ref_next = advance_cmd_ref(world.ctrl.cmd_ref, sim.x_fb, mpc)
    vi_next = advance_v_int(world.ctrl.v_int, sim.x_fb, mpc)
    return _finish_tick(sim_new, sol, ref_next, world.metrics, mpc, vi_next)


def batched_closed_loop_tick(
    world: World,
    mpc: MpcConfig,
    gait: GaitConfig,
    biped: BipedParams,
    backend: str = "xla",
    block_envs: int | None = None,
) -> World:
    """One fused tick for a BATCH of envs (leading axis on every leaf).

    Unlike ``jax.vmap(closed_loop_tick)``, the QP solve goes through
    :func:`solve_qp_batch`, so ``backend="pallas"`` routes the whole scaled
    ADMM core (K build -> Cholesky -> inverse -> iterations) into ONE fused
    VMEM kernel launch per block of envs — replacing the batched XLA
    factorization that dominates the tick (docs/DESIGN_NOTES.md perf table).
    Backend agreement is pinned by tests/test_qp_kernel.py.
    """
    from biped_mpc_py_tpu.control.controller import (
        advance_cmd_ref, advance_v_int,
    )

    sim = world.sim
    contact = jax.vmap(lambda t: contact_sequence(t, mpc, gait))(sim.t)
    qp = jax.vmap(
        lambda x, t, f, b, c, r, vi: build_mpc_qp(
            x, t, f, mpc, b, c, gait, r, v_int=vi
        )
    )(sim.x_fb, sim.t, sim.foot, biped, contact, world.ctrl.cmd_ref,
      world.ctrl.v_int)
    sol = solve_qp_batch(
        qp, mpc, warm=world.ctrl.qp, backend=backend, block_envs=block_envs
    )
    sim_new = jax.vmap(lambda s, u, b: srb_step(s, u, mpc, gait, b))(
        sim, sol.controls[:, 0], biped
    )
    ref_next = jax.vmap(lambda r, x: advance_cmd_ref(r, x, mpc))(
        world.ctrl.cmd_ref, sim.x_fb
    )
    vi_next = jax.vmap(lambda v, x: advance_v_int(v, x, mpc))(
        world.ctrl.v_int, sim.x_fb
    )
    return jax.vmap(
        lambda s, so, r, m, vi: _finish_tick(s, so, r, m, mpc, vi)
    )(sim_new, sol, ref_next, world.metrics, vi_next)


def rollout_fn(n_steps: int, mpc: MpcConfig, gait: GaitConfig):
    """Returns a jit-able ``(world, biped) -> world`` closure (configs
    captured at trace time; biped stays a traced pytree so it can be batched
    for domain randomization)."""

    def fn(world: World, biped: BipedParams) -> World:
        def step(w, _):
            return closed_loop_tick(w, mpc, gait, biped), None

        return jax.lax.scan(step, world, None, length=n_steps)[0]

    return fn


def batched_rollout_fn(
    n_steps: int,
    mpc: MpcConfig,
    gait: GaitConfig,
    backend: str = "xla",
    block_envs: int | None = None,
):
    """Batched fused rollout over a leading env axis of (world, biped).

    backend="xla" (default): vmap of the single-env rollout.
    backend="pallas": scan of :func:`batched_closed_loop_tick` with the
    fused VMEM solver kernel (single-chip hot path; 1 CPU-mesh tests use
    interpret mode via solve_qp_batch directly).
    """
    if backend == "xla":
        return jax.vmap(rollout_fn(n_steps, mpc, gait))

    def fn(worlds: World, bipeds: BipedParams) -> World:
        def step(w, _):
            return (
                batched_closed_loop_tick(
                    w, mpc, gait, bipeds, backend=backend,
                    block_envs=block_envs,
                ),
                None,
            )

        return jax.lax.scan(step, worlds, None, length=n_steps)[0]

    return fn


def batched_cmd_rollout_fn(n_steps: int, mpc: MpcConfig, gait: GaitConfig):
    """Batched rollout with PER-ENV commands: ``(world, biped, x_cmd) ->
    world`` where x_cmd has a leading env axis (12,). Heterogeneous command
    batches (each env walking at its own velocity/heading) are the natural
    extension of BASELINE config 5's domain randomization to the task side.
    """

    def one(world: World, biped: BipedParams, x_cmd) -> World:
        mpc_i = dataclasses.replace(mpc, x_cmd=x_cmd)

        def step(w, _):
            return closed_loop_tick(w, mpc_i, gait, biped), None

        return jax.lax.scan(step, world, None, length=n_steps)[0]

    return jax.vmap(one)


def batch_worlds(mpc: MpcConfig, n: int) -> World:
    """A batch of n identical standing worlds (leading axis on every leaf)."""
    w = init_world(mpc)
    return jax.tree.map(lambda x: jnp.broadcast_to(x, (n,) + jnp.shape(x)), w)


def randomize_params(key: jax.Array, n: int, base: BipedParams | None = None) -> BipedParams:
    """Domain-randomized population of robots: a batched BipedParams.

    Randomizes mass (±20%), inertia diag (±20%), friction mu (0.4-0.7) —
    the knobs a sim2real pipeline would vary. Configs are pytrees, so this is
    just vmap fodder (SURVEY.md §5 config system).
    """
    base = base or BipedParams()
    k1, k2, k3 = jax.random.split(key, 3)
    m = base.m * jax.random.uniform(k1, (n,), minval=0.8, maxval=1.2)
    I_diag = base.I_diag[None, :] * jax.random.uniform(
        k2, (n, 3), minval=0.8, maxval=1.2
    )
    mu = jax.random.uniform(k3, (n,), minval=0.4, maxval=0.7)

    def one(m_i, I_i, mu_i):
        return dataclasses.replace(base, m=m_i, I_diag=I_i, mu=mu_i)

    return jax.vmap(one)(m, I_diag, mu)
