"""Device-mesh sharding of the env batch (SURVEY.md §2 parallelism axis 2).

The reference has no distributed backend of any kind (single process, single
thread). The TPU-native scale-out is: a 1-D ``jax.sharding.Mesh`` over the
slice, the env-batch axis of every pytree leaf sharded across it, XLA
inserting the (only) collectives — ``psum`` for metric reduction over ICI.
Rollouts are embarrassingly parallel, so steady-state cross-chip traffic is
exactly those metric reductions.

No NCCL/MPI/Gloo analog is needed: XLA collectives over ICI *are* the
communication backend. Multi-host (DCN) would reuse this unchanged via
``jax.distributed`` initialization.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from biped_mpc_py_tpu.config import GaitConfig, MpcConfig
from biped_mpc_py_tpu.models.biped import BipedParams
from biped_mpc_py_tpu.parallel.rollout import (
    World,
    batch_worlds,
    closed_loop_tick,
)
from biped_mpc_py_tpu.utils.metrics import RolloutMetrics


def env_mesh(devices=None, axis: str = "env") -> Mesh:
    """1-D mesh over all (or the given) devices, env-parallel axis."""
    devices = jax.devices() if devices is None else devices
    import numpy as np

    return Mesh(np.asarray(devices), axis_names=(axis,))


def shard_world(world: World, mesh: Mesh, axis: str = "env") -> World:
    """Place a batched World with its leading env axis sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), world)


def sharded_rollout_fn(
    n_steps: int, mpc: MpcConfig, gait: GaitConfig, mesh: Mesh, axis: str = "env"
):
    """Build the sharded batched rollout: ``(world, biped) -> (world, summary)``.

    Uses shard_map so the per-device program is the plain vmapped scan (no
    cross-device dependencies inside the loop), with one psum at the end to
    reduce the metrics over ICI. ``biped`` may be batched (leading env axis,
    sharded) or unbatched (replicated) — pass the matching specs.
    """
    from jax.experimental.shard_map import shard_map

    def local_rollout(world: World, biped: BipedParams):
        def step(w, _):
            return jax.vmap(
                lambda wi, bi: closed_loop_tick(wi, mpc, gait, bi)
            )(w, biped), None

        world, _ = jax.lax.scan(step, world, None, length=n_steps)
        # cross-device metric reduction (the only collective in the loop)
        m = world.metrics
        summary = {
            "n_steps": jax.lax.psum(jnp.sum(m.n_steps), axis),
            "height_rmse_sum": jax.lax.psum(jnp.sum(m.height_err_sq), axis),
            "falls": jax.lax.psum(jnp.sum(m.falls), axis),
            "res_prim_max": jax.lax.pmax(jnp.max(m.res_prim_max), axis),
        }
        return world, summary

    spec_batched = P(axis)
    return shard_map(
        local_rollout,
        mesh=mesh,
        in_specs=(spec_batched, spec_batched),
        out_specs=(spec_batched, P()),
        check_rep=False,
    )


def make_sharded_batch(
    mpc: MpcConfig, n_envs: int, mesh: Mesh, axis: str = "env"
) -> World:
    """Batched standing worlds, sharded over the mesh."""
    world = batch_worlds(mpc, n_envs)
    return shard_world(world, mesh, axis)


def sharded_art_rollout_fn(
    n_steps: int, mpc: MpcConfig, gait: GaitConfig, mesh: Mesh,
    model=None, axis: str = "env", **kw,
):
    """Device-sharded rollout of the FULL ARTICULATED stack:
    ``(art_worlds, bipeds) -> (art_worlds, summary)`` with the env axis
    sharded over the mesh and a psum metric reduction — same communication
    structure as :func:`sharded_rollout_fn` (rollouts are embarrassingly
    parallel; ICI carries only the final reduction)."""
    from jax.experimental.shard_map import shard_map

    from biped_mpc_py_tpu.parallel.rollout_art import (
        art_closed_loop_tick,
        hector_model,
    )

    model = model or hector_model()

    def local_rollout(world, biped):
        def step(w, _):
            return jax.vmap(
                lambda wi, bi: art_closed_loop_tick(
                    wi, mpc, gait, bi, model, **kw
                )
            )(w, biped), None

        world, _ = jax.lax.scan(step, world, None, length=n_steps)
        m = world.metrics
        summary = {
            "n_steps": jax.lax.psum(jnp.sum(m.n_steps), axis),
            "falls": jax.lax.psum(jnp.sum(m.falls), axis),
            "height_rmse_sum": jax.lax.psum(jnp.sum(m.height_err_sq), axis),
        }
        return world, summary

    return shard_map(
        local_rollout,
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=(P(axis), P()),
        check_rep=False,
    )
