"""Config-batched stability sweeps: vmap closed-loop rollouts over WHOLE
MpcConfig batches.

The articulated closed loop is chaotic near its capability boundaries: a
single rollout's pass/fail flips with roundoff-level changes, so tuning a
controller by serial probing is a losing game. The TPU-native alternative is
to map the stability REGION in one shot: batch (gains x commands x
initial-state perturbations) as a leading axis over the whole
``MpcConfig`` pytree and vmap the rollout. 90 articulated 10 s rollouts
map a 15-cell gain grid in ~25 s on one v5e chip; the engine's robust
operating point (``rollout_art.art_mpc_config``) was selected this way.

No reference counterpart (the reference runs exactly one open-loop tick,
``bipedalLocomotionMPC.py:473-495``); this is infrastructure the batched
TPU design gets for free.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from biped_mpc_py_tpu.config import GaitConfig, MpcConfig
from biped_mpc_py_tpu.models.biped import BipedParams
from biped_mpc_py_tpu.parallel.rollout_art import (
    ArtWorld,
    art_closed_loop_tick,
    init_art_world,
)
from biped_mpc_py_tpu.sim.model import ArticulatedModel, hector_model


def stack_configs(configs):
    """Stack a list of MpcConfigs into one batched config + vmap in_axes.

    Leaves that are identical across the batch stay unbatched (axis None) —
    this matters because some config leaves feed Python-level decisions at
    trace time and must stay concrete. Static (non-pytree) fields must be
    identical across the batch (they select the compiled program).

    Returns:
      (mpc_batch, in_axes): pass as the vmapped argument and its in_axes.
    """
    base = configs[0]
    leaves0, treedef = jax.tree.flatten(base)
    all_leaves = [jax.tree.flatten(c)[0] for c in configs]
    for c in configs[1:]:
        if jax.tree.structure(c) != treedef:
            raise ValueError(
                "configs differ in static fields; split the sweep into one "
                "jit per static combination"
            )
    stacked, axes = [], []
    for i, leaf0 in enumerate(leaves0):
        col = [leaves[i] for leaves in all_leaves]
        same = all(
            np.array_equal(np.asarray(x), np.asarray(leaf0)) for x in col
        )
        if same:
            stacked.append(leaf0)
            axes.append(None)
        else:
            stacked.append(jnp.stack([jnp.asarray(x) for x in col]))
            axes.append(0)
    mpc_batch = jax.tree.unflatten(treedef, stacked)
    in_axes = jax.tree.unflatten(treedef, axes)
    return mpc_batch, in_axes


def perturbed_worlds(
    mpc: MpcConfig, n: int, key, scale: float = 2e-3
) -> ArtWorld:
    """A batch of n initial worlds; world 0 is nominal, the rest carry
    N(0, scale) joint-angle perturbations (the robustness probe axis)."""
    worlds = []
    for i in range(n):
        w = init_art_world(mpc)
        if i:
            dq = scale * jax.random.normal(
                jax.random.fold_in(key, i), (10,), jnp.float32
            )
            w = dataclasses.replace(
                w, sim=dataclasses.replace(w.sim, q=w.sim.q + dq)
            )
        worlds.append(w)
    return jax.tree.map(lambda *xs: jnp.stack(xs), *worlds)


def art_sweep_fn(
    n_steps: int,
    gait: GaitConfig,
    in_axes,
    model: ArticulatedModel | None = None,
    **tick_kw,
):
    """jit-able ``(world_batch, biped, mpc_batch) -> world_batch`` where the
    config batch axis rides vmap alongside the worlds.

    ``in_axes`` is the config axes pytree from :func:`stack_configs`.
    """
    model = model or hector_model()

    def one(world: ArtWorld, biped: BipedParams, mpc: MpcConfig) -> ArtWorld:
        def step(w, _):
            return (
                art_closed_loop_tick(w, mpc, gait, biped, model, **tick_kw),
                None,
            )

        return jax.lax.scan(step, world, None, length=n_steps)[0]

    return jax.vmap(one, in_axes=(0, None, in_axes))
