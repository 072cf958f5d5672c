"""Checkpoint / resume: serialize any pytree of arrays (SURVEY.md §5).

The entire world state (sim state, controller warm start, RNG keys, metrics)
is one pytree and every step is pure, so checkpointing is flattening to a
dict of arrays and resume is bit-exact. npz keeps the dependency surface
zero; orbax can be slotted in for async multi-host checkpointing later.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def save_pytree(path: str, tree) -> None:
    """Save a pytree of arrays/scalars to an npz file."""
    leaves, _ = jax.tree.flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    np.savez(path, **arrays)


def load_pytree(path: str, like):
    """Load a pytree saved by :func:`save_pytree`; ``like`` provides the
    structure (and dtypes) to restore into."""
    data = np.load(path)
    leaves, treedef = jax.tree.flatten(like)
    restored = [
        jnp.asarray(data[f"leaf_{i}"], dtype=jnp.asarray(l).dtype)
        for i, l in enumerate(leaves)
    ]
    return jax.tree.unflatten(treedef, restored)
