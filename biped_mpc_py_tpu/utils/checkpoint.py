"""Checkpoint / resume: serialize any pytree of arrays (SURVEY.md §5).

The entire world state (sim state, controller warm start, RNG keys, metrics)
is one pytree and every step is pure, so checkpointing is flattening to a
dict of arrays and resume is bit-exact. The default backend is npz (zero
dependency surface); :func:`save_pytree_orbax` / :func:`load_pytree_orbax`
use orbax-checkpoint for async-capable, sharding-aware multi-host
checkpoints (the production path once rollouts span hosts).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def save_pytree(path: str, tree) -> None:
    """Save a pytree of arrays/scalars to an npz file, together with the
    treedef repr so :func:`load_pytree` can reject mismatched structures."""
    leaves, treedef = jax.tree.flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    arrays["__treedef__"] = np.asarray(str(treedef))
    np.savez(path, **arrays)


def load_pytree(path: str, like):
    """Load a pytree saved by :func:`save_pytree`; ``like`` provides the
    structure (and dtypes) to restore into.

    Raises ``ValueError`` if the checkpoint's treedef (when recorded), leaf
    count, or any leaf shape does not match ``like`` — positional restore
    into a mismatched structure would otherwise silently produce garbage.
    """
    data = np.load(path)
    leaves, treedef = jax.tree.flatten(like)
    if "__treedef__" in data:
        saved_td = str(data["__treedef__"])
        if saved_td != str(treedef):
            raise ValueError(
                "checkpoint treedef mismatch:\n"
                f"  saved: {saved_td}\n  expected: {treedef}"
            )
    n_saved = sum(1 for k in data.files if k.startswith("leaf_"))
    if n_saved != len(leaves):
        raise ValueError(
            f"checkpoint has {n_saved} leaves, structure expects {len(leaves)}"
        )
    restored = []
    for i, l in enumerate(leaves):
        arr = data[f"leaf_{i}"]
        want = jnp.asarray(l)
        if arr.shape != want.shape:
            raise ValueError(
                f"checkpoint leaf_{i} shape {arr.shape} != expected "
                f"{want.shape}"
            )
        restored.append(jnp.asarray(arr, dtype=want.dtype))
    return jax.tree.unflatten(treedef, restored)


def save_pytree_orbax(path: str, tree) -> None:
    """Save a pytree with orbax-checkpoint (async-capable, sharding-aware:
    on a multi-host mesh each host writes only its addressable shards).

    ``path`` must be an absolute directory path (orbax requirement).
    """
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, tree)


def load_pytree_orbax(path: str, like):
    """Restore a pytree saved by :func:`save_pytree_orbax`; ``like``
    provides structure/shape/dtype (mismatches raise inside orbax)."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, like)
