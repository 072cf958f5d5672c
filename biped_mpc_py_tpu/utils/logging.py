"""Host-side structured logging (SURVEY.md §5 observability).

The reference logs with bare ``print`` (``bipedalLocomotionMPC.py:190-192,
488-495``). Here: one JSON line per event, emitted AFTER device_get of
on-device metric pytrees — never inside the hot loop.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import numpy as np


def metrics_to_dict(metrics) -> dict:
    """Flatten a metrics pytree (e.g. RolloutMetrics) to plain floats."""
    out = {}
    fields = getattr(metrics, "__dataclass_fields__", None)
    if fields:
        for name in fields:
            v = np.asarray(getattr(metrics, name))
            out[name] = float(v.sum()) if v.ndim else float(v)
    else:
        leaves, _ = jax.tree.flatten(metrics)
        for i, leaf in enumerate(leaves):
            out[f"leaf_{i}"] = float(np.asarray(leaf).sum())
    return out


def log_event(event: str, stream=sys.stderr, **fields) -> None:
    """Emit one structured JSON log line."""
    rec = {"ts": time.time(), "event": event, **fields}
    print(json.dumps(rec), file=stream, flush=True)
