"""Probe: which ops the remote Mosaic TPU compiler accepts (round 5).

The fused tick kernel (low-level control in-kernel) needs ops no prior
kernel used. Measured here (v5e, jax in this container):

- ``jnp.arctan2`` / ``atan2``: **REJECTED** at lowering
  ("Unimplemented primitive ... atan2") -> the kernel carries its own
  branch-free polynomial atan2/asin (ops/pallas/tick_kernel.py).
- ``jnp.arcsin``, ``jnp.remainder``, nested ``lax.fori_loop``: probed
  below against a numpy oracle. The first attempt at this second probe
  hit a transient backend FAILED_PRECONDITION at readback (claim
  disturbed by the atan2 lowering failure minutes earlier) — treat a
  single failed run as INCONCLUSIVE and re-run after backing off.
  The tick kernel is written defensively anyway: no arcsin/remainder
  (own asin-from-atan2, floor-based mod), no nested fori (Python-
  unrolled period loop around the single substep fori).

Run standalone on the TPU: ``python tools/probe_mosaic_ops.py``
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def k_asin(a_ref, o_ref):
    o_ref[...] = jnp.arcsin(jnp.clip(a_ref[...] * 0.3, -1.0, 1.0))


def k_rem(a_ref, o_ref):
    o_ref[...] = jnp.remainder(a_ref[...], 0.4)


def k_nested(a_ref, o_ref):
    a = a_ref[...]

    def outer(i, x):
        def inner(j, y):
            return y + 0.01 * jnp.sin(y)

        x = jax.lax.fori_loop(0, 5, inner, x)
        return x + 0.1 * (i + 1)

    o_ref[...] = jax.lax.fori_loop(0, 8, outer, a)


def main():
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randn(8, 128), jnp.float32)
    an = np.asarray(a, np.float64)
    out_shape = jax.ShapeDtypeStruct((8, 128), jnp.float32)

    def run(name, kern, ref):
        try:
            out = jax.jit(
                lambda a: pl.pallas_call(kern, out_shape=out_shape)(a)
            )(a)
        except NotImplementedError as e:
            print(f"{name}: REJECTED ({str(e).splitlines()[0][:80]})")
            return
        err = np.abs(np.asarray(out, np.float64) - ref).max()
        print(f"{name}: OK max|err| = {err:.3e}")

    run("arcsin", k_asin, np.arcsin(np.clip(an * 0.3, -1, 1)))
    run("remainder", k_rem, np.remainder(an, 0.4))
    x = an.astype(np.float32).copy()
    for i in range(8):
        for _ in range(5):
            x = x + 0.01 * np.sin(x)
        x = x + 0.1 * (i + 1)
    run("nested fori_loop", k_nested, x)


if __name__ == "__main__":
    main()
