"""On-device stage timing of the SRB batched tick (scan x100 per stage)."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from biped_mpc_py_tpu.config import GaitConfig, fast_mpc_config
from biped_mpc_py_tpu.control.gait import contact_sequence
from biped_mpc_py_tpu.control.mpc import build_mpc_qp
from biped_mpc_py_tpu.control.reference import com_reference, foot_reference
from biped_mpc_py_tpu.models.biped import BipedParams
from biped_mpc_py_tpu.models.srb import linearize_horizon
from biped_mpc_py_tpu.ops.qp import (
    condense, ns_inverse, ruiz_equilibrate, solve_qp_batch,
)
from biped_mpc_py_tpu.parallel.rollout import (
    batch_worlds, batched_closed_loop_tick,
)
from biped_mpc_py_tpu.utils.precision import f32_precision

N = 1024
mpc = fast_mpc_config()
gait = GaitConfig()
biped = BipedParams()
worlds = batch_worlds(mpc, N)
bipeds = jax.tree.map(lambda x: jnp.broadcast_to(x, (N,) + jnp.shape(x)), biped)
sim = worlds.sim

contact = jax.vmap(lambda t: contact_sequence(t, mpc, gait))(sim.t)
qp = jax.vmap(
    lambda x, t, f, b, c: build_mpc_qp(x, t, f, mpc, b, c, gait)
)(sim.x_fb, sim.t, sim.foot, bipeds, contact)


def scan100(f, *args):
    @jax.jit
    @f32_precision
    def run(*a):
        def body(c, _):
            out = f(*a)
            # fold output into carry so the loop isn't DCE'd
            s = jax.tree.reduce(
                lambda acc, x: acc + jnp.sum(jnp.abs(x).astype(jnp.float32)) * 0,
                out, jnp.float32(0.0),
            )
            return c + s, None
        return jax.lax.scan(body, jnp.float32(0.0), None, length=100)[0]

    out = run(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(run(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts) / 100 * 1e3  # ms per invocation


refs = lambda: jax.vmap(lambda x, t, f, c: (
    com_reference(x, mpc), foot_reference(x, t, f, mpc, c, gait)
))(sim.x_fb, sim.t, sim.foot, contact)
print(f"references: {scan100(refs):.2f} ms/1024", flush=True)

x_ref, f_ref = refs()
lin = lambda: jax.vmap(lambda xr, fr, b: linearize_horizon(mpc, b, xr, fr))(
    x_ref, f_ref, bipeds)
print(f"linearize:  {scan100(lin):.2f} ms/1024", flush=True)

A, B = lin()
cond = lambda: jax.vmap(
    lambda x, xr, a, b2, c, bp: condense(mpc, bp, x, xr, a, b2, c)
)(sim.x_fb, x_ref, A, B, contact, bipeds)
print(f"condense:   {scan100(cond):.2f} ms/1024", flush=True)

ruiz = lambda: jax.vmap(ruiz_equilibrate)(qp)
print(f"ruiz:       {scan100(ruiz):.2f} ms/1024", flush=True)

Ph = jax.vmap(ruiz_equilibrate)(qp)[0]
K = Ph + 1e-6 * jnp.eye(120)
print(f"ns_inv(14):        {scan100(lambda: ns_inverse(K, 14)):.2f} ms/1024", flush=True)
print(f"ns_inv(10):        {scan100(lambda: ns_inverse(K, 10)):.2f} ms/1024", flush=True)
print(f"ns_inv(10,bf16=8): {scan100(lambda: ns_inverse(K, 10, 8)):.2f} ms/1024", flush=True)

import dataclasses
mpc_f32 = dataclasses.replace(mpc, kinv_bf16_iters=0, admm_bf16_matvec=False)
solve = lambda: solve_qp_batch(qp, mpc_f32, backend="xla").controls
print(f"full solve (f32):  {scan100(solve):.2f} ms/1024", flush=True)
solve2 = lambda: solve_qp_batch(qp, mpc, backend="xla").controls
print(f"full solve (bf16): {scan100(solve2):.2f} ms/1024", flush=True)

tick_f32 = lambda: batched_closed_loop_tick(worlds, mpc_f32, gait, bipeds)
print(f"full tick (f32):   {scan100(tick_f32):.2f} ms/1024", flush=True)
tick = lambda: batched_closed_loop_tick(worlds, mpc, gait, bipeds)
print(f"full tick (bf16):  {scan100(tick):.2f} ms/1024", flush=True)
