"""On-device stage timing of the ARTICULATED batched tick (scan x25).

Decomposes the art tick (MPC solve / 8x low-level / 8x5 physics substeps)
to find the round-3 throughput lever. Usage: BENCH_ENVS=1024 python
tools/bench_art_stages.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from biped_mpc_py_tpu.config import GaitConfig, fast_mpc_config
from biped_mpc_py_tpu.control.gait import contact_sequence
from biped_mpc_py_tpu.control.lowlevel import low_level_control
from biped_mpc_py_tpu.control.mpc import solve_mpc
from biped_mpc_py_tpu.models.biped import BipedParams
from biped_mpc_py_tpu.parallel.rollout_art import (
    art_mpc_config, init_art_world,
)
from biped_mpc_py_tpu.sim.engine import (
    art_step, com_feedback_state, sole_positions,
)
from biped_mpc_py_tpu.sim.model import hector_model
from biped_mpc_py_tpu.utils.precision import f32_precision

N = int(os.environ.get("BENCH_ENVS", "1024"))
REPS = 25

model = hector_model()
biped = BipedParams()
mpc = art_mpc_config(
    n_admm_iters=40, admm_rho_phases=1, admm_polish=False,
    kinv_ns_iters=10, kinv_bf16_iters=8, admm_bf16_matvec=True,
    ruiz_bf16_norms=True,
)
gait = GaitConfig()
w = init_art_world(mpc)
sims = jax.tree.map(lambda x: jnp.broadcast_to(x, (N,) + jnp.shape(x)), w.sim)
ctrl0 = w.ctrl


def timed(name, fn, *args):
    # the computation INSIDE the scan must depend on the carry: a
    # loop-invariant body (lambda c, _: fn(*a)) is subject to XLA
    # loop-invariant code motion and can time ~one evaluation instead of
    # REPS. A zero derived from the previous iteration's output is added
    # to every float input, forcing re-execution each rep. (And even a
    # correct isolated-stage timing bounds FLOPs, not scan-embedded
    # schedule stalls — confirm levers end-to-end with bench.py;
    # docs/DESIGN_NOTES.md round 3.)
    def body(c, _):
        dep = (jax.tree.leaves(c)[0].reshape(-1)[0] * 0.0)

        def tie(x):
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
                return x + dep.astype(x.dtype)
            return x

        return fn(*jax.tree.map(tie, args)), None

    f = jax.jit(f32_precision(lambda *a: jax.lax.scan(
        body, fn(*args), None, length=REPS)[0]))
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    out = f(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / REPS * 1e3
    print(f"{name:28s} {dt:7.2f} ms / {N} envs", flush=True)
    return dt


# feedback extraction (vmapped)
fb = jax.vmap(lambda s: com_feedback_state(model, s))
pf = jax.vmap(lambda s: sole_positions(model, s))
timed("com_feedback_state", lambda s: fb(s), sims)
timed("sole_positions", lambda s: pf(s), sims)

x_fb = fb(sims)
pf_w = pf(sims)
contact = contact_sequence(0.0, mpc, gait)
u0 = jnp.zeros((N, 12))

# one MPC solve (the 25 Hz stage)
timed(
    "solve_mpc (25 Hz)",
    lambda x, p: jax.vmap(
        lambda xi, pi: solve_mpc(xi, 0.0, pi, mpc, biped, contact)
    )(x, p).controls,
    x_fb, pf_w,
)

# one low-level eval (the 200 Hz stage; x8 per tick)
timed(
    "low_level x1 (x8/tick)",
    lambda x, p, s: jax.vmap(
        lambda xi, pi, qi, qdi: low_level_control(
            xi, 0.0, pi, qi, qdi, mpc, biped, contact, u0[0]
        )
    )(x, p, s.q, s.qd),
    x_fb, pf_w, sims,
)

# physics: one ll period = art_step with 5 substeps (x8 per tick)
tau = jnp.zeros((N, 10))
timed(
    "art_step 5 substeps (x8/tick)",
    lambda s: jax.vmap(
        lambda si, ti: art_step(model, si, ti, 0.005, 5, None, m_refresh=5)
    )(s, tau),
    sims,
)
# same but with an EXTERNALLY-held mass-matrix inverse (the per-tick
# refresh candidate): isolates the cost of the per-period NS(12) inverse
from biped_mpc_py_tpu.sim.engine import mass_matrix_inv

Minv = jax.vmap(lambda q: mass_matrix_inv(model, q))(sims.q)
timed(
    "art_step 5 sub, held Minv",
    lambda s, mi: jax.vmap(
        lambda si, ti, m: art_step(model, si, ti, 0.005, 5, None, Minv=m)
    )(s, tau, mi),
    sims, Minv,
)
# the inverse itself, batched
timed(
    "mass_matrix_inv (NS12)",
    lambda s: jax.vmap(lambda q: mass_matrix_inv(model, q))(s.q),
    sims,
)
