"""Hardware validation of the CONE-ENABLED fused QP kernel (round 5,
VERDICT item 4).

With ``mpc.mu_z`` set the per-step row count grows 24 -> 28
(ops/qp.py::torsional_rows; reference line-foot/cone rows
``bipedalLocomotionMPC.py:253-271``), so the padded constraint dimension
M_PAD grows 256 -> 384 and every M_PAD-shaped VMEM buffer gains +50%.
The auto block_envs=2 at M_PAD=384 was ARITHMETIC-derived from the
measured ~11.4 MB at (block 4, M_PAD=256); this probe actually compiles
and times the kernel on the chip at block_envs in {1, 2} and checks
backend agreement (pallas vs xla controls) at the full default budget.

Usage: python tools/bench_cone_kernel.py [envs]   (TPU; ONE process)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from biped_mpc_py_tpu.config import GaitConfig, MpcConfig
from biped_mpc_py_tpu.control.gait import contact_sequence
from biped_mpc_py_tpu.models.biped import BipedParams
from biped_mpc_py_tpu.control.mpc import build_mpc_qp
from biped_mpc_py_tpu.ops.qp import solve_qp_batch
from biped_mpc_py_tpu.utils.precision import f32_precision

N = int(sys.argv[1]) if len(sys.argv) > 1 else 256


def main():
    mpc = MpcConfig(mu_z=0.06)  # load-dependent torsional cone ON
    biped = BipedParams()
    contact = contact_sequence(0.0, mpc, GaitConfig())
    rng = np.random.default_rng(0)
    # 0.01-scale perturbations = realistic walking states the budget
    # CONVERGES on (0.05-scale randoms leave res_prim ~0.2 where the two
    # f32 rho-repick trajectories legitimately diverge — the round-1
    # compare-SOLUTIONS lesson; timing is state-independent either way)
    xs = jnp.asarray(
        rng.normal(size=(N, 12)) * 0.01
        + np.array([0, 0, 0, 0, 0, 0.53, 0, 0, 0, 0, 0, 0]),
        jnp.float32,
    )
    foot = jnp.tile(
        jnp.asarray([-0.02, 0.09, 0, -0.02, -0.09, 0], jnp.float32), (N, 1)
    )
    build = jax.jit(
        f32_precision(
            jax.vmap(lambda x, f: build_mpc_qp(x, 0.0, f, mpc, biped, contact))
        )
    )
    qp = jax.block_until_ready(build(xs, foot))
    m_tot = qp.A_step.shape[-2] * mpc.h  # 28 rows/step x h = 280
    print(f"envs={N} m_tot={m_tot} M_PAD={-(-m_tot // 128) * 128}", flush=True)

    sols = {}
    for be, kw in (
        ("xla", {}),
        ("pallas_b1", dict(backend="pallas", block_envs=1)),
        ("pallas_b2", dict(backend="pallas", block_envs=2)),
    ):
        fn = jax.jit(
            f32_precision(
                lambda q, kw=kw: solve_qp_batch(q, mpc, **kw)
            )
        )
        t0 = time.time()
        sol = jax.block_until_ready(fn(qp))
        compile_s = time.time() - t0
        t0 = time.time()
        reps = 5
        for _ in range(reps):
            sol = jax.block_until_ready(fn(qp))
        per = (time.time() - t0) / reps
        sols[be] = sol
        print(
            f"{be}: compile+first={compile_s:.1f}s steady={per * 1e3:.2f} ms"
            f" ({per / N * 1e6:.1f} us/env) res_prim_max="
            f"{float(sol.res_prim.max()):.2e}",
            flush=True,
        )

    # Per-env agreement: the batch max is dominated by the random TAIL envs
    # whose ADMM did not converge at the fixed budget (two f32 solvers
    # legitimately diverge there — the round-1 compare-SOLUTIONS lesson).
    # The meaningful number is agreement over the CONVERGED envs.
    res = np.array(sols["xla"].res_prim)
    conv = res < 1e-2
    print(
        f"converged envs (xla res_prim < 1e-2): {int(conv.sum())}/{N}",
        flush=True,
    )
    for be in ("pallas_b1", "pallas_b2"):
        d = np.abs(
            np.array(sols[be].controls) - np.array(sols["xla"].controls)
        ).max(axis=(1, 2))
        print(
            f"{be} vs xla |controls| diff: median={np.median(d):.2e} "
            f"p95={np.percentile(d, 95):.2e} max={d.max():.2e} "
            f"max_converged={d[conv].max():.2e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
