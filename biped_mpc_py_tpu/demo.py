"""One-tick demo: the reference's "main script" as a module entry point.

``python -m biped_mpc_py_tpu.demo`` reproduces the reference's import-time
behavior (``bipedalLocomotionMPC.py:473-495``): FK -> contact schedule ->
MPC solve -> low-level torques, printing the state reference, contact
sequence, foot reference, predicted states/controls, solve time, and joint
torques — then goes further and runs a 2-second closed-loop walking rollout
(the part the reference lists as TODO).

Flags: ``--gait {walking,standing}`` ``--compat`` (replicate the reference's
defects bit-for-bit) ``--rollout-steps N``.
"""

from __future__ import annotations

import argparse
import dataclasses
import time

import numpy as np
import jax
import jax.numpy as jnp


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--gait", choices=["walking", "standing"], default="walking")
    ap.add_argument("--compat", action="store_true",
                    help="replicate the reference's defects bit-for-bit")
    ap.add_argument("--rollout-steps", type=int, default=50)
    args = ap.parse_args()

    from biped_mpc_py_tpu.config import GaitConfig, MpcConfig
    from biped_mpc_py_tpu.control.controller import control_tick
    from biped_mpc_py_tpu.control.gait import contact_sequence
    from biped_mpc_py_tpu.control.reference import com_reference, foot_reference
    from biped_mpc_py_tpu.models.biped import (
        BipedParams, HECTOR_LEG_FK, HECTOR_LEG_JAC,
    )
    from biped_mpc_py_tpu.models.kinematics import foot_positions_world
    from biped_mpc_py_tpu.utils.precision import f32_precision

    np.set_printoptions(suppress=True, precision=2)
    if args.compat:
        mpc = dataclasses.replace(
            MpcConfig(), compat_foot_ref_bug=True, compat_force_box_bug=True,
            compat_swing_yaw_bug=True, compat_ref_col0_bug=True,
        )
        biped = BipedParams(leg=HECTOR_LEG_FK, leg_jac=HECTOR_LEG_JAC)
    else:
        mpc, biped = MpcConfig(), BipedParams()
    gait = GaitConfig(gait_mode=1 if args.gait == "walking" else 0)

    # the reference's initial conditions (bipedalLocomotionMPC.py:13-16)
    x_fb = jnp.asarray([0, 0, 0, 0, 0, 0.53, 0, 0, 0, 0, 0, 0], jnp.float32)
    q = jnp.asarray(
        [0, 0, -np.pi / 4, np.pi / 2, -np.pi / 4] * 2, jnp.float32
    )
    qd = jnp.zeros(10, jnp.float32)

    pf_w = foot_positions_world(x_fb, q, biped)
    contact = contact_sequence(0.0, mpc, gait)
    print("state reference:\n", np.asarray(com_reference(x_fb, mpc)))
    print("contact sequence:\n", np.asarray(contact))
    print("foot reference:\n",
          np.asarray(foot_reference(x_fb, 0.0, pf_w, mpc, contact)))

    tick = jax.jit(
        f32_precision(lambda x, q, qd: control_tick(x, q, qd, 0.0, mpc, gait, biped))
    )
    tick(x_fb, q, qd)  # compile
    t0 = time.perf_counter()
    tau, _, sol = tick(x_fb, q, qd)
    jax.block_until_ready(tau)
    print(f"MPC tick execution time: {time.perf_counter() - t0:.6f} seconds")
    print("States:\n", np.asarray(sol.states))
    print("Controls:\n", np.asarray(sol.controls))
    print("Torques:\n", np.asarray(tau))

    if args.rollout_steps:
        from biped_mpc_py_tpu.parallel.rollout import init_world, rollout_fn

        roll = jax.jit(f32_precision(rollout_fn(args.rollout_steps, mpc, gait)))
        jax.block_until_ready(roll(init_world(mpc), biped))  # compile
        t0 = time.perf_counter()
        w = roll(init_world(mpc), biped)
        jax.block_until_ready(w)
        dts = time.perf_counter() - t0
        x = np.asarray(w.sim.x_fb)
        print(
            f"\nclosed-loop rollout ({args.rollout_steps} ticks = "
            f"{args.rollout_steps * mpc.dt:.1f} s sim): wall {dts:.3f} s "
            f"({args.rollout_steps * mpc.dt / dts:.0f}x real-time)\n"
            f"final state: z={x[5]:.3f} attitude=({x[0]:+.3f},{x[1]:+.3f}) "
            f"falls={float(w.metrics.falls):.0f}"
        )


if __name__ == "__main__":
    main()
