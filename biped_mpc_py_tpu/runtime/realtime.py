"""Wall-clock real-time controller loop (SURVEY.md §1 "real-time loop /
scheduler" — the reference README's TODO "optimize for real-time usage,
currently very slow", ``README.md:6``).

The batched research path runs sim+control fused on-device with simulated
time; THIS module is the deployment-shaped runtime: a deadline-scheduled
25 Hz loop driving a *plant* (real robot transport, or any simulator)
through a minimal read-state/apply-torque interface, with the controller
precompiled, warm-started across ticks, and instrumented (per-tick latency
percentiles, deadline misses).

Design notes:
- The plant interface is synchronous and host-side by design — a real
  robot's state arrives over a transport the host owns. All math stays in
  the jitted tick; the loop only moves (12,)+(10,)+(10,) floats per tick.
- Low-level control runs at ``n_lowlevel`` sub-ticks per MPC tick (the
  reference structure: 25 Hz MPC / 200 Hz low-level), re-reading the plant
  state each sub-tick; the MPC solve is amortized across them.
- Scheduling: absolute deadlines from time.monotonic (no drift
  accumulation); a missed deadline is counted and the schedule re-anchored
  (skip-ahead) so one slow tick cannot cascade.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Protocol

import numpy as np
import jax
import jax.numpy as jnp

from biped_mpc_py_tpu.config import GaitConfig, MpcConfig
from biped_mpc_py_tpu.control.controller import (
    ControllerState,
    advance_cmd_ref,
    advance_v_int,
)
from biped_mpc_py_tpu.control.gait import (
    advance_gait_clock_host,
    contact_sequence,
)
from biped_mpc_py_tpu.control.lowlevel import low_level_control
from biped_mpc_py_tpu.control.mpc import solve_mpc
from biped_mpc_py_tpu.models.biped import BipedParams


class Plant(Protocol):
    """Minimal robot/simulator interface the loop drives."""

    def read_state(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """-> (x_fb (12,), q (10,), qd (10,)) in the framework conventions
        (state: [roll,pitch,yaw, p, omega_world, v_world])."""
        ...

    def foot_positions(self) -> np.ndarray:
        """-> world foot/sole positions (6,) [left, right]."""
        ...

    def apply(self, tau: np.ndarray, dt: float) -> None:
        """Apply joint torques (10,) for dt seconds (zero-order hold)."""
        ...


@dataclasses.dataclass
class LoopStats:
    """Wall-clock instrumentation of one run."""

    n_ticks: int
    deadline_misses: int
    latency_p50_ms: float
    latency_p99_ms: float
    latency_max_ms: float

    def realtime_ok(self, budget_s: float, miss_budget: float = 0.01) -> bool:
        return (
            self.deadline_misses <= self.n_ticks * miss_budget
            and self.latency_p99_ms * 1e-3 <= budget_s
        )


class RealtimeLoop:
    """Deadline-scheduled MPC + low-level loop against a :class:`Plant`."""

    def __init__(
        self,
        mpc: MpcConfig,
        gait: GaitConfig,
        biped: BipedParams,
        n_lowlevel: int = 8,
    ):
        self.mpc = mpc
        self.gait = gait
        self.n_lowlevel = n_lowlevel
        self._solve = jax.jit(
            lambda x, t, pf, c, w, r, vi: solve_mpc(
                x, t, pf, mpc, biped, c, warm=w, gait=gait, cmd_ref=r,
                v_int=vi,
            )
        )
        self._lowlevel = jax.jit(
            lambda x, t, pf, q, qd, c, u0, r, vi: low_level_control(
                x, t, pf, q, qd, mpc, biped, c, u0, gait=gait, cmd_ref=r,
                v_int=vi,
            )
        )
        # contact-sensed gait clock state (GaitConfig.contact_clock):
        # host-side, advanced by gait.advance_gait_clock_host from the
        # plant's sole heights — the deployment-path analog of the
        # engine/MuJoCo clocks (init so the first advanced step is 0)
        self._t_gait = -float(mpc.dt)
        self._hold = 0
        self._advance_ref = jax.jit(
            lambda r, x: advance_cmd_ref(r, x, mpc)
        )
        self._advance_vi = jax.jit(
            lambda v, x: advance_v_int(v, x, mpc)
        )
        self.ctrl = ControllerState.init(mpc)

    def warmup(self, plant: Plant) -> None:
        """Trigger all compilations off the deadline path."""
        x_fb, q, qd = plant.read_state()
        pf = plant.foot_positions()
        c = contact_sequence(0.0, self.mpc, self.gait)
        sol = self._solve(
            jnp.asarray(x_fb, jnp.float32), 0.0, jnp.asarray(pf, jnp.float32),
            c, self.ctrl.qp, self.ctrl.cmd_ref, self.ctrl.v_int,
        )
        tau = self._lowlevel(
            jnp.asarray(x_fb, jnp.float32), 0.0, jnp.asarray(pf, jnp.float32),
            jnp.asarray(q, jnp.float32), jnp.asarray(qd, jnp.float32),
            c, sol.controls[0], self.ctrl.cmd_ref, self.ctrl.v_int,
        )
        jax.block_until_ready(tau)
        jax.block_until_ready(
            self._advance_ref(self.ctrl.cmd_ref, jnp.asarray(x_fb, jnp.float32))
        )

    def run(
        self,
        plant: Plant,
        n_ticks: int,
        t0: float = 0.0,
        realtime: bool = True,
    ) -> LoopStats:
        """Run n_ticks MPC periods. ``realtime=False`` disables deadline
        sleeping (as-fast-as-possible; latency stats still collected)."""
        mpc, gait = self.mpc, self.gait
        ll_dt = mpc.dt / self.n_lowlevel
        latencies = []
        misses = 0
        t_sim = t0
        anchor = time.monotonic()
        for k in range(n_ticks):
            deadline = anchor + (k + 1) * mpc.dt
            tick_start = time.monotonic()

            x_fb, q, qd = plant.read_state()
            pf = plant.foot_positions()
            x_j = jnp.asarray(x_fb, jnp.float32)
            pf_j = jnp.asarray(pf, jnp.float32)
            if gait.contact_clock:
                # touchdown-sensed schedule re-anchoring from the
                # plant's measured sole heights (flat-ground contact;
                # a real robot would wire its foot switches here)
                down = (pf[2] < gait.clock_z_tol, pf[5] < gait.clock_z_tol)
                self._t_gait, self._hold = advance_gait_clock_host(
                    self._t_gait, self._hold, down, mpc, gait
                )
                t_used = self._t_gait
            else:
                t_used = t_sim
            contact = contact_sequence(t_used, mpc, gait)
            v_int_now = self.ctrl.v_int
            sol = self._solve(
                x_j, t_used, pf_j, contact, self.ctrl.qp, self.ctrl.cmd_ref,
                v_int_now,
            )
            self.ctrl = ControllerState(
                qp=sol, cmd_ref=self._advance_ref(self.ctrl.cmd_ref, x_j),
                v_int=self._advance_vi(self.ctrl.v_int, x_j),
            )
            u0 = sol.controls[0]
            for j in range(self.n_lowlevel):
                x_fb, q, qd = plant.read_state()
                pf = plant.foot_positions()
                tau = self._lowlevel(
                    jnp.asarray(x_fb, jnp.float32), t_used + j * ll_dt,
                    jnp.asarray(pf, jnp.float32), jnp.asarray(q, jnp.float32),
                    jnp.asarray(qd, jnp.float32), contact, u0,
                    self.ctrl.cmd_ref, v_int_now,
                )
                plant.apply(np.asarray(tau), ll_dt)

            latencies.append(time.monotonic() - tick_start)
            t_sim += mpc.dt
            if realtime:
                now = time.monotonic()
                if now > deadline:
                    misses += 1
                    # re-anchor: don't let one overrun cascade into a
                    # permanent backlog
                    anchor = now - (k + 1) * mpc.dt
                else:
                    time.sleep(deadline - now)

        lat = np.asarray(latencies) * 1e3
        return LoopStats(
            n_ticks=n_ticks,
            deadline_misses=misses,
            latency_p50_ms=float(np.percentile(lat, 50)),
            latency_p99_ms=float(np.percentile(lat, 99)),
            latency_max_ms=float(lat.max()),
        )


