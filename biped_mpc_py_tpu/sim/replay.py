"""Trajectory export for offline visualization / replay.

The reference repo has no visualization path at all (its README's TODO);
here any engine rollout can be exported as a standard MuJoCo pair —
``model.xml`` (sim/mjcf.py) + ``traj.npz`` with the qpos track — so any
MuJoCo viewer (``python -m mujoco.viewer``, mujoco_wasm, etc.) or
``mujoco.Renderer`` replays it without this package installed:

    import mujoco, numpy as np
    m = mujoco.MjModel.from_xml_path("model.xml")
    d = mujoco.MjData(m)
    t = np.load("traj.npz")
    for q in t["qpos"]:
        d.qpos[:] = q; mujoco.mj_forward(m, d)  # -> render

qpos layout (17,): free-joint [pos(3), quat wxyz(4)] + 10 joint angles —
identical between :class:`~biped_mpc_py_tpu.sim.engine.ArtState` and the
exported MJCF (sim/mj_driver.py::state_from_mj is the inverse map).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from biped_mpc_py_tpu.config import GaitConfig, MpcConfig
from biped_mpc_py_tpu.models.biped import BipedParams
from biped_mpc_py_tpu.sim.mjcf import set_hfield_data, to_mjcf
from biped_mpc_py_tpu.sim.model import ArticulatedModel, hector_model


def rollout_qpos_track(
    mpc: MpcConfig,
    gait: GaitConfig,
    n_ticks: int,
    model: ArticulatedModel | None = None,
    biped: BipedParams | None = None,
    terrain=None,
    **tick_kw,
):
    """Run an articulated closed-loop rollout and return its qpos track.

    Returns ``(qpos (n_ticks, 17), times (n_ticks,), falls)`` — one frame
    per 40 ms MPC tick (25 fps; real-time playback at the control rate).
    The whole rollout is ONE jitted scan on the current backend.
    """
    from biped_mpc_py_tpu.parallel.rollout_art import (
        art_closed_loop_tick, init_art_world,
    )
    from biped_mpc_py_tpu.utils.precision import f32_precision

    model = model or hector_model()
    biped = biped or BipedParams()

    def step(w, _):
        w2 = art_closed_loop_tick(
            w, mpc, gait, biped, model, terrain=terrain, **tick_kw
        )
        s = w2.sim
        frame = jnp.concatenate([s.pos, s.quat, s.q])
        return w2, (frame, s.t)

    @jax.jit
    @f32_precision
    def run(w):
        return jax.lax.scan(step, w, None, length=n_ticks)

    w, (frames, times) = run(init_art_world(mpc))
    return np.asarray(frames), np.asarray(times), float(w.metrics.falls)


def export_rollout(
    prefix: str,
    mpc: MpcConfig,
    gait: GaitConfig,
    n_ticks: int,
    model: ArticulatedModel | None = None,
    biped: BipedParams | None = None,
    terrain=None,
    **tick_kw,
) -> dict:
    """Export ``<prefix>_model.xml`` + ``<prefix>_traj.npz`` for replay.

    The MJCF carries the contact geometry (and the height field when
    ``terrain`` is given — its grid is embedded in the npz since inline
    MJCF elevation data is compiler-reordered; a loader with mujoco
    installed can call :func:`restore_hfield`). Returns a summary dict.
    """
    model = model or hector_model()
    qpos, times, falls = rollout_qpos_track(
        mpc, gait, n_ticks, model=model, biped=biped, terrain=terrain,
        **tick_kw,
    )
    xml = to_mjcf(
        model, 4e-2, contact=True, terrain=terrain,
        sphere_r=0.02 if terrain is not None else 0.005,
    )
    with open(f"{prefix}_model.xml", "w") as f:
        f.write(xml)
    extra = {}
    if terrain is not None:
        extra = dict(
            terrain_heights=np.asarray(terrain.heights),
            terrain_extent=np.asarray(terrain.extent),
        )
    np.savez(f"{prefix}_traj.npz", qpos=qpos, times=times, **extra)
    return dict(
        frames=int(qpos.shape[0]), duration_s=float(times[-1]),
        falls=falls, files=[f"{prefix}_model.xml", f"{prefix}_traj.npz"],
    )


class _HeightsOnly:
    def __init__(self, heights):
        self.heights = heights


def restore_hfield(mj_model, npz) -> None:
    """Fill a loaded MjModel's hfield from an exported traj.npz."""
    set_hfield_data(mj_model, _HeightsOnly(npz["terrain_heights"]))
