"""Expert trajectory persistence and filtering.

Capability parity with ``/root/reference/data_loader.py:18-33``: load a
``trajectories.json`` with keys states/actions/rewards, keep only
trajectories whose total reward clears a quality gate, take the top-k by
reward, truncate to a fixed length. Adds an ``.npz`` fast path (binary,
mmap-able) since JSON decode of big float arrays is a host bottleneck.
"""

from __future__ import annotations

import json
import os
from typing import NamedTuple, Optional

import numpy as np


class TrajectorySet(NamedTuple):
    states: np.ndarray  # (N, L, x)
    actions: np.ndarray  # (N, L, u) expert's (clean) actions
    rewards: np.ndarray  # (N, L)
    # actions actually EXECUTED during collection (== actions unless the
    # collector injected exploration noise). Dynamics models must train on
    # these: (x, executed_u, x') are the physically consistent transitions,
    # while behavior cloning / expert prediction uses the clean actions.
    executed_actions: Optional[np.ndarray] = None

    @property
    def dynamics_actions(self) -> np.ndarray:
        return (
            self.executed_actions
            if self.executed_actions is not None
            else self.actions
        )


def save_trajectories(path: str, trajs: TrajectorySet) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    extra = {}
    if trajs.executed_actions is not None:
        extra["executed_actions"] = trajs.executed_actions
    if path.endswith(".gmts"):
        # native binary store (C++ fast path; see data/native_store.py).
        # The binary format stores the three reference-schema arrays; the
        # executed-action channel rides in a sidecar .npz.
        from gan_mpc_tpu.data import native_store

        native_store.write_trajectories(path, trajs)
        if extra:
            np.savez_compressed(path + ".exec.npz", **extra)
    elif path.endswith(".npz"):
        np.savez_compressed(
            path,
            states=trajs.states,
            actions=trajs.actions,
            rewards=trajs.rewards,
            **extra,
        )
    else:
        with open(path, "w") as fp:
            json.dump(
                {
                    "states": trajs.states.tolist(),
                    "actions": trajs.actions.tolist(),
                    "rewards": trajs.rewards.tolist(),
                    **{k: v.tolist() for k, v in extra.items()},
                },
                fp,
            )


def load_trajectories(
    path: str,
    num_trajectories: Optional[int] = None,
    trajectory_len: Optional[int] = None,
    min_reward: float = 500.0,
) -> TrajectorySet:
    """Load + quality-gate expert trajectories.

    The reference hardcodes the >500 reward gate
    (``data_loader.py:25-27``); here it is a parameter with the same
    default. Set ``min_reward=None``-like (-inf) to keep everything.
    """
    executed = None
    if path.endswith(".gmts"):
        import os as _os

        from gan_mpc_tpu.data import native_store

        ts = native_store.read_trajectories(path)
        states, actions, rewards = ts.states, ts.actions, ts.rewards
        if _os.path.exists(path + ".exec.npz"):
            executed = np.asarray(
                np.load(path + ".exec.npz")["executed_actions"], np.float32
            )
    elif path.endswith(".npz"):
        data = np.load(path)
        states, actions, rewards = (
            np.asarray(data["states"], np.float32),
            np.asarray(data["actions"], np.float32),
            np.asarray(data["rewards"], np.float32),
        )
        if "executed_actions" in data:
            executed = np.asarray(data["executed_actions"], np.float32)
    else:
        with open(path, "r") as fp:
            data = json.load(fp)
        states = np.asarray(data["states"], np.float32)
        actions = np.asarray(data["actions"], np.float32)
        rewards = np.asarray(data["rewards"], np.float32)
        if "executed_actions" in data:
            executed = np.asarray(data["executed_actions"], np.float32)

    totals = rewards.sum(axis=1)
    order = np.argsort(-totals)
    order = [i for i in order if totals[i] > min_reward]
    if num_trajectories is not None:
        order = order[:num_trajectories]
    if not order:
        raise ValueError(
            f"no trajectories in {path!r} exceed total reward {min_reward}"
        )
    sl = slice(None, trajectory_len)
    return TrajectorySet(
        states=states[order, sl],
        actions=actions[order, sl],
        rewards=rewards[order, sl],
        executed_actions=(
            executed[order, sl] if executed is not None else None
        ),
    )
