"""Native (C++) trajectory store: must agree exactly with the numpy/JAX
reference implementations."""

import numpy as np
import pytest

from gan_mpc_tpu.data import cost_windows, sequence_windows
from gan_mpc_tpu.data.trajectories import TrajectorySet
from gan_mpc_tpu.data import native_store

pytestmark = pytest.mark.skipif(
    not native_store.available(), reason="native toolchain unavailable"
)

RNG = np.random.RandomState(0)


def _trajs(n=3, length=40, x=5, u=2):
    return TrajectorySet(
        states=RNG.randn(n, length, x).astype(np.float32),
        actions=RNG.randn(n, length, u).astype(np.float32),
        rewards=RNG.rand(n, length).astype(np.float32),
    )


def test_binary_roundtrip(tmp_path):
    ts = _trajs()
    path = str(tmp_path / "t.gmts")
    native_store.write_trajectories(path, ts)
    out = native_store.read_trajectories(path)
    np.testing.assert_array_equal(out.states, ts.states)
    np.testing.assert_array_equal(out.actions, ts.actions)
    np.testing.assert_array_equal(out.rewards, ts.rewards)


def test_sequence_windows_match_reference():
    ts = _trajs()
    X, U, Y = native_store.sequence_windows_native(
        ts.states, ts.actions, seqlen=7
    )
    Xr, Ur, Yr = sequence_windows(ts.states, ts.actions, seqlen=7)
    np.testing.assert_array_equal(X, np.asarray(Xr))
    np.testing.assert_array_equal(U, np.asarray(Ur))
    np.testing.assert_array_equal(Y, np.asarray(Yr))


def test_cost_windows_match_reference():
    ts = _trajs(length=30)
    for history, horizon in [(1, 5), (3, 4), (2, 10)]:
        X, Y = native_store.cost_windows_native(ts.states, history, horizon)
        Xr, Yr = cost_windows(ts.states, history, horizon)
        np.testing.assert_array_equal(X, np.asarray(Xr))
        np.testing.assert_array_equal(Y, np.asarray(Yr))


def test_corrupt_file_rejected(tmp_path):
    path = tmp_path / "bad.gmts"
    path.write_bytes(b"not a trajectory store file")
    with pytest.raises(IOError):
        native_store.read_trajectories(str(path))


def test_gmts_path_through_generic_loader(tmp_path):
    from gan_mpc_tpu.data.trajectories import (
        load_trajectories,
        save_trajectories,
    )

    ts = _trajs()
    rewards = ts.rewards.copy()
    rewards[0] += 100.0  # ensure one trajectory passes a low gate
    ts = TrajectorySet(ts.states, ts.actions, rewards)
    path = str(tmp_path / "t.gmts")
    save_trajectories(path, ts)
    out = load_trajectories(path, num_trajectories=1, min_reward=10.0)
    np.testing.assert_array_equal(out.states[0], ts.states[0])
