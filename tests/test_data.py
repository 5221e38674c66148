"""Data layer tests: windows, normalizer, replay buffer, trajectory IO."""

import jax
import jax.numpy as jnp
import numpy as np

from gan_mpc_tpu.data import (
    Normalizer,
    ReplayBuffer,
    TrajectorySet,
    cost_windows,
    load_trajectories,
    save_trajectories,
    sequence_windows,
    shuffle_and_split,
)

KEY = jax.random.PRNGKey(0)


def test_sequence_windows_match_manual():
    states = jnp.arange(2 * 10 * 1, dtype=jnp.float32).reshape(2, 10, 1)
    actions = -states[..., :1]
    X, U, Y = sequence_windows(states, actions, seqlen=4)
    assert X.shape == (2 * 6, 4, 1)
    np.testing.assert_array_equal(np.asarray(X[0, :, 0]), [0, 1, 2, 3])
    np.testing.assert_array_equal(np.asarray(Y[0, :, 0]), [1, 2, 3, 4])
    np.testing.assert_array_equal(np.asarray(U[0]), np.asarray(-X[0]))
    # second trajectory's first window starts at its own origin
    np.testing.assert_array_equal(np.asarray(X[6, :, 0]), [10, 11, 12, 13])


def test_cost_windows_zero_padded_history():
    states = jnp.arange(1 * 12 * 1, dtype=jnp.float32).reshape(1, 12, 1) + 1
    X, Y = cost_windows(states, history=2, horizon=3)
    assert X.shape == (12 - 3 - 2, 3, 1)
    assert Y.shape == (12 - 3 - 2, 4, 1)
    # first window: history rows are the zero padding
    np.testing.assert_array_equal(np.asarray(X[0, :, 0]), [0, 0, 1])
    np.testing.assert_array_equal(np.asarray(Y[0, :, 0]), [1, 2, 3, 4])
    # X last row ("now") always equals Y first row
    np.testing.assert_array_equal(np.asarray(X[:, -1]), np.asarray(Y[:, 0]))


def test_shuffle_and_split():
    data = (jnp.arange(100).reshape(100, 1),)
    (train,), (test,) = shuffle_and_split(data, KEY, 0.8)
    assert train.shape == (80, 1) and test.shape == (20, 1)
    merged = np.sort(np.concatenate([np.asarray(train), np.asarray(test)]), 0)
    np.testing.assert_array_equal(merged[:, 0], np.arange(100))


def test_normalizer_fit_and_roundtrip():
    states = jax.random.normal(KEY, (5, 30, 3)) * 4.0 + 2.0
    actions = jax.random.normal(KEY, (5, 30, 1))
    norm = Normalizer.fit(states, actions)
    z = norm.normalize_state(states.reshape(-1, 3))
    np.testing.assert_allclose(np.asarray(z.mean(0)), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(z.std(0)), 1.0, atol=1e-4)
    back = norm.denormalize_state(z)
    np.testing.assert_allclose(
        np.asarray(back), np.asarray(states.reshape(-1, 3)), rtol=1e-5
    )
    # action normalizer defaults to identity (reference semantics)
    np.testing.assert_array_equal(
        np.asarray(norm.normalize_action(actions)), np.asarray(actions)
    )


def test_replay_buffer_ring_semantics():
    buf = ReplayBuffer.create(capacity=8, seqlen=3, x_size=2, u_size=1)
    states = jnp.ones((1, 9, 2))  # -> 6 windows
    actions = jnp.ones((1, 9, 1))
    buf = jax.jit(lambda b: b.add_trajectories(states, actions))(buf)
    assert int(buf.size) == 6 and int(buf.ptr) == 6
    buf = buf.add_trajectories(2 * states, 2 * actions)  # 6 more, wraps
    assert int(buf.size) == 8
    assert int(buf.ptr) == 4
    # slots 0..3 overwritten by the second add (wrapped), 4..5 original
    assert float(buf.states[0, 0, 0]) == 2.0
    assert float(buf.states[5, 0, 0]) == 1.0
    x, u, y = buf.sample(KEY, steps=4, batch_size=16)
    assert x.shape == (4, 16, 3, 2)


def test_trajectory_io_and_filtering(tmp_path):
    rng = np.random.RandomState(0)
    states = rng.randn(4, 20, 3).astype(np.float32)
    actions = rng.randn(4, 20, 1).astype(np.float32)
    rewards = np.zeros((4, 20), np.float32)
    rewards[0] += 40.0  # total 800: keep (rank 1)
    rewards[1] += 10.0  # total 200: filtered out
    rewards[2] += 50.0  # total 1000: keep (rank 0)
    rewards[3] += 30.0  # total 600: keep (rank 2)
    ts = TrajectorySet(states, actions, rewards)
    for fname in ["t.json", "t.npz"]:
        path = str(tmp_path / fname)
        save_trajectories(path, ts)
        out = load_trajectories(path, num_trajectories=2, trajectory_len=10)
        assert out.states.shape == (2, 10, 3)
        np.testing.assert_allclose(out.states[0], states[2, :10], rtol=1e-6)
        np.testing.assert_allclose(out.states[1], states[0, :10], rtol=1e-6)


def test_sequence_windows_start_oversample():
    import jax.numpy as jnp

    from gan_mpc_tpu.data.windows import sequence_windows

    states = jnp.arange(2 * 12 * 1, dtype=jnp.float32).reshape(2, 12, 1)
    actions = jnp.zeros((2, 12, 1))
    X0, _, _ = sequence_windows(states, actions, seqlen=4)
    X, _, Y = sequence_windows(states, actions, seqlen=4, start_oversample=3)
    per_traj = 12 - 4
    assert X0.shape[0] == 2 * per_traj
    assert X.shape[0] == 2 * (per_traj + 3 * 4)
    # the duplicated windows are the first `seqlen` windows of each traj
    first = X.reshape(2, per_traj + 12, 4, 1)[0]
    np.testing.assert_allclose(first[per_traj], first[0])
    # next-state alignment preserved
    np.testing.assert_allclose(
        np.asarray(Y[0, :, 0]), np.asarray(X[0, :, 0]) + 1
    )


def test_split_sequence_windows_heldout_disjoint_from_train():
    """Oversampling must not leak duplicated windows into the held-out
    split (ADVICE round 2): split first, oversample only the train side."""
    import jax
    import jax.numpy as jnp

    from gan_mpc_tpu.data.windows import (
        sequence_windows,
        split_sequence_windows,
    )

    states = jnp.arange(3 * 20 * 1, dtype=jnp.float32).reshape(3, 20, 1)
    actions = jnp.zeros((3, 20, 1))
    train, test = split_sequence_windows(
        states, actions, seqlen=4, key=jax.random.PRNGKey(0),
        start_oversample=5,
    )
    base_n = 3 * (20 - 4)
    cut = int(base_n * 0.8)
    assert test[0].shape[0] == base_n - cut
    assert train[0].shape[0] >= cut  # base train + oversampled copies
    # every window is identified by its first state value (windows are
    # strictly increasing sequences here) — no overlap across splits
    train_ids = set(np.asarray(train[0][:, 0, 0]).tolist())
    test_ids = set(np.asarray(test[0][:, 0, 0]).tolist())
    assert not (train_ids & test_ids)
    # all oversampled copies are early windows (start position < seqlen)
    counts = {}
    for v in np.asarray(train[0][:, 0, 0]).tolist():
        counts[v] = counts.get(v, 0) + 1
    for v, c in counts.items():
        if c > 1:
            assert (v % 20) < 4, f"non-early window {v} duplicated"
    # union covers the same base windows as the unsplit construction
    X0, _, _ = sequence_windows(states, actions, seqlen=4)
    all_ids = set(np.asarray(X0[:, 0, 0]).tolist())
    assert (train_ids | test_ids) == all_ids


def test_collection_reset_velocity_covers_moving_starts():
    from gan_mpc_tpu.envs import make_env
    from gan_mpc_tpu.runners.collect import collect_expert_trajectories

    env = make_env("pendulum_swingup")
    ts = collect_expert_trajectories(
        env,
        4,
        jax.random.PRNGKey(0),
        num_steps=60,
        reset_velocity_sigma=2.0,
    )
    # with sigma=2 at least one episode starts visibly mid-motion
    assert np.abs(ts.states[:, 0, 2]).max() > 0.5
    assert np.isfinite(ts.states).all()


def test_dagger_reward_weighted_sampling_targets_failure_states():
    """reward_weighted DAgger sampling must bias corrective-segment
    start states toward the LOW-reward band the policy lingers in
    (slow swingup), vs uniform sampling which mirrors visitation."""
    from gan_mpc_tpu.data.normalizer import Normalizer
    from gan_mpc_tpu.envs import make_env
    from gan_mpc_tpu.runners.collect import (
        collect_dagger_trajectories,
        scripted_expert,
    )

    env = make_env("pendulum_swingup")
    expert = scripted_expert(env)

    class ExpertAsPolicy:
        batch_native = False

        def act(self, params, hist_x, hist_u):
            return jnp.reshape(
                expert(None, hist_x[-1][None], None), (env.act_size,)
            )

    norm = Normalizer.identity(env.obs_size, env.act_size)
    common = dict(
        num_segments=48,
        segment_steps=5,
        policy_steps=400,
        policy_episodes=4,
        history=1,
    )
    outs = {}
    for mode in ("uniform", "reward_weighted"):
        ts = collect_dagger_trajectories(
            env,
            env.default_params(),
            ExpertAsPolicy(),
            None,
            norm,
            jax.random.PRNGKey(3),
            state_weighting=mode,
            **common,
        )
        # pendulum obs = (cos th, sin th, thdot); start-state "height"
        # cos(theta) ~ 1 means balanced (high reward), ~ -1 hanging
        outs[mode] = float(np.mean(ts.states[:, 0, 0]))
        assert np.isfinite(ts.states).all()
    assert outs["reward_weighted"] < outs["uniform"] - 0.3, outs
