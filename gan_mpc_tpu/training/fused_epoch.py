"""One GAN-MPC training epoch as a SINGLE jitted XLA program.

The north-star design goal (SURVEY.md §7, BASELINE.json): the entire
plan-act-learn loop on device with no host round trips. The modular
trainers (``training/*.py``) already jit each scanned segment; this module
goes the rest of the way — one ``jax.jit`` whose body is:

    1. on-policy collection: N parallel envs x (iLQR plan -> physics step)
       inside a ``lax.scan``;
    2. window the episodes and push them into the device ring replay;
    3. scanned dynamics updates from replay samples;
    4. critic dataset built by batched planning on expert histories,
       scanned BCE updates;
    5. scanned bilevel cost/generator updates through the planner's
       implicit VJP, with the Polyak blend.

Expert windows are closed over as device constants. The only host work
per epoch is reading back the scalar losses.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from gan_mpc_tpu.data.buffers import ReplayBuffer
from gan_mpc_tpu.data.windows import minibatch_indices
from gan_mpc_tpu.envs.rollout import policy_rollout
from gan_mpc_tpu.policies.losses import critic_bce_loss, gan_generator_loss
from gan_mpc_tpu.training.dynamics import multistep_prediction_loss
from gan_mpc_tpu.training.masking import polyak_blend


class FusedEpochMetrics(NamedTuple):
    episode_return: jax.Array
    dynamics_loss: jax.Array
    critic_loss: jax.Array
    generator_loss: jax.Array
    critic_test_loss: jax.Array
    generator_test_loss: jax.Array


class FusedL2Metrics(NamedTuple):
    episode_return: jax.Array
    dynamics_loss: jax.Array
    cost_loss: jax.Array
    cost_test_loss: jax.Array


def make_fused_gan_epoch(
    policy,
    env,
    env_params,
    normalizer,
    optimizers: dict,  # {"dynamics": tx, "critic": tx, "cost": tx}
    expert_history_X,  # (N, history+1, x) normalized expert histories
    expert_future_Y,  # (N, horizon+1, x) normalized expert futures
    *,
    num_envs: int,
    episode_steps: int,
    history: int,
    dynamics_updates: int,
    critic_updates: int,
    cost_updates: int,
    batch_size: int,
    gamma: float,
    polyak_factor: float,
    critic_plan_batch: int = 64,
    expert_history_X_test=None,  # held-out split for test metrics
    expert_future_Y_test=None,
    test_plan_batch: int = 64,
    expert_dyn_windows=None,  # (X, U, Y) expert sequence windows
    expert_dyn_updates: int = 0,
):
    """Build the fused epoch. Returns
    ``epoch(params, opt_states, replay, key, teacher_forcing) ->
    (params, opt_states, replay, FusedEpochMetrics)``.

    When the test split is given, each epoch also emits held-out critic /
    generator losses (planning once on ``test_plan_batch`` test windows),
    matching the modular trainers' metrics. ``expert_dyn_windows`` +
    ``expert_dyn_updates`` reproduce the modular trainer's per-epoch
    expert-distribution refresh (``training/dynamics.py:151-169``) —
    pure on-policy data collapses the model onto wherever the policy
    visits.
    """

    exp_X = jnp.asarray(expert_history_X)
    exp_Y = jnp.asarray(expert_future_Y)
    have_test = expert_history_X_test is not None
    if have_test:
        tX = jnp.asarray(expert_history_X_test)[:test_plan_batch]
        tY = jnp.asarray(expert_future_Y_test)[:test_plan_batch]
    have_exp_dyn = expert_dyn_windows is not None and expert_dyn_updates > 0
    if have_exp_dyn:
        edX, edU, edY = (jnp.asarray(a) for a in expert_dyn_windows)
    steps_per_update = max(exp_X.shape[0] // batch_size, 1)

    def _scan_updates(params, opt, opt_state, loss_of_batch, perm):
        def body(carry, p):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(loss_of_batch)(params, p)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), perm
        )
        return params, opt_state, jnp.mean(losses)

    def _plan_states(params, history_x):
        zeros_u = jnp.zeros(
            (history_x.shape[0] - 1, policy.expert_model.u_size),
            jnp.float32,
        )
        sol = policy.plan(params, history_x, zeros_u, warm_start_carry=False)
        return policy.planned_states(sol)

    @jax.jit
    def epoch(params, opt_states, replay: ReplayBuffer, key, teacher_forcing):
        # independent streams per consumer (a shared key would correlate
        # the critic's plan-subset choice with its minibatch permutation)
        (
            k_collect,
            k_dyn,
            k_crit_idx,
            k_crit_perm,
            k_cost,
            k_shuffle,
        ) = jax.random.split(key, 6)

        # ---- 1. on-policy collection (batched, fully on device;
        # batch-native planner when the dynamics net supports it) --------
        episode = policy_rollout(
            env,
            env_params,
            policy,
            params,
            normalizer,
            k_collect,
            num_steps=episode_steps,
            history=history,
            num_envs=num_envs,
        )
        ep_return = jnp.mean(jnp.sum(episode.rewards, axis=-1))

        # ---- 2. window + device replay insert -------------------------
        replay = replay.add_trajectories(
            normalizer.normalize_state(episode.states),
            normalizer.normalize_action(episode.actions),
        )

        # ---- 3. dynamics updates from replay ---------------------------
        def dyn_batch_loss(params, idx):
            X, U, Y = (
                replay.states[idx],
                replay.actions[idx],
                replay.next_states[idx],
            )
            losses = jax.vmap(
                lambda x, u, y: multistep_prediction_loss(
                    policy.dynamics_model,
                    params["dynamics_params"],
                    x,
                    u,
                    y,
                    gamma,
                    teacher_forcing,
                )
            )(X, U, Y)
            return jnp.mean(losses)

        dyn_perm = jax.random.randint(
            k_dyn,
            (dynamics_updates * steps_per_update, batch_size),
            0,
            jnp.maximum(replay.size, 1),
        )
        params, dyn_state, dyn_loss = _scan_updates(
            params,
            optimizers["dynamics"],
            opt_states["dynamics"],
            dyn_batch_loss,
            dyn_perm,
        )

        # ---- 3b. expert-distribution refresh (teacher-forced) ----------
        if have_exp_dyn:

            def exp_dyn_loss(params, idx):
                losses = jax.vmap(
                    lambda x, u, y: multistep_prediction_loss(
                        policy.dynamics_model,
                        params["dynamics_params"],
                        x,
                        u,
                        y,
                        gamma,
                        jnp.asarray(True),
                    )
                )(edX[idx], edU[idx], edY[idx])
                return jnp.mean(losses)

            exp_perm = jax.random.randint(
                jax.random.fold_in(k_dyn, 1),
                (expert_dyn_updates, batch_size),
                0,
                edX.shape[0],
            )
            params, dyn_state, _ = _scan_updates(
                params,
                optimizers["dynamics"],
                dyn_state,
                exp_dyn_loss,
                exp_perm,
            )

        # ---- 4. critic: plan on a subset of expert histories -----------
        plan_idx = jax.random.choice(
            k_crit_idx,
            exp_X.shape[0],
            shape=(critic_plan_batch,),
            replace=False,
        )
        fake_Y = jax.vmap(lambda hx: _plan_states(params, hx))(
            exp_X[plan_idx]
        )
        seqs = jnp.concatenate([exp_Y[plan_idx], fake_Y], axis=0)
        labels = jnp.concatenate(
            [
                jnp.ones((critic_plan_batch,), jnp.float32),
                -jnp.ones((critic_plan_batch,), jnp.float32),
            ]
        )
        shuffle = jax.random.permutation(k_shuffle, 2 * critic_plan_batch)
        seqs, labels = seqs[shuffle], labels[shuffle]

        def critic_batch_loss(params, idx):
            losses = jax.vmap(
                lambda s, l: critic_bce_loss(
                    policy.critic_model, params["critic_params"], s, l
                )
            )(seqs[idx], labels[idx])
            return jnp.mean(losses)

        crit_perm = jax.random.randint(
            k_crit_perm,
            (critic_updates, batch_size),
            0,
            2 * critic_plan_batch,
        )
        params, crit_state, crit_loss = _scan_updates(
            params,
            optimizers["critic"],
            opt_states["critic"],
            critic_batch_loss,
            crit_perm,
        )

        # ---- 5. bilevel generator updates ------------------------------
        prev_params = params

        def gen_update(carry, idx):
            params, opt_state = carry
            loss, grads = policy.batched_loss_and_grad(
                params, exp_X[idx], gan_generator_loss, ()
            )
            updates, opt_state = optimizers["cost"].update(
                grads, opt_state, params
            )
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        cost_perm = minibatch_indices(
            k_cost, exp_X.shape[0], cost_updates, batch_size
        )
        (params, cost_state), gen_losses = jax.lax.scan(
            gen_update, (params, opt_states["cost"]), cost_perm
        )
        params = polyak_blend(prev_params, params, polyak_factor)

        # ---- 6. held-out test metrics (one planning pass, reused for
        # both critic and generator test losses) --------------------------
        if have_test:
            fake_test = jax.vmap(lambda hx: _plan_states(params, hx))(tX)
            seqs_t = jnp.concatenate([tY, fake_test], axis=0)
            labels_t = jnp.concatenate(
                [
                    jnp.ones((tX.shape[0],), jnp.float32),
                    -jnp.ones((tX.shape[0],), jnp.float32),
                ]
            )
            crit_test = jnp.mean(
                jax.vmap(
                    lambda s, l: critic_bce_loss(
                        policy.critic_model, params["critic_params"], s, l
                    )
                )(seqs_t, labels_t)
            )
            score_t = jax.vmap(
                lambda s: policy.critic_model.apply(
                    params["critic_params"], s
                )
            )(fake_test)
            p_t = jax.nn.sigmoid(score_t)
            gen_test = jnp.mean(
                -jnp.log(p_t + 1e-6) + jnp.log(1.0 - p_t + 1e-6)
            )
        else:
            crit_test = jnp.float32(0.0)
            gen_test = jnp.float32(0.0)

        opt_states = {
            "dynamics": dyn_state,
            "critic": crit_state,
            "cost": cost_state,
        }
        metrics = FusedEpochMetrics(
            episode_return=ep_return,
            dynamics_loss=dyn_loss,
            critic_loss=crit_loss,
            generator_loss=jnp.mean(gen_losses),
            critic_test_loss=crit_test,
            generator_test_loss=gen_test,
        )
        return params, opt_states, replay, metrics

    return epoch


def make_fused_l2_epoch(
    policy,
    env,
    env_params,
    normalizer,
    optimizers: dict,  # {"dynamics": tx, "cost": tx}
    expert_history_X,  # (N, history+1, x) normalized expert histories
    expert_future_Y,  # (N, horizon+1, x) normalized expert futures
    *,
    num_envs: int,
    episode_steps: int,
    history: int,
    dynamics_updates: int,
    cost_updates: int,
    batch_size: int,
    gamma: float,
    polyak_factor: float,
    expert_history_X_test=None,
    expert_future_Y_test=None,
    test_plan_batch: int = 64,
    expert_dyn_windows=None,  # (X, U, Y) expert sequence windows
    expert_dyn_updates: int = 0,
):
    """Fused single-program L2-MPC epoch: collection -> dynamics updates
    -> bilevel L2 cost updates (+ Polyak), the L2 counterpart of
    ``make_fused_gan_epoch`` (``/root/reference/norm/runner.py:101-145``
    as one XLA program)."""
    from gan_mpc_tpu.policies.losses import l2_imitation_loss

    exp_X = jnp.asarray(expert_history_X)
    exp_Y = jnp.asarray(expert_future_Y)
    have_test = expert_history_X_test is not None
    if have_test:
        tX = jnp.asarray(expert_history_X_test)[:test_plan_batch]
        tY = jnp.asarray(expert_future_Y_test)[:test_plan_batch]
    have_exp_dyn = expert_dyn_windows is not None and expert_dyn_updates > 0
    if have_exp_dyn:
        edX, edU, edY = (jnp.asarray(a) for a in expert_dyn_windows)
    steps_per_update = max(exp_X.shape[0] // batch_size, 1)

    def _scan_updates(params, opt, opt_state, loss_of_batch, perm):
        def body(carry, p):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(loss_of_batch)(params, p)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), perm
        )
        return params, opt_state, jnp.mean(losses)

    @jax.jit
    def epoch(params, opt_states, replay: ReplayBuffer, key, teacher_forcing):
        k_collect, k_dyn, k_cost = jax.random.split(key, 3)

        episode = policy_rollout(
            env,
            env_params,
            policy,
            params,
            normalizer,
            k_collect,
            num_steps=episode_steps,
            history=history,
            num_envs=num_envs,
        )
        ep_return = jnp.mean(jnp.sum(episode.rewards, axis=-1))
        replay = replay.add_trajectories(
            normalizer.normalize_state(episode.states),
            normalizer.normalize_action(episode.actions),
        )

        def dyn_batch_loss(params, idx):
            X, U, Y = (
                replay.states[idx],
                replay.actions[idx],
                replay.next_states[idx],
            )
            losses = jax.vmap(
                lambda x, u, y: multistep_prediction_loss(
                    policy.dynamics_model,
                    params["dynamics_params"],
                    x,
                    u,
                    y,
                    gamma,
                    teacher_forcing,
                )
            )(X, U, Y)
            return jnp.mean(losses)

        dyn_perm = jax.random.randint(
            k_dyn,
            (dynamics_updates * steps_per_update, batch_size),
            0,
            jnp.maximum(replay.size, 1),
        )
        params, dyn_state, dyn_loss = _scan_updates(
            params,
            optimizers["dynamics"],
            opt_states["dynamics"],
            dyn_batch_loss,
            dyn_perm,
        )

        if have_exp_dyn:

            def exp_dyn_loss(params, idx):
                losses = jax.vmap(
                    lambda x, u, y: multistep_prediction_loss(
                        policy.dynamics_model,
                        params["dynamics_params"],
                        x,
                        u,
                        y,
                        gamma,
                        jnp.asarray(True),
                    )
                )(edX[idx], edU[idx], edY[idx])
                return jnp.mean(losses)

            exp_perm = jax.random.randint(
                jax.random.fold_in(k_dyn, 1),
                (expert_dyn_updates, batch_size),
                0,
                edX.shape[0],
            )
            params, dyn_state, _ = _scan_updates(
                params,
                optimizers["dynamics"],
                dyn_state,
                exp_dyn_loss,
                exp_perm,
            )

        prev_params = params

        def cost_update(carry, idx):
            params, opt_state = carry
            loss, grads = policy.batched_loss_and_grad(
                params, exp_X[idx], l2_imitation_loss, (exp_Y[idx],)
            )
            updates, opt_state = optimizers["cost"].update(
                grads, opt_state, params
            )
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        cost_perm = minibatch_indices(
            k_cost, exp_X.shape[0], cost_updates, batch_size
        )
        (params, cost_state), cost_losses = jax.lax.scan(
            cost_update, (params, opt_states["cost"]), cost_perm
        )
        params = polyak_blend(prev_params, params, polyak_factor)

        if have_test:

            def test_loss_one(hx, y):
                zeros_u = jnp.zeros(
                    (hx.shape[0] - 1, policy.expert_model.u_size),
                    jnp.float32,
                )
                sol = policy.plan(
                    params, hx, zeros_u, warm_start_carry=False
                )
                return l2_imitation_loss(policy, sol, params, y)

            cost_test = jnp.mean(jax.vmap(test_loss_one)(tX, tY))
        else:
            cost_test = jnp.float32(0.0)

        opt_states = {"dynamics": dyn_state, "cost": cost_state}
        metrics = FusedL2Metrics(
            episode_return=ep_return,
            dynamics_loss=dyn_loss,
            cost_loss=jnp.mean(cost_losses),
            cost_test_loss=cost_test,
        )
        return params, opt_states, replay, metrics

    return epoch
