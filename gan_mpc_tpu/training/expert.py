"""Expert prediction model trainer.

Capability parity with ``/root/reference/expert/trainer.py``:
teacher-forced seq2seq regression with a gamma-discounted squared error on
both predicted next-states and actions; each epoch is one jitted
``lax.scan`` over random minibatches; teacher forcing stays on for the
first ``num_epochs * teacher_forcing_factor`` epochs.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import optax

from gan_mpc_tpu.data.windows import minibatch_indices
from gan_mpc_tpu.training.common import discounted_sum


def expert_sequence_loss(
    model, params, xseq_b, useq_b, next_xseq_b, gamma, teacher_forcing
):
    """Mean over batch of discounted squared errors (both heads)."""

    def single(xseq, useq, next_xseq):
        carry = model.init_carry(xseq[0])
        _, (pred_next, pred_u) = model.apply(
            params, carry, xseq, teacher_forcing
        )
        err_u = discounted_sum((pred_u - useq) ** 2, gamma)
        err_x = discounted_sum((pred_next - next_xseq) ** 2, gamma)
        return jnp.sum(err_u) + jnp.sum(err_x)

    return jnp.mean(jax.vmap(single)(xseq_b, useq_b, next_xseq_b))


@functools.partial(jax.jit, static_argnums=(0, 1))
def _train_epoch(model, opt, params, opt_state, perm, dataset, gamma, tf):
    X, U, Y = dataset

    def body(carry, p):
        params, opt_state = carry

        def loss_fn(params):
            return expert_sequence_loss(
                model, params, X[p], U[p], Y[p], gamma, tf
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    (params, opt_state), losses = jax.lax.scan(body, (params, opt_state), perm)
    return params, opt_state, jnp.mean(losses)


def train_expert(
    model,
    params,
    optimizer,
    opt_state,
    train_data: Tuple,
    test_data: Tuple,
    num_epochs: int,
    batch_size: int,
    key: jax.Array,
    discount_factor: float = 0.9,
    teacher_forcing_factor: float = 0.7,
    log_every: int = 10,
    log_fn=print,
):
    """Returns (params, opt_state, train_losses, final_test_loss)."""
    datasize = train_data[0].shape[0]
    steps = max(datasize // batch_size, 1)
    train_losses = []
    for ep in range(1, num_epochs + 1):
        key, sub = jax.random.split(key)
        perm = minibatch_indices(sub, datasize, steps, batch_size)
        tf = jnp.asarray(ep <= num_epochs * teacher_forcing_factor)
        params, opt_state, loss = _train_epoch(
            model, optimizer, params, opt_state, perm, train_data,
            discount_factor, tf,
        )
        train_losses.append(float(loss))
        if log_fn is not None and ep % log_every == 0:
            test = expert_sequence_loss(
                model, params, *test_data, discount_factor, jnp.asarray(False)
            )
            log_fn(
                f"[expert] epoch {ep} train_loss {float(loss):.4f} "
                f"test_loss {float(test):.4f}"
            )
    test_loss = float(
        expert_sequence_loss(
            model, params, *test_data, discount_factor, jnp.asarray(False)
        )
    )
    return params, opt_state, train_losses, test_loss
