"""Outer (planner-level) imitation losses.

Because the planner is differentiable (implicit VJP), these are ordinary
JAX functions of the planner solution — no hand-rolled gradient plumbing.

  * ``l2_imitation_loss``  == the reference L2MPC loss
    (``/root/reference/norm/l2_policy.py:12-18``);
  * ``gan_generator_loss`` == the non-saturating JS generator loss
    (``/root/reference/gan/js_policy.py:60-68``);
  * ``critic_bce_loss``    == the +-1-labelled critic loss
    (``/root/reference/gan/js_policy.py:41-46``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-6


def l2_imitation_loss(policy, sol, params, desired_xseq):
    """Sum over state dims of time-mean squared distance between the
    planned states and the expert's states."""
    del params
    xseq = policy.planned_states(sol)
    return jnp.sum(jnp.mean((xseq - desired_xseq) ** 2, axis=0))


def gan_generator_loss(policy, sol, params, *unused_args):
    """Non-saturating generator loss: the planner should make the critic
    score its trajectory as expert-like."""
    xseq = policy.planned_states(sol)
    score = policy.critic_model.apply(params["critic_params"], xseq)
    p = jax.nn.sigmoid(score)
    return jnp.mean(-jnp.log(p + _EPS) + jnp.log(1.0 - p + _EPS))


def critic_bce_loss(critic_model, critic_params, xseq, label):
    """-log sigma(score) for label +1, -log(1 - sigma(score)) for -1."""
    score = critic_model.apply(critic_params, xseq)
    p = jax.nn.sigmoid(score)
    p = jnp.where(label > 0, p, 1.0 - p)
    return -jnp.log(p + _EPS)
