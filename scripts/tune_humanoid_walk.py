"""Tune a humanoid walking gait by CEM over the differentiable engine.

Controller = the CEM-tuned stand balance policy (runners/collect.py)
plus an open-loop phase gait (antiphase hip swing, knee flexion on the
swing leg, ankle push-off) — the same balance-feedback + time-indexed
CPG split that produced the cheetah gait. Gait parameters searched:
  w: freq, hip_amp, knee_amp, ankle_amp, knee_phase, ankle_phase,
     lean (forward waist bias), balance_scale
Usage: python scripts/tune_humanoid_walk.py [iters]
"""

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from gan_mpc_tpu.envs import make_env
from gan_mpc_tpu.runners.collect import (
    _HUMANOID_STAND_GAINS,
    humanoid_balance_policy,
)

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 30
POP, SEEDS, STEPS, ELITE = 96, 4, 500, 10

env = make_env("humanoid_walk")
P = env.default_params()
G_STAND = jnp.asarray(_HUMANOID_STAND_GAINS)

# best from the round-2 35-iteration search (186.8/500): slow forward
# shuffle; restart CEM from here.
W0 = jnp.array([2.1968, 0.3703, -0.2143, 0.2345, 0.8791, 5.1957, -0.0852, 1.9435])
SIG0 = jnp.array([0.5, 0.25, 0.25, 0.15, 1.0, 1.0, 0.1, 0.3])


def walk_action(w, obs, t, dt):
    u = w[7] * humanoid_balance_policy(G_STAND, obs, env)
    ph = 2.0 * jnp.pi * w[0] * t * dt
    s = jnp.sin(ph)
    u = u.at[2].add(w[1] * s).at[5].add(-w[1] * s)
    ks = jnp.sin(ph + w[4])
    u = u.at[3].add(-w[2] * jnp.maximum(ks, 0.0))
    u = u.at[6].add(-w[2] * jnp.maximum(-ks, 0.0))
    a_s = jnp.sin(ph + w[5])
    u = u.at[4].add(w[3] * a_s).at[7].add(-w[3] * a_s)
    u = u.at[0].add(-w[6])  # forward lean
    return jnp.clip(u, -1.0, 1.0)


def episode(w, key):
    s = env.reset(P, key)

    def body(carry, t):
        s = carry
        obs = env.observe(P, s)
        s, r = env.step(P, s, walk_action(w, obs, t, env.dt))
        return s, r

    _, rs = jax.lax.scan(body, s, jnp.arange(STEPS))
    return jnp.sum(rs)


@jax.jit
def score(ws, key):
    ks = jax.random.split(key, SEEDS)
    return jax.vmap(
        lambda w: jnp.mean(jax.vmap(lambda k: episode(w, k))(ks))
    )(ws)


def main():
    mu, sig = W0, SIG0
    best_w, best_r = W0, -jnp.inf
    for it in range(ITERS):
        k1 = jax.random.PRNGKey(1000 + it)
        pop = mu + sig * jax.random.normal(k1, (POP, mu.shape[0]))
        rs = score(pop, jax.random.PRNGKey(it))
        elite = pop[jnp.argsort(-rs)[:ELITE]]
        mu = jnp.mean(elite, axis=0)
        sig = jnp.std(elite, axis=0) + 0.02
        r_best = float(jnp.max(rs))
        if r_best > best_r:
            best_r, best_w = r_best, pop[int(jnp.argmax(rs))]
        print(
            f"it {it:2d}: best {r_best:7.1f} (global {best_r:7.1f}/"
            f"{STEPS}) mu {float(jnp.mean(rs)):7.1f}"
        )
    print("\nbest w:", [round(float(v), 4) for v in best_w])
    print("best return:", best_r, "/", STEPS)


if __name__ == "__main__":
    main()
