"""Scripted walker_walk expert: state-indexed (memoryless) PD-tracked
gait, tuned by CEM over the differentiable engine.

Same design as the humanoid walk expert (scripts/tune_walk_phase.py):
a kinematic gait cycle — antiphase hip sin, rectified swing-knee
flexion, ankle push-off — tracked by per-joint PD, with torso-pitch
balance + speed-servoed lean folded into the hips. The gait phase is
estimated FROM THE OBSERVATION (hip antiphase pair), never from
wall-clock time, so the expert's action is a function of state:
behavior cloning is well-posed and DAgger can query it from arbitrary
restart states (the round-3 humanoid lesson — time-indexed experts
clone at ~3% of their own score).

w = [freq, A_h, A_k, ph_k, A_a, ph_a, kp, kd, k_pitch, k_pitchd,
     k_v, v_ref, delta]

Usage: python scripts/tune_walker_walk.py [--cem N] [--steps N]
       [--seeds N] [--w "v1,...,v13"]
"""

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from gan_mpc_tpu import runtime_setup  # noqa: E402

runtime_setup.setup()

from gan_mpc_tpu.envs import make_env  # noqa: E402

args = sys.argv[1:]
STEPS = int(args[args.index("--steps") + 1]) if "--steps" in args else 1000
SEEDS = int(args[args.index("--seeds") + 1]) if "--seeds" in args else 16
CEM = int(args[args.index("--cem") + 1]) if "--cem" in args else 0
W_INIT = (
    jnp.array([float(v) for v in args[args.index("--w") + 1].split(",")])
    if "--w" in args
    else None
)

env = make_env("walker_walk")
P = env.default_params()

# hand seed: ~1.4 Hz stride, moderate amplitudes, stiff PD
W0 = jnp.array(
    [1.4, 0.45, 0.8, 1.0, 0.25, -0.3, 4.0, 0.15, 3.0, 0.5, 0.3, 1.2, 1.2]
)


_PHASE_GRID = jnp.linspace(-jnp.pi, jnp.pi, 64, endpoint=False)


def _targets(w, ph):
    A_h, A_k, ph_k, A_a, ph_a = w[1], w[2], w[3], w[4], w[5]
    s_l, s_r = jnp.sin(ph), jnp.sin(ph + jnp.pi)
    knee_l = -A_k * jnp.maximum(jnp.sin(ph + ph_k), 0.0)
    knee_r = -A_k * jnp.maximum(jnp.sin(ph + jnp.pi + ph_k), 0.0)
    ank_l = A_a * jnp.sin(ph + ph_a)
    ank_r = A_a * jnp.sin(ph + jnp.pi + ph_a)
    return jnp.stack([A_h * s_l, knee_l, ank_l, A_h * s_r, knee_r, ank_r])


def walk_action(w, obs):
    """w = 13 gait params (atan2 phase) or 14 (+lam: pose-matched phase,
    the humanoid expert-v3 estimator — --match mode)."""
    freq, A_h = w[0], w[1]
    kp, kd = jnp.abs(w[6]), jnp.abs(w[7])
    k_p, k_pd, k_v, v_ref, delta = w[8], w[9], w[10], w[11], w[12]
    pitch = obs[1]
    joints = obs[2:8]       # lhip lknee lank rhip rknee rank
    vx, pitchd = obs[8], obs[10]
    jointsd = obs[11:17]
    omega = 2.0 * jnp.pi * freq
    if w.shape[0] >= 14:
        lam = jnp.abs(w[13])
        qts = jax.vmap(lambda p: _targets(w, p))(_PHASE_GRID)
        qdts = (
            jax.vmap(jax.jacfwd(lambda p: _targets(w, p)))(_PHASE_GRID)
            * omega
        )
        err = jnp.sum((qts - joints) ** 2, axis=-1) + lam * jnp.sum(
            (qdts - jointsd) ** 2, axis=-1
        )
        ph = _PHASE_GRID[jnp.argmin(err)] + delta
    else:
        d = 0.5 * (joints[0] - joints[3])
        dd = 0.5 * (jointsd[0] - jointsd[3])
        ph = jnp.arctan2(d / A_h, dd / (A_h * omega)) + delta
    qt = _targets(w, ph)
    u = kp * (qt - joints) - kd * jointsd
    # torso balance + speed servo through both hips
    hip = k_p * pitch + k_pd * pitchd - k_v * (v_ref - vx)
    u = u.at[0].add(hip).at[3].add(hip)
    return jnp.clip(u, -1.0, 1.0)


def episode(w, key):
    s = env.reset(P, key)

    def body(s, _):
        obs = env.observe(P, s)
        s, r = env.step(P, s, walk_action(w, obs))
        return s, r

    _, rs = jax.lax.scan(body, s, None, length=STEPS)
    return jnp.sum(rs)


@jax.jit
def score(ws, key):
    ks = jax.random.split(key, SEEDS)
    return jax.vmap(
        lambda w: jnp.mean(jax.vmap(lambda k: episode(w, k))(ks))
    )(ws)


MATCH = "--match" in args


def main():
    key = jax.random.PRNGKey(0)
    mu = W_INIT if W_INIT is not None else W0
    if MATCH and mu.shape[0] == 13:
        mu = jnp.concatenate([mu, jnp.array([0.002])])
    r = score(mu[None], key)
    print(f"seed w: {float(r[0]):.1f}")
    if not CEM:
        return
    sig = jnp.array(
        [0.3, 0.15, 0.25, 0.4, 0.15, 0.4, 1.5, 0.1, 1.0, 0.3, 0.3, 0.4, 0.4]
    )
    if mu.shape[0] == 14:
        sig = jnp.concatenate([sig, jnp.array([0.002])])
    pop, elite = 64, 8
    for i in range(CEM):
        key, k1, k2 = jax.random.split(key, 3)
        cand = mu + sig * jax.random.normal(k1, (pop, mu.shape[0]))
        cand = jnp.concatenate([mu[None], cand], axis=0)
        r = score(cand, k2)
        top = jnp.argsort(-r)[:elite]
        mu = jnp.mean(cand[top], axis=0)
        sig = jnp.std(cand[top], axis=0) + 0.01
        print(
            f"cem {i}: best {float(r[top[0]]):.1f} "
            f"elite-mean {float(jnp.mean(r[top])):.1f}",
            flush=True,
        )
    key, kf = jax.random.split(key)
    r = score(mu[None], kf)
    print(f"final mu: {float(r[0]):.1f}")
    print("w =", ",".join(f"{float(v):.4f}" for v in mu))


if __name__ == "__main__":
    main()
