"""Closed-loop cheetah_run expert: pose-matched phase-PD gait, CEM over
the differentiable engine.

The shipped cheetah expert is an OPEN-LOOP torque CPG (~28/1000 — weak:
reward is linear in speed to 10 m/s, so the whole imitation ladder lived
under 31; VERDICT r3 "beat a strong expert" item). This applies the
round-4 walking-expert recipe: per-joint sinusoidal JOINT-ANGLE targets
qt_i = mid_i + A_i sin(ph + phi_i) tracked by PD, phase estimated from
the observation by full-pose matching (memoryless -> clonable +
DAgger-queryable), pitch feedback into the thighs, speed servo.

w layout (27):
  [0] freq  [1:7] A_i  [7:13] phi_i  [13:19] mid_i
  [19] kp [20] kd [21] k_pitch [22] k_pitchd [23] k_v [24] v_ref
  [25] delta [26] lam

Usage: python scripts/tune_cheetah_pd.py [--cem N] [--steps N]
       [--seeds N] [--w "..."]
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

env = make_env("cheetah_run")
P = env.default_params()
# --shift-torso M: tune ON the shifted physics (the imitation configs'
# domain shift). Measured: the nominal-tuned gait collapses 74.3 -> 13.9
# under torso x3 — a shift-brittle expert caps the whole shifted-env
# imitation ladder at ~its degraded score.
if "--shift-torso" in args:
    P = P.replace(
        body_mass_torso=P.body_mass_torso
        * float(args[args.index("--shift-torso") + 1])
    )

# seed: bounding-gait guess — back/front legs antiphase, thigh->shin->
# foot phase lag within each leg, ~3 Hz
W0 = jnp.concatenate(
    [
        jnp.array([3.0]),
        jnp.array([0.5, 0.4, 0.3, 0.5, 0.4, 0.3]),          # A_i
        jnp.array([0.0, 0.8, 1.6, 3.14, 3.94, 4.74]),       # phi_i
        jnp.array([-0.1, 0.3, -0.2, 0.1, -0.3, -0.1]),      # mid_i
        jnp.array([3.0, 0.1, 2.0, 0.3, 0.3, 4.0, 0.6, 0.002]),
    ]
)

_PHASE_GRID = jnp.linspace(-jnp.pi, jnp.pi, 64, endpoint=False)


def _targets(w, ph):
    A, phi, mid = w[1:7], w[7:13], w[13:19]
    return mid + A * jnp.sin(ph + phi)


def gait_action(w, obs):
    kp, kd = jnp.abs(w[19]), jnp.abs(w[20])
    k_p, k_pd, k_v, v_ref = w[21], w[22], w[23], w[24]
    delta, lam = w[25], jnp.abs(w[26])
    pitch = obs[1]
    joints = obs[2:8]
    vx, pitchd = obs[8], obs[10]
    jointsd = obs[11:17]
    omega = 2.0 * jnp.pi * w[0]
    qts = jax.vmap(lambda p: _targets(w, p))(_PHASE_GRID)
    qdts = (
        jax.vmap(jax.jacfwd(lambda p: _targets(w, p)))(_PHASE_GRID) * omega
    )
    err = jnp.sum((qts - joints) ** 2, axis=-1) + lam * jnp.sum(
        (qdts - jointsd) ** 2, axis=-1
    )
    ph = _PHASE_GRID[jnp.argmin(err)] + delta
    qt = _targets(w, ph)
    u = kp * (qt - joints) - kd * jointsd
    # pitch stabilization through both thighs + speed servo
    corr = k_p * pitch + k_pd * pitchd - k_v * (v_ref - vx)
    u = u.at[0].add(corr).at[3].add(corr)
    return jnp.clip(u, -1.0, 1.0)


NOISE = (
    float(args[args.index("--noise") + 1]) if "--noise" in args else 0.0
)


def episode(w, key):
    s = env.reset(P, key)

    def body(s, k):
        obs = env.observe(P, s)
        u = gait_action(w, obs)
        if NOISE > 0.0:
            # score the gait under the DART collection noise it must
            # survive (collect_expert_trajectories noise_sigma): the
            # noise-free optimum collapses at sigma 0.25 (measured:
            # 22.9 -> 10.3 over 300 steps)
            u = jnp.clip(u + NOISE * jax.random.normal(k, u.shape), -1, 1)
        s, r = env.step(P, s, u)
        return s, r

    _, rs = jax.lax.scan(body, s, jax.random.split(key, STEPS))
    return jnp.sum(rs)


@jax.jit
def score(ws, key):
    ks = jax.random.split(key, SEEDS)
    return jax.vmap(
        lambda w: jnp.mean(jax.vmap(lambda k: episode(w, k))(ks))
    )(ws)


def main():
    key = jax.random.PRNGKey(0)
    mu = W_INIT if W_INIT is not None else W0
    r = score(mu[None], key)
    print(f"seed w: {float(r[0]):.1f}", flush=True)
    if not CEM:
        return
    sig = jnp.concatenate(
        [
            jnp.array([0.6]),
            0.2 * jnp.ones(6),
            0.5 * jnp.ones(6),
            0.15 * jnp.ones(6),
            jnp.array([1.0, 0.05, 0.8, 0.15, 0.15, 1.5, 0.3, 0.002]),
        ]
    )
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
