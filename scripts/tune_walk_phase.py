"""State-indexed humanoid walking expert: gait phase estimated FROM THE
OBSERVATION instead of from wall-clock time.

Why: the shipped walk expert (runners/collect.py humanoid_walk_action)
indexes its gait cycle by t, so its action is NOT a function of the
observation — behavior cloning of it is ill-posed (the predictor sees
the same state with many different phase labels and averages them;
measured closed-loop BC = 23.6/1000 vs the expert's 667.5), and DAgger
cannot query it from arbitrary restart states because the phase is
unknown there. This script makes the expert memoryless: estimate the
phase from the antiphase hip pair

    d  = (hip_l - hip_r)/2   ~ A_h sin(ph)
    dd = (hip_ld - hip_rd)/2 ~ A_h w cos(ph)
    ph_est = atan2(d / A_h, dd / (A_h w)) + delta

(the PD-tracking lag is compensated by a tuned phase lead ``delta``;
the amplitude scale cancels inside atan2), then PD-track the same
kinematic cycle at ph_est. At standing start atan2(0,0)=0 so the
commanded targets at phase ``delta`` kick off the first step.

``--apg N`` polishes the CEM result with N BPTT steps through the
differentiable engine: a small MLP residual on the OBSERVATION ONLY
(still memoryless — the property behavior cloning needs) over the
frozen phase-PD base, rematerialized scan, non-finite-update skipping
(the stabilization recipe measured in scripts/tune_humanoid_walk.py).

Usage: python scripts/tune_walk_phase.py [--grid] [--cem N] [--steps N]
       [--seeds N] [--w "v1,...,v14"] [--apg N] [--apg-lr LR]
       [--load f.npz] [--save f.npz]
"""

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from gan_mpc_tpu import runtime_setup  # noqa: E402

runtime_setup.setup()

from gan_mpc_tpu.envs import make_env  # noqa: E402
from gan_mpc_tpu.runners.collect import (  # noqa: E402
    _HUMANOID_STAND_GAINS,
    _HUMANOID_WALK_PD,
    _WALK_QIDX,
    _walk_pd_targets,
    humanoid_balance_policy,
)

args = sys.argv[1:]
STEPS = int(args[args.index("--steps") + 1]) if "--steps" in args else 1000
SEEDS = int(args[args.index("--seeds") + 1]) if "--seeds" in args else 16
CEM = int(args[args.index("--cem") + 1]) if "--cem" in args else 0
APG = int(args[args.index("--apg") + 1]) if "--apg" in args else 0
APG_LR = (
    float(args[args.index("--apg-lr") + 1]) if "--apg-lr" in args else 1e-3
)
# truncated-BPTT window: gradients flow within each window only (stop-grad
# at boundaries). Full-episode chains through 1000 steps of contact
# dynamics are non-finite almost every step (measured); windows of ~50
# keep them finite and still span several gait cycles of credit.
APG_TRUNC = (
    int(args[args.index("--apg-trunc") + 1]) if "--apg-trunc" in args else 50
)
LOAD = args[args.index("--load") + 1] if "--load" in args else None
SAVE = args[args.index("--save") + 1] if "--save" in args else None
W_INIT = (
    jnp.array([float(v) for v in args[args.index("--w") + 1].split(",")])
    if "--w" in args
    else None
)

env = make_env("humanoid_walk")
P = env.default_params()
G_STAND = jnp.asarray(_HUMANOID_STAND_GAINS)
QIDX = jnp.asarray(_WALK_QIDX)


_PHASE_GRID = jnp.linspace(-jnp.pi, jnp.pi, 64, endpoint=False)


def phase_from_pose(w, q_joints, qd_joints, lam):
    """Memoryless phase estimate by matching the FULL 12-joint pose (and
    its velocity) against the known kinematic cycle: grid argmin over
    phase of ||qt(ph) - q||^2 + lam ||omega qt'(ph) - qd||^2. Far
    stronger than a 2-joint projection — on the limit cycle the pose
    determines the phase almost everywhere, and the velocity term breaks
    the mirror-crossing ties."""
    omega = 2.0 * jnp.pi * w[0]
    qts = jax.vmap(lambda p: _walk_pd_targets(w, p))(_PHASE_GRID)
    qdts = (
        jax.vmap(jax.jacfwd(lambda p: _walk_pd_targets(w, p)))(_PHASE_GRID)
        * omega
    )
    err = jnp.sum((qts - q_joints) ** 2, axis=-1) + lam * jnp.sum(
        (qdts - qd_joints) ** 2, axis=-1
    )
    return _PHASE_GRID[jnp.argmin(err)]


def walk_action_phase(w, obs):
    """w = [the 13 PD-gait params (collect._HUMANOID_WALK_PD layout),
    delta (phase lead)] or, in --proj mode, those 14 followed by two
    29-dim observation projections (a, b) generalizing the hand-picked
    hip-antiphase phase signal: ph = atan2(a.obs, b.obs) + delta.
    In --match mode w has 15 entries: [..., delta, lam] and the phase
    comes from full-pose matching (phase_from_pose)."""
    lean, bal = w[1], w[2]
    kp, kd = jnp.abs(w[9]), jnp.abs(w[10])
    k_v, v_ref, delta = w[11], w[12], w[13]
    A_h, omega = w[3], 2.0 * jnp.pi * w[0]
    q = jnp.concatenate([jnp.zeros(1, obs.dtype), obs[:14]])
    qd = obs[14:]
    vx = qd[0]
    joints, jointsd = obs[2:14], obs[17:29]
    if w.shape[0] == 15:
        ph = phase_from_pose(w, joints, jointsd, jnp.abs(w[14])) + delta
    elif w.shape[0] > 15:
        a, b = w[14:43], w[43:72]
        ph = jnp.arctan2(jnp.dot(a, obs), jnp.dot(b, obs)) + delta
    else:
        d = 0.5 * (joints[2] - joints[5])
        dd = 0.5 * (jointsd[2] - jointsd[5])
        ph = jnp.arctan2(d / A_h, dd / (A_h * omega)) + delta
    qt = _walk_pd_targets(w, ph)
    u_pd = kp * (qt - q[QIDX]) - kd * qd[QIDX]
    u = bal * humanoid_balance_policy(G_STAND, obs, env) + u_pd
    u = u.at[0].add(-(lean + k_v * (v_ref - vx)))
    return jnp.clip(u, -1.0, 1.0)


def extend_with_projections(w14):
    """Embed the hand-picked hip estimator into the 72-dim --proj space
    (exactly equivalent at init)."""
    A_h, omega = w14[3], 2.0 * jnp.pi * w14[0]
    a = jnp.zeros(29).at[4].set(0.5 / A_h).at[7].set(-0.5 / A_h)
    b = (
        jnp.zeros(29)
        .at[19]
        .set(0.5 / (A_h * omega))
        .at[22]
        .set(-0.5 / (A_h * omega))
    )
    return jnp.concatenate([w14, a, b])


def episode(w, key):
    s = env.reset(P, key)

    def body(s, _):
        obs = env.observe(P, s)
        s, r = env.step(P, s, walk_action_phase(w, obs))
        return s, r

    _, rs = jax.lax.scan(body, s, None, length=STEPS)
    return jnp.sum(rs)


@jax.jit
def score(ws, key):
    ks = jax.random.split(key, SEEDS)
    return jax.vmap(
        lambda w: jnp.mean(jax.vmap(lambda k: episode(w, k))(ks))
    )(ws)


# ---------------------------------------------------------------------
# APG residual: u = walk_action_phase(w, obs) + MLP(obs), BPTT-polished.
# ---------------------------------------------------------------------
APG_HIDDEN = 48


def residual_action(p, obs):
    u = walk_action_phase(p["w"], obs)
    h = jnp.tanh(p["W1"] @ obs + p["b1"])
    return jnp.clip(u + p["W2"] @ h + p["b2"], -1.0, 1.0)


def apg_episode(p, key):
    s = env.reset(P, key)

    def body(s, _):
        obs = env.observe(P, s)
        s, r = env.step(P, s, residual_action(p, obs))
        # finite clamps: a diverged contact integration must kill the
        # BPTT chain cleanly (clip has zero grad outside bounds), not
        # feed NaNs through the backward pass
        s = s.replace(
            qpos=jnp.clip(s.qpos, -1e3, 1e3),
            qvel=jnp.clip(s.qvel, -1e2, 1e2),
        )
        return s, jnp.where(jnp.isfinite(r), r, 0.0)

    if APG_TRUNC <= 0:
        _, rs = jax.lax.scan(jax.checkpoint(body), s, None, length=STEPS)
        return jnp.sum(rs)
    k = APG_TRUNC
    n_win = STEPS // k

    def window(carry, _):
        s = jax.tree_util.tree_map(jax.lax.stop_gradient, carry)
        s, rs = jax.lax.scan(jax.checkpoint(body), s, None, length=k)
        return s, jnp.sum(rs)

    _, r_win = jax.lax.scan(window, s, None, length=n_win)
    return jnp.sum(r_win)


def run_apg(w, steps):
    import optax

    key = jax.random.PRNGKey(42)
    if LOAD:
        import numpy as np

        data = np.load(LOAD)
        p = {k: jnp.asarray(data[k]) for k in data.files}
        print(f"loaded residual from {LOAD}")
    else:
        k1, key = jax.random.split(key)
        nin = env.obs_size
        p = {
            "w": w,
            "W1": 0.5
            * jax.random.normal(k1, (APG_HIDDEN, nin))
            / jnp.sqrt(nin),
            "b1": jnp.zeros(APG_HIDDEN),
            "W2": jnp.zeros((12, APG_HIDDEN)),  # zero head: step 0 = base
            "b2": jnp.zeros(12),
        }
    opt = optax.adam(APG_LR)
    opt_state = opt.init(p)

    @jax.jit
    def apg_step(p, opt_state, key):
        ks = jax.random.split(key, SEEDS)

        def mean_ret(p):
            return jnp.mean(jax.vmap(lambda k: apg_episode(p, k))(ks))

        r, g = jax.value_and_grad(mean_ret)(p)
        finite = jnp.all(
            jnp.array(
                [jnp.all(jnp.isfinite(x)) for x in jax.tree_util.tree_leaves(g)]
            )
        )
        g = jax.tree_util.tree_map(
            lambda x: jnp.where(finite, x, jnp.zeros_like(x)), g
        )
        up, opt_state = opt.update(g, opt_state, p)
        p = optax.apply_updates(p, up)
        return p, opt_state, r, finite

    best_p, best_r = p, -jnp.inf
    for i in range(steps):
        key, k = jax.random.split(key)
        p, opt_state, r, finite = apg_step(p, opt_state, k)
        if float(r) > float(best_r):
            best_p, best_r = p, r
        if i % 10 == 0 or i == steps - 1:
            print(
                f"apg {i}: ret {float(r):.1f} best {float(best_r):.1f}"
                + ("" if bool(finite) else " [skipped nonfinite]"),
                flush=True,
            )
    # fresh-seed eval of the best iterate
    kf = jax.random.PRNGKey(777)
    ks = jax.random.split(kf, 16)
    rets = jax.jit(
        lambda p: jax.vmap(lambda k: apg_episode(p, k))(ks)
    )(best_p)
    print(f"best fresh-16: {float(jnp.mean(rets)):.1f} "
          f"worst {float(jnp.min(rets)):.1f}")
    if SAVE:
        import numpy as np

        np.savez(SAVE, **{k: np.asarray(v) for k, v in best_p.items()})
        print(f"saved to {SAVE}")


PROJ = "--proj" in args
MATCH = "--match" in args


def _cem(mu, sig, key, iters, pop=64, elite=8):
    for i in range(iters):
        key, k1, k2 = jax.random.split(key, 3)
        cand = mu + sig * jax.random.normal(k1, (pop, mu.shape[0]))
        cand = jnp.concatenate([mu[None], cand], axis=0)
        r = score(cand, k2)
        top = jnp.argsort(-r)[:elite]
        mu = jnp.mean(cand[top], axis=0)
        sig = jnp.std(cand[top], axis=0) + 0.005
        print(
            f"cem {i}: best {float(r[top[0]]):.1f} "
            f"elite-mean {float(jnp.mean(r[top])):.1f}",
            flush=True,
        )
    return mu, key


def main():
    base = jnp.asarray(_HUMANOID_WALK_PD)
    key = jax.random.PRNGKey(0)
    if MATCH:
        base13 = W_INIT[:13] if W_INIT is not None else base
        if W_INIT is not None and W_INIT.shape[0] == 15:
            mu = W_INIT
            r = score(mu[None], key)
            print(f"given w15: {float(r[0]):.1f}")
        else:
            # stage 1: grid over (phase lead, velocity weight)
            deltas = jnp.linspace(0.0, 1.2, 7)
            lams = jnp.array([0.0003, 0.001, 0.003, 0.01, 0.03])
            ws = jnp.stack(
                [
                    jnp.concatenate([base13, jnp.array([d, l])])
                    for d in deltas
                    for l in lams
                ]
            )
            rs = score(ws, key)
            best = int(jnp.argmax(rs))
            mu = ws[best]
            print(
                f"match grid best: delta {float(mu[13]):.2f} "
                f"lam {float(mu[14]):.4f} -> {float(rs[best]):.1f}"
            )
        if CEM:
            sig = jnp.array(
                [0.15, 0.08, 0.15, 0.03, 0.15, 0.2, 0.08, 0.2, 0.15,
                 0.6, 0.015, 0.08, 0.15, 0.15, 0.0]
            ).at[14].set(0.5 * jnp.abs(mu[14]) + 0.001)
            mu, key = _cem(mu, sig, key, CEM)
            key, kf = jax.random.split(key)
            r = score(mu[None], kf)
            print(f"final mu: {float(r[0]):.1f}")
            print("w =", ",".join(f"{float(v):.4f}" for v in mu))
        return
    if APG:
        w = W_INIT if W_INIT is not None else base
        run_apg(w, APG)
        return
    if PROJ:
        assert W_INIT is not None, "--proj needs a tuned 14-dim --w seed"
        w = (
            W_INIT
            if W_INIT.shape[0] > 14
            else extend_with_projections(W_INIT)
        )
        r = score(w[None], key)
        print(f"proj seed: {float(r[0]):.1f}")
        mu = w
        sig = jnp.concatenate(
            [
                jnp.array(
                    [0.1, 0.05, 0.1, 0.02, 0.1, 0.15, 0.05, 0.15, 0.1,
                     0.4, 0.01, 0.05, 0.1, 0.12]
                ),
                # projection entries explore at ~15% of the init scale
                0.15 * jnp.maximum(jnp.abs(w[14:]), 1.0),
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
            sig = jnp.std(cand[top], axis=0) + 0.005
            print(
                f"cem {i}: best {float(r[top[0]]):.1f} "
                f"elite-mean {float(jnp.mean(r[top])):.1f}",
                flush=True,
            )
        key, kf = jax.random.split(key)
        r = score(mu[None], kf)
        print(f"final mu: {float(r[0]):.1f}")
        print("w =", ",".join(f"{float(v):.4f}" for v in mu))
        return
    if W_INIT is not None and CEM == 0:
        r = score(W_INIT[None], key)
        print(f"given w: {float(r[0]):.1f}")
        return
    # stage 1: grid over the phase lead with the shipped PD params
    deltas = jnp.linspace(0.0, 1.6, 9)
    ws = jnp.stack([jnp.concatenate([base, jnp.array([d])]) for d in deltas])
    rs = score(ws, key)
    for d, r in zip(deltas, rs):
        print(f"delta {float(d):.2f}: {float(r):.1f}")
    best = int(jnp.argmax(rs))
    w = ws[best]
    print(f"grid best: delta {float(deltas[best]):.2f} -> {float(rs[best]):.1f}")
    if CEM:
        sig = jnp.array(
            [0.2, 0.1, 0.2, 0.05, 0.2, 0.3, 0.1, 0.3, 0.2,
             0.8, 0.02, 0.1, 0.2, 0.25]
        )
        mu = w
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
                f"elite-mean {float(jnp.mean(r[top])):.1f}"
            )
        key, kf = jax.random.split(key)
        r = score(mu[None], kf)
        print(f"final mu: {float(r[0]):.1f}")
        print("w =", ",".join(f"{float(v):.4f}" for v in mu))


if __name__ == "__main__":
    main()
