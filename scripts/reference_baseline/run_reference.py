"""Run the ACTUAL reference (returaj/gan_mpc) pipeline for a measured baseline.

BASELINE.md's parity target ("GAN-MPC return within 5% of the reference")
was uncheckable because the reference had never been run: trajax is not
installable offline. This harness runs the reference's own code,
unmodified, end to end:

  1. sandbox ``<workdir>/gan_mpc``: every code entry of /root/reference
     is SYMLINKED (read-only reference, zero code copied); writable
     ``expert_trajectories/`` + ``trained_models/``; ``config/`` holds
     the reference YAMLs load->patch->dumped (expert load_id -> the run
     this harness trains, save_video off — no GL in this image, eval
     episode count configurable).
  2. ``trajax`` resolved to scripts/reference_baseline/shim (the in-repo
     iLQR behind trajax's exact API).
  3. expert data: the repo's scripted pendulum expert rolled in REAL
     dm_control with DART exploration noise (executed actions logged),
     written in the reference's trajectories.json schema
     (``/root/reference/data_loader.py:38-46``).
  4. ``gan_mpc.expert.runner.run`` then ``gan_mpc.norm.runner.run``
     (+ ``gan_mpc.gan.runner.run`` with --gan), reading back the
     avg_reward each stamps into its run's config.json
     (``/root/reference/norm/runner.py:249-264``).

Usage: python scripts/reference_baseline/run_reference.py [--gan]
       [--episodes N] [--workdir runs/reference_baseline]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(os.path.dirname(_HERE))
_REF = "/root/reference"

sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_HERE, "shim"))


def build_sandbox(workdir: str) -> str:
    """Symlink the reference code into a writable package dir."""
    pkg = os.path.join(workdir, "gan_mpc")
    os.makedirs(pkg, exist_ok=True)
    for entry in os.listdir(_REF):
        if entry in ("expert_trajectories", "trained_models", "config"):
            continue
        dst = os.path.join(pkg, entry)
        if not os.path.exists(dst):
            os.symlink(os.path.join(_REF, entry), dst)
    os.makedirs(os.path.join(pkg, "expert_trajectories"), exist_ok=True)
    os.makedirs(os.path.join(pkg, "trained_models"), exist_ok=True)
    # config/ is a REAL dir (patched yaml copies land there) with the
    # reference's code files symlinked in
    cfg_dir = os.path.join(pkg, "config")
    os.makedirs(cfg_dir, exist_ok=True)
    for entry in os.listdir(os.path.join(_REF, "config")):
        if entry.endswith(".py"):
            dst = os.path.join(cfg_dir, entry)
            if not os.path.exists(dst):
                os.symlink(os.path.join(_REF, "config", entry), dst)
    return pkg


def patch_configs(pkg: str, episodes: int, boost: bool = False) -> None:
    """Reference YAMLs with the minimal runnable edits (no copies kept
    in the repo; regenerated from /root/reference at run time).
    ``boost`` raises the reference's training budget/learning rates to
    this repo's quality-recipe scale (its shipped defaults are 2 epochs
    at lr 1e-5) so the baseline also gets a sporting-chance row."""
    import yaml

    for name in ("l2_hyperparameters.yaml", "gan_hyperparameters.yaml"):
        with open(os.path.join(_REF, "config", name)) as fp:
            cfg = yaml.safe_load(fp)
        # first run saved by save_all_args gets id "0" (utils.py:139)
        cfg["mpc"]["model"]["expert"]["load_id"] = "0"
        cfg["mpc"]["evaluate"]["save_video"] = False  # no GL/X11 here
        cfg["mpc"]["evaluate"]["num_runs_for_avg"] = episodes
        if boost:
            t = cfg["mpc"]["train"]
            t["num_epochs"] = 30
            t["cost"]["learning_rate"] = 1.0e-4
            t["dynamics"]["learning_rate"] = 1.0e-4
            t["dynamics"]["num_updates"] = 12
        with open(os.path.join(pkg, "config", name), "w") as fp:
            yaml.safe_dump(cfg, fp)
    # load_config.py reads via gan_mpc.utils._MAIN_DIR_PATH, which is the
    # sandbox dir because the symlinked utils.py resolves __file__ there.


def collect_expert_data(pkg: str, num_eps=8, steps=1000, noise=0.25) -> str:
    """Scripted pendulum expert in REAL dm_control, DART noise, executed
    actions logged, reference trajectories.json schema."""
    out_dir = os.path.join(
        pkg, "expert_trajectories", "dmcontrol", "pendulum_swingup"
    )
    path = os.path.join(out_dir, "trajectories.json")
    if os.path.exists(path):
        return path
    os.makedirs(out_dir, exist_ok=True)

    import jax
    import jax.numpy as jnp
    from dm_control import suite

    from gan_mpc_tpu.envs import make_env
    from gan_mpc_tpu.envs.dm_eval import flatten_observation
    from gan_mpc_tpu.runners.collect import scripted_expert

    policy = jax.jit(scripted_expert(make_env("pendulum_swingup")))
    rng = np.random.RandomState(0)
    states, actions, rewards = [], [], []
    for ep in range(num_eps):
        env = suite.load("pendulum", "swingup", task_kwargs={"random": ep})
        ts = env.reset()
        obs = flatten_observation(ts.observation)
        S, A, R = [], [], []
        for _ in range(steps):
            u = policy(
                None,
                jnp.asarray(obs, jnp.float32)[None].repeat(2, 0),
                jnp.zeros((1, 1)),
            )
            u_exec = np.clip(
                np.asarray(u, np.float64) + noise * rng.randn(1), -1.0, 1.0
            )
            S.append(obs.tolist())
            A.append(u_exec.tolist())
            ts = env.step(u_exec)
            R.append(float(ts.reward or 0.0))
            obs = flatten_observation(ts.observation)
        states.append(S)
        actions.append(A)
        rewards.append(R)
        print(f"[collect] ep {ep} return {sum(R):.1f}")
    with open(path, "w") as fp:
        json.dump(
            {"states": states, "actions": actions, "rewards": rewards}, fp
        )
    return path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gan", action="store_true")
    ap.add_argument("--boost", action="store_true")
    ap.add_argument("--episodes", type=int, default=10)
    ap.add_argument(
        "--workdir", default=os.path.join(_REPO, "runs", "reference_baseline")
    )
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    pkg = build_sandbox(args.workdir)
    sys.path.insert(0, args.workdir)  # makes `import gan_mpc` resolve
    patch_configs(pkg, args.episodes, boost=args.boost)
    collect_expert_data(pkg)

    import jax

    if not hasattr(jax, "tree_map"):  # removed in new jax; reference uses it
        jax.tree_map = jax.tree_util.tree_map

    cfg_name = "gan_hyperparameters.yaml" if args.gan else "l2_hyperparameters.yaml"
    cfg_path = f"config/{cfg_name}"

    expert_dir = os.path.join(
        pkg, "trained_models", "expert", "dmcontrol", "pendulum_swingup", "0"
    )
    if not os.path.exists(expert_dir):
        print("[reference] training expert prediction model...")
        from gan_mpc.expert import runner as expert_runner

        expert_runner.run(config_path=cfg_path)
        with open(os.path.join(expert_dir, "config.json")) as fp:
            print("[reference] expert avg_reward:",
                  json.load(fp)["avg_reward"])

    if args.gan:
        from gan_mpc.gan import runner as gan_runner

        print("[reference] running GAN-MPC training...")
        gan_runner.run(config_path=cfg_path)
        fam = "gan"
    else:
        from gan_mpc.norm import runner as norm_runner

        print("[reference] running L2-MPC training...")
        norm_runner.run(config_path=cfg_path)
        fam = "l2"

    imit_dir = os.path.join(
        pkg, "trained_models", "imitator", "dmcontrol", "pendulum_swingup",
        fam,
    )
    runs = sorted(os.listdir(imit_dir), key=int)
    with open(os.path.join(imit_dir, runs[-1], "config.json")) as fp:
        cfg = json.load(fp)
    print(f"[reference] {fam} reward: {cfg['reward']} "
          f"(run {runs[-1]}, {args.episodes} episodes)")


if __name__ == "__main__":
    main()
