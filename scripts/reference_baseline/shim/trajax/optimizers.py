"""``trajax.optimizers`` API shim backed by this repo's in-repo iLQR.

The reference pins trajax to a git revision
(``/root/reference/requirements.txt:51``) that cannot be installed in
this zero-egress image. This shim provides exactly the surface the
reference consumes (``/root/reference/policy/optimizers.py``: ``ilqr``,
``rollout``, ``evaluate``, ``pad``) on top of
``gan_mpc_tpu.planner.ilqr`` — whose return contract
``(X, U, obj, grad, adjoints, lqr, iterations)`` was built to match
trajax's (LQR-oracle verified in tests/test_ilqr.py) — so the ACTUAL
reference pipeline can run unmodified and produce a measured baseline
(BASELINE.md protocol).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

import importlib

# the MODULE gan_mpc_tpu/planner/ilqr.py (the package re-exports a
# same-named function, so a from-import would grab the function)
_planner = importlib.import_module("gan_mpc_tpu.planner.ilqr")


def pad(U: jax.Array) -> jax.Array:
    """(T, m) -> (T+1, m) with a zero row appended (trajax convention:
    cost is evaluated at T+1 points with a padded control)."""
    return jnp.vstack([U, jnp.zeros((1, U.shape[1]), U.dtype)])


def rollout(dynamics, U: jax.Array, x0: jax.Array) -> jax.Array:
    """Roll controls through dynamics: returns X with shape (T+1, n)."""
    return _planner.rollout(dynamics, U, x0)


def evaluate(cost, X: jax.Array, padU: jax.Array) -> jax.Array:
    """Per-timestep costs c(x_t, u_t, t) over the padded trajectory."""
    ts = jnp.arange(X.shape[0])
    return jax.vmap(cost)(X, padU, ts)


def ilqr(
    cost,
    dynamics,
    x0: jax.Array,
    U: jax.Array,
    maxiter: int = 100,
    grad_norm_threshold: float = 1e-4,
    relative_grad_norm_threshold: float = 0.0,
    obj_step_threshold: float = 0.0,
    inputs_step_threshold: float = 0.0,
    make_psd: bool = False,
    psd_delta: float = 0.0,
    alpha_0: float = 1.0,
    alpha_min: float = 5e-5,
    **unused,
):
    """trajax.optimizers.ilqr signature -> in-repo solver.

    The knobs the reference sets (``policy/eval.py:10-20``) map directly;
    the line-search schedule alpha_0 * 0.5**k runs until it passes
    alpha_min, as trajax's does.
    """
    del relative_grad_norm_threshold, inputs_step_threshold, make_psd

    # The reference passes its solver kwargs as a JIT ARGUMENT
    # (policy/optimizers.py:34-46), so inside the trace they are traced
    # scalars; this solver's knobs are static. The reference only ever
    # uses one configuration (policy/eval.py:10-20), so a traced knob is
    # substituted by that documented default — behaviorally identical
    # for the reference pipeline.
    def conc(v, default):
        try:
            return float(v)
        except Exception:
            return float(default)

    maxiter = int(conc(maxiter, 100))
    grad_norm_threshold = conc(grad_norm_threshold, 1e-4)
    obj_step_threshold = conc(obj_step_threshold, 0.0)
    psd_delta = conc(psd_delta, 0.0)
    alpha_0, alpha_min = conc(alpha_0, 1.0), conc(alpha_min, 5e-5)
    if alpha_min < alpha_0:
        num_alphas = int(math.ceil(math.log(alpha_min / alpha_0, 0.5))) + 1
    else:
        num_alphas = 1
    settings = _planner.SolverSettings(
        max_iterations=maxiter,
        grad_norm_tol=grad_norm_threshold,
        obj_step_tol=obj_step_threshold,
        alpha_0=alpha_0,
        alpha_decay=0.5,
        num_alphas=num_alphas,
        psd_delta=psd_delta,
    )
    sol = _planner.ilqr(cost, dynamics, x0, U, settings)
    lqr = ()  # unpacked but never used by the reference
    return sol.X, sol.U, sol.obj, sol.grad, sol.adjoints, lqr, sol.iterations
