"""Associative-scan Riccati must match the sequential backward pass."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_mpc_tpu.planner.ilqr import (
    SolverSettings,
    _backward_pass,
    _linearize,
    _quadratize,
    ilqr,
    rollout,
)
from gan_mpc_tpu.planner.parallel_riccati import parallel_backward_pass


def _random_lqr_terms(key, T, n, m):
    ks = jax.random.split(key, 8)
    A = jnp.eye(n) + 0.1 * jax.random.normal(ks[0], (T, n, n))
    B = 0.3 * jax.random.normal(ks[1], (T, n, m))
    cx = 0.5 * jax.random.normal(ks[2], (T + 1, n))
    cu = 0.5 * jax.random.normal(ks[3], (T + 1, m))

    def psd(k, d, scale):
        Ms = jax.random.normal(k, (T + 1, d, d))
        return scale * jnp.einsum("tij,tkj->tik", Ms, Ms) + jnp.eye(d)

    cxx = psd(ks[4], n, 0.3)
    cuu = psd(ks[5], m, 0.3)
    cux = 0.2 * jax.random.normal(ks[6], (T + 1, m, n))
    return A, B, cx, cu, cxx, cuu, cux


# (5,3,1) covers the odd/tiny-horizon edge; (50,4,2) a non-power-of-two
# production-scale horizon. A third (72,2,2) case added ~35s of compile
# for no new property and was dropped.
@pytest.mark.parametrize("T,n,m", [(5, 3, 1), (50, 4, 2)])
def test_parallel_matches_sequential(T, n, m):
    terms = _random_lqr_terms(jax.random.PRNGKey(0), T, n, m)
    reg = jnp.float32(1e-6)
    seq = _backward_pass(*terms, reg, SolverSettings())
    par = parallel_backward_pass(*terms, reg)
    names = ["k", "K", "Qu", "dv1", "dv2", "adjoints"]
    for name, a, b in zip(names, seq, par):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3, err_msg=name
        )


def test_ilqr_with_associative_riccati_solves_lqr():
    n, m, T = 2, 1, 30
    A = jnp.array([[1.0, 0.1], [0.0, 1.0]])
    B = jnp.array([[0.0], [0.1]])

    def cost(x, u, t):
        stage = 0.5 * jnp.sum(x**2) + 0.05 * jnp.sum(u**2)
        return jnp.where(t == T, 5.0 * jnp.sum(x**2), stage)

    def dyn(x, u, t):
        return A @ x + B @ u

    x0 = jnp.array([1.0, -0.5])
    U0 = jnp.zeros((T, m))
    sol_seq = ilqr(cost, dyn, x0, U0, SolverSettings())
    sol_par = ilqr(
        cost, dyn, x0, U0, SolverSettings(riccati="associative")
    )
    assert bool(sol_par.converged)
    np.testing.assert_allclose(
        np.asarray(sol_par.U), np.asarray(sol_seq.U), atol=1e-3
    )
    np.testing.assert_allclose(
        float(sol_par.obj), float(sol_seq.obj), rtol=1e-4
    )


def test_long_horizon_nonlinear_converges():
    """Run in a SUBPROCESS: compiling this H=100 associative-scan program
    after the ~116 programs the full suite has already compiled crashes
    XLA:CPU's backend_compile (fresh-process compilation is fine —
    verified standalone and in both suite halves). Process isolation
    keeps the check while dodging the compiler-state bug."""
    import os
    import subprocess
    import sys

    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "from tests.test_parallel_riccati import _long_horizon_check;"
        "_long_horizon_check(); print('LONGH_OK')"
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        capture_output=True,
        timeout=600,
        text=True,
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert "LONGH_OK" in out.stdout


def _long_horizon_check():
    T = 100

    def dyn(x, u, t):
        th, thd = x
        thdd = -9.81 * jnp.sin(th) + 4.0 * jnp.tanh(u[0])
        thd2 = thd + 0.02 * thdd
        return jnp.array([th + 0.02 * thd2, thd2])

    def cost(x, u, t):
        c = (jnp.cos(x[0]) - 1.0) ** 2 + 0.01 * x[1] ** 2
        return jnp.where(t == T, 10.0 * c, c + 0.01 * jnp.sum(u**2))

    x0 = jnp.array([2.5, 0.0])
    U0 = jnp.zeros((T, 1))
    from gan_mpc_tpu.planner.ilqr import total_cost

    obj0 = float(total_cost(cost, rollout(dyn, U0, x0), U0))
    sol = ilqr(
        cost,
        dyn,
        x0,
        U0,
        SolverSettings(max_iterations=60, riccati="associative"),
    )
    assert bool(jnp.all(jnp.isfinite(sol.U)))
    assert bool(sol.converged)
    # substantially improves the objective (nonconvex problem: the exact
    # local optimum reached is numerics-sensitive, so no pose assertion)
    assert float(sol.obj) < 0.5 * obj0
