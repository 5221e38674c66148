"""Small-matrix linear solves without LAPACK custom calls.

The Riccati recursion solves a tiny SPD system (action dimension m <= ~8
for every task in the zoo) at every timestep of every planner instance.
``jnp.linalg.solve`` lowers to a blocked LU with row pivoting — a custom
call that (a) dominates the planner's wall-clock on TPU at these sizes
(measured: the backward pass was ~75% of a bench control step, almost all
of it the batched 6x6 solves) and (b) is the LAPACK FFI call that fails to
register inside large fused XLA:CPU modules (the reason the fused
single-program epoch was skipped on the CPU harness in round 1).

``solve_spd`` replaces it with an UNROLLED Gauss-Jordan elimination for
static m <= SMALL_MAX: m rank-1 updates on the augmented system, pure
vector ops that batch over any leading dimensions and compile everywhere.
No pivoting — the planner only solves Levenberg-Marquardt-regularized SPD
matrices, whose diagonal is bounded away from zero by construction.

For m > SMALL_MAX it falls back to ``jnp.linalg.solve``.
"""

from __future__ import annotations

import jax.numpy as jnp

SMALL_MAX = 8


def solve_spd(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Solve A X = B for SPD A of static size (..., m, m), B (..., m, k).

    Unrolled Gauss-Jordan for m <= SMALL_MAX (batched, custom-call-free);
    ``jnp.linalg.solve`` otherwise.
    """
    m = A.shape[-1]
    if m > SMALL_MAX:
        return jnp.linalg.solve(A, B)
    aug = jnp.concatenate([A, B], axis=-1)  # (..., m, m + k)
    for i in range(m):
        piv = aug[..., i, :] / aug[..., i, i : i + 1]  # (..., m + k)
        col = aug[..., :, i]  # (..., m)
        aug = aug - col[..., :, None] * piv[..., None, :]
        aug = aug.at[..., i, :].set(piv)
    return aug[..., m:]
