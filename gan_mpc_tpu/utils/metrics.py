"""Structured metrics and phase timing.

Replaces the reference's print-and-discard observability (``timeit``
wall-clock decorator, ``utils.py:26-35``; iLQR iteration counts returned
but discarded, ``policy/optimizers.py:55``) with a structured recorder:
append-only JSONL on disk plus in-memory history, phase timers, and
solver-statistics helpers. Optionally wraps ``jax.profiler`` traces.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from collections import defaultdict
from typing import Dict, Optional

import jax


class MetricsRecorder:
    def __init__(self, path: Optional[str] = None):
        self._path = path
        self.history: Dict[str, list] = defaultdict(list)
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._fp = open(path, "a")
        else:
            self._fp = None

    def record(self, step: int, **values) -> None:
        row = {"step": step, "time": time.time()}
        for k, v in values.items():
            v = float(v) if hasattr(v, "__float__") else v
            row[k] = v
            self.history[k].append((step, v))
        if self._fp:
            self._fp.write(json.dumps(row) + "\n")
            self._fp.flush()

    @contextlib.contextmanager
    def timed(self, name: str, step: int = 0):
        """Phase timer: records ``<name>_seconds``."""
        t0 = time.perf_counter()
        yield
        self.record(step, **{f"{name}_seconds": time.perf_counter() - t0})

    def latest(self, name: str):
        return self.history[name][-1][1] if self.history[name] else None

    def close(self):
        if self._fp:
            self._fp.close()


def solver_stats(solution) -> dict:
    """Surface planner convergence diagnostics (batched or single)."""
    import jax.numpy as jnp

    its = jnp.atleast_1d(solution.iterations)
    conv = jnp.atleast_1d(solution.converged)
    return {
        "ilqr_iterations_mean": float(jnp.mean(its)),
        "ilqr_iterations_max": float(jnp.max(its)),
        "ilqr_converged_frac": float(jnp.mean(conv.astype(jnp.float32))),
        "ilqr_obj_mean": float(jnp.mean(jnp.atleast_1d(solution.obj))),
    }


@contextlib.contextmanager
def profiler_trace(logdir: Optional[str]):
    """jax.profiler trace for a code region (no-op if logdir is None)."""
    if not logdir:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
