"""Subprocess wrapper for the fused-epoch test cases.

The real cases live in ``tests/fused_epoch_cases.py`` (a name pytest does
not auto-collect). They compile the LARGEST single XLA programs in the
suite, and jaxlib 0.9's XLA:CPU compiler aborts the whole process
(``Fatal Python error: Aborted`` in ``backend_compile_and_load``, or in
the compile-cache's executable serialization) when that compile happens
after the ~60+ compilations the preceding suite files accumulate — the
same process-cumulative compiler-state bug already dodged for the H=100
associative-Riccati program (tests/test_parallel_riccati.py). Each case
runs verified-green in a fresh interpreter, so the wrapper buys exactly
the isolation the bug needs while `pytest tests/ -x -q` stays one
entry point.
"""

import os
import subprocess
import sys

import pytest

# the heaviest compiles in the suite; see test_end_to_end.py docstring
pytestmark = pytest.mark.slow

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cases(expr: str):
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    out = subprocess.run(
        [
            sys.executable,
            "-m",
            "pytest",
            "tests/fused_epoch_cases.py",
            "-q",
            "-k",
            expr,
        ],
        env=env,
        cwd=_REPO,
        capture_output=True,
        timeout=1800,
        text=True,
    )
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-2000:]


def test_fused_gan_epoch_cases_subprocess():
    # both GAN cases in ONE fresh process so the module-scoped fixture
    # (the expensive single-program epoch compile) is shared
    _run_cases("gan")


def test_fused_l2_epoch_case_subprocess():
    _run_cases("l2")
