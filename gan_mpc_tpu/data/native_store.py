"""ctypes binding for the native (C++) trajectory store.

Builds/loads ``libtrajstore.so`` (``gan_mpc_tpu/native/trajstore.cpp``):
binary trajectory IO and multithreaded sliding-window extraction. Falls
back to the pure numpy/JAX implementations in ``gan_mpc_tpu.data`` when
the toolchain or library is unavailable — behavior is identical (pinned
by tests), the native path is a host-side throughput optimization.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

from gan_mpc_tpu.data.trajectories import TrajectorySet

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_SRC = os.path.join(_NATIVE_DIR, "trajstore.cpp")
_LIB = os.path.join(_NATIVE_DIR, "libtrajstore.so")

_lib: Optional[ctypes.CDLL] = None
_lib_load_failed = False

_F32 = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_I64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")


def _build() -> bool:
    try:
        subprocess.run(
            [
                "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                "-o", _LIB, _SRC, "-lpthread",
            ],
            check=True,
            capture_output=True,
        )
        return True
    except Exception:
        return False


def load_library() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _lib_load_failed
    if _lib is not None or _lib_load_failed:
        return _lib
    if not os.path.exists(_LIB) and not _build():
        _lib_load_failed = True
        return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        _lib_load_failed = True
        return None
    i64 = ctypes.c_int64
    lib.traj_write.argtypes = [
        ctypes.c_char_p, _F32, _F32, _F32, i64, i64, i64, i64,
    ]
    lib.traj_read_header.argtypes = [ctypes.c_char_p, _I64]
    lib.traj_read.argtypes = [ctypes.c_char_p, _F32, _F32, _F32]
    lib.make_sequence_windows.argtypes = [
        _F32, _F32, i64, i64, i64, i64, i64, _F32, _F32, _F32,
    ]
    lib.make_cost_windows.argtypes = [
        _F32, i64, i64, i64, i64, i64, _F32, _F32,
    ]
    for fn in (
        lib.traj_write,
        lib.traj_read_header,
        lib.traj_read,
        lib.make_sequence_windows,
        lib.make_cost_windows,
    ):
        fn.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return load_library() is not None


def _c(a: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(a, dtype=np.float32)


def write_trajectories(path: str, trajs: TrajectorySet) -> None:
    lib = load_library()
    if lib is None:
        raise RuntimeError("native trajstore unavailable")
    s, a, r = _c(trajs.states), _c(trajs.actions), _c(trajs.rewards)
    n, length, x = s.shape
    u = a.shape[-1]
    rc = lib.traj_write(path.encode(), s, a, r, n, length, x, u)
    if rc != 0:
        raise IOError(f"traj_write failed with code {rc}")


def read_trajectories(path: str) -> TrajectorySet:
    lib = load_library()
    if lib is None:
        raise RuntimeError("native trajstore unavailable")
    dims = np.zeros(4, np.int64)
    rc = lib.traj_read_header(path.encode(), dims)
    if rc != 0:
        raise IOError(f"traj_read_header failed with code {rc}")
    n, length, x, u = (int(v) for v in dims)
    states = np.empty((n, length, x), np.float32)
    actions = np.empty((n, length, u), np.float32)
    rewards = np.empty((n, length), np.float32)
    rc = lib.traj_read(path.encode(), states, actions, rewards)
    if rc != 0:
        raise IOError(f"traj_read failed with code {rc}")
    return TrajectorySet(states, actions, rewards)


def sequence_windows_native(
    states: np.ndarray, actions: np.ndarray, seqlen: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    lib = load_library()
    if lib is None:
        raise RuntimeError("native trajstore unavailable")
    s, a = _c(states), _c(actions)
    n, length, x = s.shape
    u = a.shape[-1]
    num = n * (length - seqlen)
    X = np.empty((num, seqlen, x), np.float32)
    U = np.empty((num, seqlen, u), np.float32)
    Y = np.empty((num, seqlen, x), np.float32)
    rc = lib.make_sequence_windows(s, a, n, length, x, u, seqlen, X, U, Y)
    if rc != 0:
        raise ValueError(f"make_sequence_windows failed with code {rc}")
    return X, U, Y


def cost_windows_native(
    states: np.ndarray, history: int, horizon: int
) -> Tuple[np.ndarray, np.ndarray]:
    lib = load_library()
    if lib is None:
        raise RuntimeError("native trajstore unavailable")
    s = _c(states)
    n, length, x = s.shape
    num = n * (length - horizon - history)
    X = np.empty((num, history + 1, x), np.float32)
    Y = np.empty((num, horizon + 1, x), np.float32)
    rc = lib.make_cost_windows(s, n, length, x, history, horizon, X, Y)
    if rc != 0:
        raise ValueError(f"make_cost_windows failed with code {rc}")
    return X, Y
