"""Native CPU runtime components (C++, loaded via ctypes).

The reference ships one native module — a Numba-AOT-compiled Viterbi core
(.so built by dcnet/aot_viterbi_core.py). Here the equivalent is a small
C++ library built on demand with g++ (`build_native()`), exposing:

- viterbi_core      — probability-domain CPU decode (oracle-exact),
- viterbi_core_log  — log-domain variant (bit-compatible with the TPU
                      kernels' operands),
- backtrace         — standalone pointer chase.

`viterbi_native_fn` mirrors the reference wrapper viterbi_numba_fn
(dcnet/tf_viterbi_decoding.py:119-153): validates stochasticity, transposes
to the C layout, and returns int64 states.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_THIS_DIR = Path(__file__).parent
_SO_PATH = _THIS_DIR / "libviterbi_native.so"
_lib = None


def build_native(force: bool = False, source: str = "viterbi_native.cpp") -> Path:
    """Build (on demand) one of the C++ runtime components in this package
    into lib<stem>.so and return its path."""
    src = _THIS_DIR / source
    so_path = _THIS_DIR / f"lib{src.stem}.so"
    if so_path.exists() and not force:
        if so_path.stat().st_mtime >= src.stat().st_mtime:
            return so_path
    subprocess.run(
        [
            "g++", "-O3", "-march=native", "-shared", "-fPIC",
            str(src), "-o", str(so_path), "-lpthread",
        ],
        check=True,
        capture_output=True,
    )
    return so_path


def _load():
    global _lib
    if _lib is not None:
        return _lib
    build_native()
    lib = ctypes.CDLL(str(_SO_PATH))
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.viterbi_core.argtypes = [f32p, f32p, f32p, ctypes.c_int64, ctypes.c_int64, i64p]
    lib.viterbi_core.restype = ctypes.c_int32
    lib.viterbi_core_log.argtypes = list(lib.viterbi_core.argtypes)
    lib.viterbi_core_log.restype = ctypes.c_int32
    lib.backtrace.argtypes = [i32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, i64p]
    lib.backtrace.restype = ctypes.c_int32
    _lib = lib
    return lib


def native_available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def viterbi_native_fn(*, transition_matrix, prob_init, probs_st) -> np.ndarray:
    """Native decode with the reference wrapper's validation semantics
    (dcnet/tf_viterbi_decoding.py:119-153). probs_st is [S, T]."""
    lib = _load()
    B = np.asarray(transition_matrix)
    probs = np.asarray(probs_st)
    S, T = probs.shape
    if B.shape != (S, S):
        raise ValueError("transition matrix shape mismatch")
    if not np.allclose(B.sum(axis=1), 1.0):
        raise ValueError("transition matrix rows must sum to 1")
    if not np.isclose(np.asarray(prob_init).sum(), 1.0):
        raise ValueError("prob_init must sum to 1")

    Bt = np.require(B.T, np.float32, ["C"])
    pi = np.require(prob_init, np.float32, ["C"])
    obs = np.require(probs.T, np.float32, ["C"])
    out = np.empty(T, np.int64)
    rc = lib.viterbi_core(Bt, pi, obs, S, T, out)
    if rc != 0:
        raise RuntimeError(f"viterbi_core failed with code {rc}")
    return out


def viterbi_native_log_fn(log_B, log_pi, log_obs) -> np.ndarray:
    """Log-domain native decode: log_B [S, S] (= log A.T), log_pi [S],
    log_obs [T, S] time-major. Returns [T] int64."""
    lib = _load()
    log_B = np.require(log_B, np.float32, ["C"])
    log_pi = np.require(log_pi, np.float32, ["C"])
    log_obs = np.require(log_obs, np.float32, ["C"])
    T, S = log_obs.shape
    out = np.empty(T, np.int64)
    rc = lib.viterbi_core_log(log_B, log_pi, log_obs, S, T, out)
    if rc != 0:
        raise RuntimeError(f"viterbi_core_log failed with code {rc}")
    return out


def backtrace_native(T2: np.ndarray, last_state: int) -> np.ndarray:
    lib = _load()
    T2 = np.require(T2, np.int32, ["C"])
    T, S = T2.shape
    out = np.empty(T, np.int64)
    rc = lib.backtrace(T2, T, S, int(last_state), out)
    if rc != 0:
        raise RuntimeError(f"backtrace failed with code {rc}")
    return out
