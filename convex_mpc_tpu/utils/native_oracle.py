"""ctypes bindings for the native C++ float64 QP oracle (native/qp_solver.cpp).

Builds the shared library on first use (g++, no external deps) and caches it
under native/build/. Used by tests and tools/parity_sweep.py as a second
independent oracle for the MPC QP; never imported by the TPU compute path.
"""

from __future__ import annotations

import ctypes
import hashlib
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_BUILD_DIR = _NATIVE_DIR / "build"
_SO_PATH = _BUILD_DIR / "libqp_solver.so"
_SRC = _NATIVE_DIR / "qp_solver.cpp"

_lib = None


def _build() -> Path:
    # Rebuild keyed on a content hash of the source (not mtimes): build/ is
    # gitignored, so after a fresh clone the library is always compiled from
    # the auditable qp_solver.cpp rather than any stale binary.
    _BUILD_DIR.mkdir(parents=True, exist_ok=True)
    src_hash = hashlib.sha256(_SRC.read_bytes()).hexdigest()
    stamp = _BUILD_DIR / "qp_solver.sha256"
    if _SO_PATH.exists() and stamp.exists() and stamp.read_text().strip() == src_hash:
        return _SO_PATH
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        "-o", str(_SO_PATH), str(_SRC),
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    stamp.write_text(src_hash)
    return _SO_PATH


def _load():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(str(_build()))
        d = ctypes.POINTER(ctypes.c_double)
        lib.qp_solve_f64.argtypes = [
            ctypes.c_int, ctypes.c_int, d, d, d, d, d,
            ctypes.c_int, ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, d, d, d,
        ]
        lib.qp_solve_f64.restype = ctypes.c_int
        _lib = lib
    return _lib


def solve_qp_native(
    P: np.ndarray,
    q: np.ndarray,
    A: np.ndarray,
    l: np.ndarray,
    u: np.ndarray,
    max_iter: int = 20000,
    rho: float = 0.1,
    eq_scale: float = 1e3,
    sigma: float = 1e-6,
    alpha: float = 1.6,
):
    """Solve min 1/2 x'Px + q'x s.t. l <= Ax <= u in f64.

    Returns (x, y, info) with info = dict(kkt, iters, polished).
    """
    lib = _load()
    n = int(q.shape[0])
    m = int(l.shape[0])
    P = np.ascontiguousarray(P, np.float64)
    if P.ndim == 1:
        P = np.ascontiguousarray(np.diag(P))
    q = np.ascontiguousarray(q, np.float64)
    A = np.ascontiguousarray(A, np.float64)
    l = np.ascontiguousarray(l, np.float64)
    u = np.ascontiguousarray(u, np.float64)
    x = np.zeros(n)
    y = np.zeros(m)
    info = np.zeros(3)

    def ptr(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))

    rc = lib.qp_solve_f64(
        n, m, ptr(P), ptr(q), ptr(A), ptr(l), ptr(u),
        int(max_iter), float(rho), float(eq_scale), float(sigma), float(alpha),
        ptr(x), ptr(y), ptr(info),
    )
    if rc != 0:
        raise RuntimeError(f"native qp_solve_f64 failed with code {rc}")
    return x, y, dict(kkt=float(info[0]), iters=int(info[1]), polished=bool(info[2]))
