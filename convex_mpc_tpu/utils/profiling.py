"""Profiling and observability hooks.

The reference's observability is perf_counter brackets around the QP update/
solve plus matplotlib summaries (reference centroidal_mpc.py:73-105,
plot_helper.py:217-253). Here:

- :func:`trace` wraps a region with ``jax.profiler`` (XLA-level traces
  viewable in TensorBoard/Perfetto);
- :func:`time_fn` measures steady-state wall time of a jitted callable
  (compile excluded, best-of-k windows against pool interference);
- :class:`SolveStats` accumulates per-cycle solver iteration/residual
  counters from engine logs (solves/s, convergence fraction, histograms).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace for the enclosed region."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_fn(fn, *args, windows: int = 3, reps: int = 5):
    """Steady-state seconds per call of a jitted fn (best window mean)."""
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


@dataclass
class SolveStats:
    """Accumulates solver telemetry from engine CycleLogs."""

    iters: list = field(default_factory=list)
    prim: list = field(default_factory=list)
    dual: list = field(default_factory=list)
    max_iter: int = 0

    def update(self, logs, max_iter: int):
        self.iters.extend(np.asarray(logs.solver_iters).ravel().tolist())
        self.prim.extend(np.asarray(logs.prim_res).ravel().tolist())
        self.dual.extend(np.asarray(logs.dual_res).ravel().tolist())
        self.max_iter = max(self.max_iter, max_iter)

    def summary(self) -> dict:
        it = np.asarray(self.iters)
        if it.size == 0:
            return {}
        return {
            "cycles": int(it.size),
            "iters_mean": float(it.mean()),
            "iters_p50": float(np.percentile(it, 50)),
            "iters_p95": float(np.percentile(it, 95)),
            "converged_frac": float((it < self.max_iter).mean()) if self.max_iter else None,
            "prim_res_p95": float(np.percentile(np.asarray(self.prim), 95)),
            "dual_res_p95": float(np.percentile(np.asarray(self.dual), 95)),
        }
