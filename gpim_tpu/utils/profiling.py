"""
Tracing / profiling hooks (SURVEY.md section 5: the reference only prints
wall-clock averages, gpr.py:206-211; here profiling is a first-class
subsystem).

- ``trace(logdir)``: context manager around jax.profiler for full XLA/TPU
  traces viewable in TensorBoard/Perfetto.
- ``Timer``: lightweight phase timer the reconstructors use to separate
  compile (first-execution) wall time from steady-state step time - the
  number that actually matters on TPU, where first compiles cost tens of
  seconds but cached steps are milliseconds.
"""

import contextlib
import time

import jax

__all__ = ["trace", "Timer"]


@contextlib.contextmanager
def trace(logdir="/tmp/gpim_tpu_trace"):
    """Capture a jax profiler trace for the enclosed block."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Accumulates named phase durations; distinguishes the first (compile-
    inclusive) call of a phase from warm calls."""

    def __init__(self):
        self.phases = {}

    @contextlib.contextmanager
    def phase(self, name):
        t0 = time.time()
        try:
            yield
        finally:
            dt = time.time() - t0
            rec = self.phases.setdefault(
                name, {"first_s": None, "warm_s": [], "calls": 0})
            if rec["first_s"] is None:
                rec["first_s"] = dt
            else:
                rec["warm_s"].append(dt)
            rec["calls"] += 1

    def summary(self):
        """{phase: {first_s, warm_mean_s, calls}} - first_s includes XLA
        compilation, warm_mean_s is the steady-state cost."""
        out = {}
        for name, rec in self.phases.items():
            warm = rec["warm_s"]
            out[name] = {
                "first_s": round(rec["first_s"], 4),
                "warm_mean_s": round(sum(warm) / len(warm), 4) if warm
                else None,
                "calls": rec["calls"],
            }
        return out
