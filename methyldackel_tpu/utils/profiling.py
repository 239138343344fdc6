"""Observability (SURVEY §5: the reference has none beyond stderr prints).

- Stats: per-stage wall time + reads/bases counters, reported at exit when
  MDTPU_STATS=1 (reads/s per host — the production counterpart of the
  reference's silent pthread workers).
- trace(): context manager around jax.profiler for xprof captures when
  MDTPU_TRACE_DIR is set.
"""
from __future__ import annotations

import contextlib
import os
import sys
import time
from collections import defaultdict


class Stats:
    def __init__(self):
        self.enabled = os.environ.get("MDTPU_STATS") == "1"
        self.t = defaultdict(float)
        self.n = defaultdict(int)
        self._start = time.perf_counter()
        self._lock = __import__("threading").Lock()

    @contextlib.contextmanager
    def timer(self, name: str):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            with self._lock:
                self.t[name] += dt

    def count(self, name: str, n: int = 1):
        if self.enabled:
            with self._lock:
                self.n[name] += n

    def report(self, out=None):
        if not self.enabled:
            return
        out = out or sys.stderr
        total = time.perf_counter() - self._start
        out.write("[mdtpu stats]\n")
        for k in sorted(self.t):
            out.write(f"  {k:<24s} {self.t[k]:8.3f}s\n")
        for k in sorted(self.n):
            out.write(f"  {k:<24s} {self.n[k]:>12d}")
            if total > 0:
                out.write(f"  ({self.n[k] / total:,.0f}/s)")
            out.write("\n")
        out.write(f"  {'total':<24s} {total:8.3f}s\n")


STATS = Stats()


@contextlib.contextmanager
def trace(label: str = "mdtpu"):
    """jax.profiler trace when MDTPU_TRACE_DIR is set (xprof-compatible)."""
    trace_dir = os.environ.get("MDTPU_TRACE_DIR")
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(os.path.join(trace_dir, label)):
        yield
