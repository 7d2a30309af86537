"""Optional tracing/profiling (SURVEY.md §5: the reference has none — its
only observability is the per-tile progress percentage and ``-v`` lines;
this subsystem adds what a production TPU deployment needs while keeping
the reference's stderr contract untouched by default).

Two independent facilities, both off unless enabled by environment:

- ``REALSR_TPU_TRACE=1``: lightweight per-stage wall-clock spans
  (decode/prep/dispatch/fetch/encode), aggregated and printed to stderr at
  process exit.
- ``REALSR_TPU_PROFILE=<dir>``: wraps the process in a ``jax.profiler``
  trace written to <dir> (viewable in TensorBoard / xprof).
"""

from __future__ import annotations

import atexit
import collections
import contextlib
import os
import sys
import threading
import time


class StageTimer:
    """Thread-safe accumulated wall-clock per named stage."""

    def __init__(self, enabled: bool):
        self.enabled = enabled
        self._lock = threading.Lock()
        self._total = collections.defaultdict(float)
        self._count = collections.defaultdict(int)

    @contextlib.contextmanager
    def span(self, name: str):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            with self._lock:
                self._total[name] += dt
                self._count[name] += 1

    def report(self, file=None) -> None:
        if not self.enabled or not self._total:
            return
        file = file or sys.stderr
        print("== realsr-tpu stage timing ==", file=file)
        for name in sorted(self._total, key=lambda n: -self._total[n]):
            t, c = self._total[name], self._count[name]
            print(
                f"  {name:<12} total {t * 1e3:9.1f}ms  n={c:<5d} "
                f"avg {t / c * 1e3:8.2f}ms",
                file=file,
            )


tracer = StageTimer(enabled=os.environ.get("REALSR_TPU_TRACE", "") not in ("", "0"))
if tracer.enabled:
    atexit.register(tracer.report)

_profile_dir = os.environ.get("REALSR_TPU_PROFILE", "")
_profiling = False


def maybe_start_profiler() -> None:
    """Start a jax.profiler trace if REALSR_TPU_PROFILE is set (idempotent;
    stopped automatically at exit)."""
    global _profiling
    if not _profile_dir or _profiling:
        return
    import jax

    jax.profiler.start_trace(_profile_dir)
    _profiling = True

    def _stop():
        try:
            jax.profiler.stop_trace()
        except Exception:
            pass

    atexit.register(_stop)
