"""Structured logging, metrics and profiling hooks.

The reference has no observability beyond ingest prints (reference
database.py:171-198); this module provides the production surface:

- a package logger (``pylbl_tpu``) with a single opt-in configurator,
- a process-wide metrics registry of counters and stage timers (the
  BASELINE lines/s and points/s numbers come from here),
- a ``jax.profiler`` trace context for TPU timeline captures.
"""
import contextlib
import logging
import threading
import time

logger = logging.getLogger("pylbl_tpu")


def configure_logging(level=logging.INFO):
    """Opt-in console logging with a structured one-line format."""
    handler = logging.StreamHandler()
    handler.setFormatter(logging.Formatter(
        "%(asctime)s %(name)s %(levelname)s %(message)s"))
    logger.addHandler(handler)
    logger.setLevel(level)
    return logger


class Metrics:
    """Thread-safe counters and stage timers."""

    def __init__(self):
        self._lock = threading.Lock()
        self.counters = {}
        self.timers = {}

    def count(self, name, value=1):
        with self._lock:
            self.counters[name] = self.counters.get(name, 0) + value

    @contextlib.contextmanager
    def timed(self, stage):
        start = time.perf_counter()
        try:
            yield
        finally:
            elapsed = time.perf_counter() - start
            with self._lock:
                total, calls = self.timers.get(stage, (0.0, 0))
                self.timers[stage] = (total + elapsed, calls + 1)

    def rate(self, counter, stage):
        """counter / total-stage-seconds, or None."""
        with self._lock:
            total, _ = self.timers.get(stage, (0.0, 0))
            value = self.counters.get(counter, 0)
        return value / total if total > 0 else None

    def snapshot(self):
        with self._lock:
            return {
                "counters": dict(self.counters),
                "timers": {k: {"seconds": v[0], "calls": v[1]}
                           for k, v in self.timers.items()},
            }

    def reset(self):
        with self._lock:
            self.counters.clear()
            self.timers.clear()


metrics = Metrics()


@contextlib.contextmanager
def profiler_trace(log_dir):
    """Captures a jax.profiler trace (TensorBoard-compatible) around a
    region; no-op context if profiling is unavailable."""
    import jax
    try:
        jax.profiler.start_trace(str(log_dir))
        started = True
    except Exception:  # pragma: no cover - profiler availability varies.
        started = False
    try:
        yield
    finally:
        if started:
            jax.profiler.stop_trace()
