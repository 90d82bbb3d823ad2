"""Observability: structured metric logs, tee logging, profiler hooks.

The reference's story is print()-to-stdout captured by run.pl into
train.log (run.sh:110, solver.py:190-195) plus optional live visdom curves
(solver.py:139-156). Here:

* MetricLogger appends one JSON line per event to <dir>/history.jsonl —
  machine-readable training curves (the visdom analogue; plot with any
  tool) — and mirrors human-readable lines to stdout and train.log.
* profile_trace wraps a step range in a jax.profiler trace viewable in
  TensorBoard/XProf (SURVEY.md §5 'tracing/profiling: none' gap).
"""

from __future__ import annotations

import contextlib
import json
import os
import sys
import time
from typing import Any, Dict, Optional


class MetricLogger:
    """JSONL metrics + tee'd text logging."""

    def __init__(self, log_dir: Optional[str] = None, filename: str = "train.log"):
        self.log_dir = log_dir
        self._jsonl = None
        self._text = None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self._jsonl = open(os.path.join(log_dir, "history.jsonl"), "a")
            self._text = open(os.path.join(log_dir, filename), "a")

    def log(self, msg: str) -> None:
        print(msg, flush=True)
        if self._text:
            self._text.write(msg + "\n")
            self._text.flush()

    def metrics(self, **kv: Any) -> None:
        kv.setdefault("time", time.time())
        if self._jsonl:
            self._jsonl.write(json.dumps(kv) + "\n")
            self._jsonl.flush()

    def close(self) -> None:
        for f in (self._jsonl, self._text):
            if f:
                f.close()


@contextlib.contextmanager
def profile_trace(log_dir: str, enabled: bool = True):
    """jax.profiler trace context (view in TensorBoard/XProf)."""
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Lightweight step timing with warmup-aware averages."""

    def __init__(self, skip_first: int = 2):
        self.skip_first = skip_first
        self.times = []
        self._last = None

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self.times.append(now - self._last)
        self._last = now

    @property
    def mean_ms(self) -> float:
        xs = self.times[self.skip_first:] or self.times
        return 1000 * sum(xs) / max(len(xs), 1)


def enable_compilation_cache(cache_dir: Optional[str] = None) -> Optional[str]:
    """Turn on JAX's persistent compilation cache (all CLIs call this).

    On this hardware a cold paper-config train-step compile takes minutes
    through the remote-compile tunnel; the cache makes every later process
    (recipe stages, eval re-runs, resumed training) reuse it. Opt out with
    CONVTASNET_COMPILE_CACHE=0; override the location by setting that var
    to a path. Returns the directory used, or None when disabled."""
    import jax

    env = os.environ.get("CONVTASNET_COMPILE_CACHE")
    if env == "0":
        return None
    path = cache_dir or env or os.path.join(
        os.path.expanduser("~"), ".cache", "convtasnet_tpu", "xla")
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        return None
    return path
