"""Observability (SURVEY.md §5): structured logging, counters, profiling.

- ``get_logger``: stdlib logging with a compact structured format.
- ``Counters``: process-wide metric counters; ``dump()`` returns a dict the
  bench/CLI can emit as JSON (matches BASELINE.json metric names).
- ``trace``: context manager around ``jax.profiler.trace`` for TensorBoard
  TPU traces; ``annotate`` wraps ``jax.profiler.TraceAnnotation`` for
  per-stage attribution inside a trace.
"""
from __future__ import annotations

import contextlib
import logging
import threading
import time
from collections import defaultdict


def get_logger(name: str = "instsearch") -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        h = logging.StreamHandler()
        h.setFormatter(logging.Formatter(
            "%(asctime)s %(name)s %(levelname)s %(message)s"))
        logger.addHandler(h)
        logger.setLevel(logging.INFO)
    return logger


class Counters:
    """Thread-safe counters: images extracted, queries served, etc."""

    def __init__(self):
        self._lock = threading.Lock()
        self._counts: dict[str, float] = defaultdict(float)
        self._t0 = time.time()

    def add(self, name: str, value: float = 1.0) -> None:
        with self._lock:
            self._counts[name] += value

    def dump(self) -> dict:
        with self._lock:
            elapsed = max(time.time() - self._t0, 1e-9)
            out = dict(self._counts)
        out["elapsed_sec"] = elapsed
        if "images_extracted" in out:
            out["images_per_sec"] = out["images_extracted"] / elapsed
        if "queries_served" in out:
            out["queries_per_sec"] = out["queries_served"] / elapsed
        return out


COUNTERS = Counters()


def emit_tensorboard(logdir: str, scalars: dict | None = None,
                     step: int = 0, counters: "Counters | None" = None
                     ) -> None:
    """Write counters (+ optional bench scalars) as TensorBoard scalars via
    tensorboardX (SURVEY.md §5 metrics row). Nested dicts flatten to
    slash-paths; non-numeric values are skipped."""
    from tensorboardX import SummaryWriter

    def flat(prefix: str, d: dict):
        for k, v in d.items():
            key = f"{prefix}/{k}" if prefix else str(k)
            if isinstance(v, dict):
                yield from flat(key, v)
            elif isinstance(v, (int, float)) and not isinstance(v, bool):
                yield key, float(v)

    w = SummaryWriter(logdir)
    try:
        for key, v in flat("counters", (counters or COUNTERS).dump()):
            w.add_scalar(key, v, step)
        if scalars:
            for key, v in flat("bench", scalars):
                w.add_scalar(key, v, step)
    finally:
        w.close()


@contextlib.contextmanager
def trace(log_dir: str):
    """TensorBoard TPU trace around a region (view with the profile plugin)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named sub-region inside a profiler trace."""
    import jax

    return jax.profiler.TraceAnnotation(name)
