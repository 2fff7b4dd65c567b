"""Observability: per-step timing, loss logging, profiler traces.

The reference's observability is wall-clock prints (cgan.py:254,287) —
SURVEY.md §5 prescribes JAX profiler traces + per-step timing for the
rebuild.  This module provides:

* ``StepTimer`` — EMA'd step latency + throughput.
* ``MetricsLogger`` — JSONL log of per-epoch losses/timing (the 7-loss
  vector keeps the reference's ordering).
* ``profile_trace`` — context manager around ``jax.profiler`` for
  TensorBoard-compatible traces of the hot loop.
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import IO, Optional, Sequence

LOSS_NAMES = ["g_gen_total", "f_gen_total", "disc_y", "disc_x",
              "g_gen_only", "f_gen_only", "cycle"]


class StepTimer:
    """Exponential-moving-average step timer."""

    def __init__(self, alpha: float = 0.1):
        self.alpha = alpha
        self.ema: Optional[float] = None
        self._t0: Optional[float] = None
        self.count = 0

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, items: int = 1) -> float:
        dt = time.perf_counter() - self._t0
        # EMA the per-ITEM time so items_per_sec honors the items= count
        # (round-5 review: it previously returned intervals/sec, under-
        # reporting batched callers by the batch size).
        per_item = dt / max(items, 1)
        self.ema = per_item if self.ema is None else (
            self.alpha * per_item + (1 - self.alpha) * self.ema)
        self.count += items
        return dt

    @property
    def items_per_sec(self) -> Optional[float]:
        if self.ema is None or self.ema <= 0.0:
            return None
        return 1.0 / self.ema


class MetricsLogger:
    """Append-only JSONL metrics log."""

    def __init__(self, path: Optional[str] = None):
        self.path = path
        self._f: Optional[IO] = open(path, "a") if path else None

    def log_epoch(self, epoch: int, loss7: Sequence[float],
                  seconds: float, steps: int):
        if self._f is None:
            return
        rec = {"epoch": epoch, "seconds": seconds, "steps": steps,
               "loss": {k: float(v) for k, v in zip(LOSS_NAMES, loss7)}}
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

    def close(self):
        if self._f:
            self._f.close()
            self._f = None


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]):
    """jax.profiler.trace context (no-op when log_dir is None)."""
    if log_dir is None:
        yield
        return
    import jax
    with jax.profiler.trace(log_dir):
        yield
