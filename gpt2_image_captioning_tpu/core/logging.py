"""Observability: scalar metrics logging (TensorBoard + JSONL) and profiling.

The reference logs per-epoch metrics to TensorBoard (``src/train.py:15-17,
204-208``) and nothing else; here every run also writes an append-only
``metrics.jsonl`` (machine-readable without TB) and can capture device
profiles via ``jax.profiler`` traces.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Any


class MetricsLogger:
    """Scalar logger: TensorBoard events (if torch's writer is importable)
    plus an always-on JSONL stream."""

    def __init__(self, log_dir: str = "logs"):
        os.makedirs(log_dir, exist_ok=True)
        self.log_dir = log_dir
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(log_dir=log_dir)
        except Exception:
            pass

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        self._jsonl.write(json.dumps({"tag": tag, "value": float(value), "step": int(step)}) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)

    def add_scalars(self, scalars: dict[str, float], step: int) -> None:
        for tag, v in scalars.items():
            self.add_scalar(tag, v, step)

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


@contextlib.contextmanager
def profile_trace(trace_dir: str | None):
    """Capture a jax.profiler trace (viewable in TensorBoard/Perfetto) around
    a code region when ``trace_dir`` is set; no-op otherwise."""
    if not trace_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock per-step timing with warmup-aware summaries."""

    def __init__(self):
        self.times: list[float] = []
        self._t0: float | None = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        return dt

    def summary(self, skip_warmup: int = 1) -> dict[str, Any]:
        ts = self.times[skip_warmup:] or self.times
        if not ts:
            return {"steps": 0}
        return {
            "steps": len(self.times),
            "mean_s": sum(ts) / len(ts),
            "min_s": min(ts),
            "max_s": max(ts),
        }
