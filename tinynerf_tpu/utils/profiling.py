"""Lightweight tracing/profiling utilities.

The reference's only observability is wall-clock prints and a tqdm bar
(SURVEY.md section 5). This module adds the TPU-native equivalents:

- `Timer`: host-side section timer that forces device completion via a
  host transfer (block_until_ready alone does not synchronize through
  remote-TPU tunnels), accumulating named section stats;
- `trace`: context manager around jax.profiler for XLA/TPU traces
  viewable in TensorBoard/Perfetto;
- `StepTimer`: rolling per-step latency stats (p50/p95/max) for train
  loops.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import numpy as np


def sync(x) -> None:
    """Force device->host completion of a jax array (tunnel-safe)."""
    np.asarray(x)


class Timer:
    """Accumulating named-section timer.

    with timer.section("render", result):  # result forces sync if given
        ...
    """

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def section(self, name: str, sync_on=None):
        t0 = time.perf_counter()
        yield
        if sync_on is not None:
            sync(sync_on)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {
                "total_s": round(self.totals[k], 4),
                "count": self.counts[k],
                "mean_ms": round(1e3 * self.totals[k] / max(self.counts[k], 1), 3),
            }
            for k in self.totals
        }


class StepTimer:
    """Rolling step-latency statistics."""

    def __init__(self, window: int = 200):
        self.window = window
        self.samples: list = []

    def record(self, seconds: float) -> None:
        self.samples.append(seconds)
        if len(self.samples) > self.window:
            self.samples.pop(0)

    def stats(self) -> Dict[str, float]:
        if not self.samples:
            return {}
        a = np.asarray(self.samples) * 1e3
        return {
            "p50_ms": float(np.percentile(a, 50)),
            "p95_ms": float(np.percentile(a, 95)),
            "max_ms": float(a.max()),
        }


@contextlib.contextmanager
def trace(profile_dir: Optional[str]):
    """jax.profiler trace scope; no-op when profile_dir is falsy."""
    import jax

    if not profile_dir:
        yield
        return
    jax.profiler.start_trace(profile_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
