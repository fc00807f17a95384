"""Tracing / timing hooks (SURVEY §5.1: the reference has none — wandb
scalars only plus an unused InferenceTimer in the DVMVS baseline).

- `StageTimer`: block-until-ready wall-clock timing per pipeline stage with
  running stats (the InferenceTimer capability, done properly for async
  dispatch).
- `trace`: context manager around `jax.profiler` for on-device traces
  viewable in TensorBoard/XProf.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict

import jax


class StageTimer:
    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self.times = defaultdict(list)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def time(self, name: str, result=None):
        t0 = time.perf_counter()
        yield
        self.counts[name] += 1
        if self.counts[name] <= self.warmup:
            return
        self.times[name].append(time.perf_counter() - t0)

    def timed(self, name: str, fn, *args, **kwargs):
        """Run fn, block on its outputs, record wall-clock."""
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        out = jax.block_until_ready(out)
        self.counts[name] += 1
        if self.counts[name] > self.warmup:
            self.times[name].append(time.perf_counter() - t0)
        return out

    def summary(self) -> Dict[str, Dict[str, float]]:
        import numpy as np

        return {k: {"mean_s": float(np.mean(v)), "p50_s": float(np.median(v)),
                    "max_s": float(np.max(v)), "n": len(v)}
                for k, v in self.times.items() if v}

    def report(self) -> str:
        lines = []
        for k, s in sorted(self.summary().items()):
            lines.append(f"{k:30s} mean {s['mean_s']*1e3:8.2f} ms   "
                         f"p50 {s['p50_s']*1e3:8.2f} ms   n={s['n']}")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/tdvnet_trace"):
    """Capture a jax.profiler device trace around the block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
