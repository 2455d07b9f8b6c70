"""Observability: per-stage wall-clock accounting and JSONL metric logs.

The reference has no systematic tracing (SURVEY §5 — dead ``alltime``
accumulators and commented ``time.time()`` deltas); here every pipeline
run can account its stage budget (the appendix's Desc/Det/Match/Est
breakdown, RoReg_Appendix Table 1) and training emits machine-readable
JSONL instead of tensorboardX event files.
"""

from __future__ import annotations

import json
import time
from collections import defaultdict
from contextlib import contextmanager

__all__ = ["StageTimer", "JsonlLogger"]


class StageTimer:
    """Accumulates wall time per named stage; blocks on device results when
    given a value to block on (otherwise async dispatch hides the cost)."""

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextmanager
    def stage(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                import jax

                jax.block_until_ready(block_on)
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def block(self, name: str, value):
        """Time the wait for an async value under ``name``."""
        import jax

        t0 = time.perf_counter()
        jax.block_until_ready(value)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1
        return value

    def summary(self) -> dict:
        return {
            name: {
                "total_s": round(self.totals[name], 4),
                "count": self.counts[name],
                "mean_ms": round(1000 * self.totals[name] / max(self.counts[name], 1), 2),
            }
            for name in self.totals
        }


class JsonlLogger:
    """Append-only JSONL metrics file (the tensorboardX Recorder analog,
    utils/utils.py:164-215)."""

    def __init__(self, path: str):
        self.path = path

    def log(self, record: dict):
        rec = {"ts": time.time(), **record}
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
