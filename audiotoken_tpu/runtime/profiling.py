"""Tracing / profiling hooks.

The reference has no integrated tracing — ad-hoc time.time() spans only
(SURVEY.md §5). Here: jax.profiler trace capture around any callable,
block_until_ready-based stage timers, and a simple span registry that the
executor feeds (per-stage wall times, audio-seconds throughput).
"""

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import jax

from ..logger import get_logger

logger = get_logger(__name__)


class StageTimers:
    """Accumulating named wall-clock spans (host-side)."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def span(self, name: str, sync: bool = False):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync:
                # drain the device queue so the span covers real device time
                jax.effects_barrier()
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def timed(self, name: str, value):
        """Block on a device value and account its wait under ``name``."""
        with self.span(name):
            return jax.block_until_ready(value)

    def summary(self) -> Dict[str, dict]:
        return {
            k: {"total_s": round(v, 4), "count": self.counts[k],
                "mean_ms": round(1000 * v / max(self.counts[k], 1), 3)}
            for k, v in sorted(self.totals.items())
        }

    def log(self):
        for k, v in self.summary().items():
            logger.info("stage %-24s %s", k, v)


@contextlib.contextmanager
def profile_trace(logdir: Optional[str] = None):
    """Capture a jax.profiler trace (TensorBoard format) around a block;
    no-op when logdir is None."""
    if not logdir:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("profiler trace written to %s", logdir)
