"""Observability tests: stage timers and throughput counters."""

import time

import numpy as np

from audiotoken_tpu.runtime.executor import ThroughputMeter
from audiotoken_tpu.runtime.profiling import StageTimers


class TestStageTimers:
    def test_span_accumulates(self):
        t = StageTimers()
        for _ in range(3):
            with t.span("work"):
                time.sleep(0.01)
        s = t.summary()["work"]
        assert s["count"] == 3
        assert s["total_s"] >= 0.03
        assert s["mean_ms"] >= 10

    def test_timed_blocks_on_value(self):
        import jax.numpy as jnp

        t = StageTimers()
        out = t.timed("fetch", jnp.ones(16) * 2)
        assert float(out.sum()) == 32.0
        assert t.summary()["fetch"]["count"] == 1


class TestThroughputMeter:
    def test_rtfx(self):
        m = ThroughputMeter()
        m.update(30.0)
        m.update(30.0)
        s = m.summary()
        assert s["audio_seconds"] == 60.0
        assert s["batches"] == 2
        assert s["rtfx"] > 0
