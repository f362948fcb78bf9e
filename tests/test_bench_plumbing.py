"""bench.py evidence-pipeline plumbing (VERDICT r2 #2): the driver-run
benchmark must always emit one usable JSON line — preflight a wedged
backend, retry failed metrics once, stop early when the backend dies
mid-run, and label the artifact with tpu_status.

These tests stub the metric thunks (the real paths are exercised by the
driver on TPU) and exercise only main()'s orchestration.
"""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import bench  # noqa: E402


def run_main(capsys) -> dict:
    bench.main()
    lines = [l for l in capsys.readouterr().out.strip().splitlines() if l]
    return json.loads(lines[-1])


@pytest.fixture()
def stub_metrics(monkeypatch):
    """Replace every bench_* thunk referenced by main() with a stub."""
    def apply(**overrides):
        defaults = {
            "bench_acoustic_encode": lambda: (100.0, 200.0),
            "bench_acoustic_decode": lambda: 50.0,
            "bench_semantic_m_encode": lambda precision="highest": (10.0, 20.0),
            "bench_semantic_s_encode": lambda precision="highest": (30.0, 40.0),
            "bench_semantic_decode": lambda: 5.0,
            # corpus thunk takes the tokenizer arg (bench.py calls it with
            # "acoustic" default and "semantic_s"); returns None when skipped
            "bench_corpus": lambda tokenizer="acoustic": None,
        }
        defaults.update(overrides)
        for name, fn in defaults.items():
            monkeypatch.setattr(bench, name, fn)
    return apply


def test_happy_path_emits_all_keys(stub_metrics, capsys):
    stub_metrics()
    out = run_main(capsys)
    assert out["value"] == 100.0
    assert out["tpu_status"] == "ok"
    assert out["paths"]["acoustic_encode_device_b32_rtfx"] == 200.0
    assert out["paths"]["semantic_m_encode_device_rtfx"] == 20.0
    assert out["paths"]["semantic_m_encode_high_device_rtfx"] == 20.0
    assert out["paths"]["semantic_s_encode_rtfx"] == 30.0
    assert out["paths"]["semantic_decode_rtfx"] == 5.0
    assert "corpus_encode_rtfx" not in out["paths"]  # None => omitted
    assert "errors" not in out


def test_corpus_tokenizer_arg_flows_through_main(stub_metrics, capsys):
    """Both corpus metrics route through bench_corpus(tokenizer=...) —
    the r3 regression was a zero-arg stub masking exactly this call."""
    seen = []

    def corpus(tokenizer="acoustic"):
        seen.append(tokenizer)
        return 60.0 if tokenizer == "semantic_s" else 55.0

    stub_metrics(bench_corpus=corpus)
    out = run_main(capsys)
    assert seen == ["acoustic", "semantic_s"]
    assert out["paths"]["corpus_encode_rtfx"] == 55.0
    assert out["paths"]["corpus_semantic_s_encode_rtfx"] == 60.0
    assert "errors" not in out


def test_pipelined_spread_is_reported(stub_metrics, monkeypatch, capsys):
    """Pipelined/corpus metrics carry a [min, max] spread so ambient-tunnel
    noise (documented 2-3x swing) is visible in the artifact (VERDICT r3 #8)."""
    def noisy():
        bench._LAST_SPREAD = [90.0, 110.0]
        return (100.0, 200.0)

    stub_metrics(bench_acoustic_encode=noisy)
    out = run_main(capsys)
    assert out["spreads"]["acoustic_encode_rtfx"] == [90.0, 110.0]
    # metrics that never set a spread don't appear in the spread map
    assert "semantic_decode_rtfx" not in out["spreads"]


def test_failed_metric_is_retried_once(stub_metrics, capsys):
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("transient relay hiccup")
        return 42.0

    stub_metrics(bench_acoustic_decode=flaky)
    out = run_main(capsys)
    assert calls["n"] == 2
    assert out["paths"]["acoustic_decode_rtfx"] == 42.0
    # the transient error is still recorded for the judge
    assert "transient relay hiccup" in out["errors"]["acoustic_decode_rtfx"]
    assert out["tpu_status"] == "ok"


def test_doubly_failed_metric_does_not_block_others(stub_metrics, capsys):
    def broken():
        raise RuntimeError("metric-specific bug")

    stub_metrics(bench_semantic_decode=broken)
    out = run_main(capsys)
    assert "semantic_decode_rtfx" not in out["paths"]
    errs = out["errors"]["semantic_decode_rtfx"]
    assert isinstance(errs, list) and len(errs) == 2  # both attempts recorded
    # later metrics still ran (backend is healthy => no early abort)
    assert out["value"] == 100.0
    assert out["tpu_status"] == "ok"


def test_backend_death_mid_run_skips_rest(stub_metrics, monkeypatch, capsys):
    def dies():
        raise RuntimeError("FAILED_PRECONDITION: TPU backend error")

    stub_metrics(bench_acoustic_decode=dies)
    # preflight passes initially, then the backend is gone for good
    flights = iter([None, "dead", "dead"])
    monkeypatch.setattr(bench, "_preflight", lambda: next(flights))
    monkeypatch.setattr(bench, "_rotate_compile_cache", lambda: None)
    out = run_main(capsys)
    assert out["tpu_status"] == "tpu_lost_mid_run"
    assert out["value"] == 100.0  # acoustic encode ran before the death
    # everything after the dead metric is marked skipped, not attempted
    assert "skipped" in out["errors"]["semantic_m_encode_rtfx"]
    assert "skipped" in out["errors"]["corpus_encode_rtfx"]


def test_wedged_at_start_emits_tpu_unavailable(stub_metrics, monkeypatch, capsys):
    stub_metrics()
    monkeypatch.setattr(bench, "_preflight", lambda: "FAILED_PRECONDITION: boom")
    rotated = {"n": 0}

    def rotate():
        rotated["n"] += 1

    monkeypatch.setattr(bench, "_rotate_compile_cache", rotate)
    out = run_main(capsys)
    assert out["value"] is None
    assert out["tpu_status"] == "tpu_unavailable"
    assert rotated["n"] == 1  # cache rotation was attempted
    assert "FAILED_PRECONDITION" in out["errors"]["preflight"]


def test_cache_rotation_rescues_preflight(stub_metrics, monkeypatch, capsys):
    stub_metrics()
    flights = iter(["FAILED_PRECONDITION: stale AOT entry", None])
    monkeypatch.setattr(bench, "_preflight", lambda: next(flights))
    monkeypatch.setattr(bench, "_rotate_compile_cache", lambda: None)
    out = run_main(capsys)
    assert out["tpu_status"] == "ok_after_cache_rotation"
    assert out["value"] == 100.0
