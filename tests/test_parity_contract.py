"""Locks the parity-contract CLASSIFICATION logic in
scripts/verify_tpu_parity.py (round-4 contract — ARCHITECTURE.md
"Numerics & parity strategy").

The measured agreements themselves come from TPU runs; these tests pin
the pure-python gating so script edits can't silently change what
"PARITY OK" means (the round-3 red-suite incident was exactly this
class of script/test drift).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from verify_tpu_parity import (  # noqa: E402
    ACOUSTIC_THRESH,
    CASE_THRESH_OVERRIDES,
    DEGENERATE_CASES,
    REPORT_ONLY_POLICIES,
    STABILITY_CASES,
    STABILITY_THRESH,
    THRESH,
    case_thresh,
    degenerate_ok,
)


def test_case_classification_is_semantic_m_only():
    # tone/chirp/dc_offset stability and silence degeneracy are measured
    # properties of the w2v-BERT fbank->conformer path; the other
    # tokenizers passed exactness on every case and stay fully gated
    assert STABILITY_CASES == {
        ("semantic_m", "tone"),
        ("semantic_m", "chirp"),
        ("semantic_m", "dc_offset"),
        ("semantic_m", "tone_i16"),
        ("semantic_m", "chirp_i16"),
    }
    assert DEGENERATE_CASES == {("semantic_m", "silence")}


def test_int16_probe_classification_follows_measured_conditioning():
    """Round-5 contract (VERDICT r4 #1 resolution): the *_i16 rows
    tested the 'int16-sourced audio is immune' claim and FALSIFIED its
    boundary — undithered quantization of (locally) periodic signals is
    harmonic distortion, not broadband noise, so tone_i16/chirp_i16
    keep rounding-scale quiet mel cells (diag_i16_quant_mechanism.py:
    0.088-60x vs >= 9e2 for every aperiodic row) and join their parents
    as semantic_m stability probes. The aperiodic rows — the kind real
    recordings belong to — stay EXACTNESS-gated for every tokenizer,
    quiet_i16 with a forensically-backed 0.995 near-tie band."""
    # conditioning-immune rows: exactness everywhere
    for case in ("dc_offset_i16", "quiet_i16"):
        for tok in ("acoustic", "semantic_s", "semantic_m"):
            assert (tok, case) not in STABILITY_CASES
            assert (tok, case) not in DEGENERATE_CASES
    assert case_thresh("semantic_m", "dc_offset_i16") == THRESH
    assert case_thresh("semantic_s", "dc_offset_i16") == THRESH
    assert case_thresh("acoustic", "dc_offset_i16") == ACOUSTIC_THRESH
    assert case_thresh("semantic_m", "quiet_i16") == 0.995
    assert case_thresh("acoustic", "quiet_i16") == 0.995
    assert case_thresh("semantic_s", "quiet_i16") == THRESH  # measured 1.0
    # ill-conditioned periodic rows: stability probes on semantic_m ONLY —
    # acoustic (0.998/0.995 floors) and semantic_s (measured 1.000000)
    # stay gated even on these
    for case in ("tone_i16", "chirp_i16"):
        assert ("semantic_m", case) in STABILITY_CASES
        assert case_thresh("semantic_s", case) == THRESH
        assert case_thresh("acoustic", case) == ACOUSTIC_THRESH
    # the near-tie band never silently widens to other cases
    assert set(CASE_THRESH_OVERRIDES) == {
        ("semantic_m", "quiet_i16"), ("acoustic", "quiet_i16")}


def test_thresholds():
    assert case_thresh("semantic_m", "tone") == STABILITY_THRESH == 0.35
    assert case_thresh("semantic_m", "dc_offset") == STABILITY_THRESH
    assert case_thresh("semantic_m", "noise") == THRESH == 0.9999
    assert case_thresh("semantic_m", "harmonic") == THRESH
    # silence stays exactness-gated for the OTHER tokenizers
    assert case_thresh("semantic_s", "silence") == THRESH
    assert case_thresh("acoustic", "silence") == ACOUSTIC_THRESH == 0.998
    assert case_thresh("acoustic", "tone") == ACOUSTIC_THRESH


def test_degenerate_gate_is_binariness():
    # wholesale coherent flips (the measured outcomes) pass
    assert degenerate_ok(1.0)
    assert degenerate_ok(0.0)
    assert degenerate_ok(0.997)  # boundary frames may differ
    assert degenerate_ok(0.05)
    # scattered partial agreement — the bug signature — fails
    assert not degenerate_ok(0.5)
    assert not degenerate_ok(0.35)
    assert not degenerate_ok(0.89)


def test_semantic_m_high_is_report_only():
    assert ("semantic_m", "high") in REPORT_ONLY_POLICIES
    # the exactness-holding promotions stay gated
    assert ("semantic_s", "high") not in REPORT_ONLY_POLICIES
    assert ("semantic_m", "highest") not in REPORT_ONLY_POLICIES
