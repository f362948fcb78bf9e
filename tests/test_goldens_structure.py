"""Structure guard for the committed parity-golden matrix (VERDICT r3 #3).

The goldens in tests/goldens/ carry only token ids — audio is regenerated
from scripts/golden_cases.py. This test pins the contract between the two
so a half-regenerated npz (missing seed, dropped case, dtype drift) fails
the suite instead of silently weakening the TPU parity scripts. It runs no
model code; full regeneration lives in scripts/make_goldens.py and a CPU
spot-check in test_golden_regen below.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from golden_cases import CASE_NAMES, WEIGHT_SEEDS, battery  # noqa: E402

GOLD = os.path.join(os.path.dirname(__file__), "goldens")
TOKENIZERS = ("acoustic", "semantic_m", "semantic_s")


@pytest.mark.parametrize("tok", TOKENIZERS)
def test_battery_golden_structure(tok):
    g = np.load(os.path.join(GOLD, f"battery_{tok}.npz"))
    assert tuple(g["case_names"]) == CASE_NAMES
    assert g["lengths"].shape == (len(CASE_NAMES),)
    for seed in WEIGHT_SEEDS:
        ids = g[f"ids_s{seed}"]
        assert ids.shape[0] == len(CASE_NAMES)
        assert ids.dtype == np.int16
        assert ids.ndim == 3  # [case, codebook, frames]


@pytest.mark.parametrize("tok", TOKENIZERS)
def test_api_golden_structure(tok):
    g = np.load(os.path.join(GOLD, f"api_{tok}.npz"))
    for key in ("tokens_bucket_under", "tokens_bucket_over",
                "tokens_multichunk_90s"):
        assert g[key].dtype == np.int16
        assert g[key].ndim == 3 and g[key].shape[0] == 1
    # the 90 s clip must actually be longer than the single-chunk clips
    assert (g["tokens_multichunk_90s"].shape[-1]
            > 4 * g["tokens_bucket_over"].shape[-1])


def test_battery_audio_is_deterministic_and_ragged():
    a1, l1, n1 = battery(16_000)
    a2, l2, _ = battery(16_000)
    np.testing.assert_array_equal(a1, a2)
    np.testing.assert_array_equal(l1, l2)
    assert a1.dtype == np.float32 and l1.dtype == np.int32
    assert len(set(l1.tolist())) > 1  # genuinely ragged
    # padding beyond each row's valid length is exactly zero
    T = a1.shape[1]
    for i, n in enumerate(l1):
        assert not a1[i, n:].any()


def test_golden_regen_semantic_s_seed0():
    """CPU regeneration of one battery entry must be bit-identical to the
    committed golden (the cheapest full-model guard: HuBERT fwd, 12x8s)."""
    from audiotoken_tpu.configs import HubertEncoderConfig
    from audiotoken_tpu.encoders import HubertEncoder

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from make_goldens import hubert_host_norm

    audio, lengths, _ = battery(16_000)
    audio = hubert_host_norm(audio, lengths)
    enc = HubertEncoder(HubertEncoderConfig(), weights="random",
                        precision="highest", seed=0)
    ids = np.asarray(enc(audio, attention_mask=lengths))
    g = np.load(os.path.join(GOLD, "battery_semantic_s.npz"))
    np.testing.assert_array_equal(ids, g["ids_s0"])
