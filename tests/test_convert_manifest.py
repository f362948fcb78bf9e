"""Structural manifests + the gated real-checkpoint conversion script
(VERDICT r2 #6): mis-staged artifacts must fail loudly at conversion
time, and the committed manifests must track the architectures.
"""

import os
import sys

import numpy as np
import pytest

from audiotoken_tpu.convert.manifest import (
    generate_manifests,
    load_manifests,
    tree_manifest,
    validate_tree,
)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


@pytest.fixture(scope="module")
def manifests():
    return load_manifests()


@pytest.fixture(scope="module")
def generated():
    return generate_manifests()


def test_committed_manifests_are_current(manifests, generated):
    """If an architecture changes, regenerate manifests.json (see
    audiotoken_tpu/convert/manifest.py) in the same commit."""
    assert set(manifests) == set(generated)
    for name in generated:
        assert manifests[name] == generated[name], (
            f"manifests.json is stale for '{name}' — regenerate it"
        )


def test_manifest_covers_all_eight_artifacts(manifests):
    assert set(manifests) == {
        "acoustic", "hubert", "hubert_kmeans", "w2vbert", "w2vbert_vq",
        "gpt_semantic_s_en", "gpt_semantic_m_hi", "bark_fine",
    }


class TestValidation:
    @pytest.fixture(scope="class")
    def acoustic_tree(self):
        from audiotoken_tpu import weights as weight_store

        return weight_store.get_acoustic_params("random", 0)

    def test_valid_tree_passes(self, acoustic_tree):
        validate_tree(acoustic_tree, "acoustic")

    def test_wrong_shape_fails(self, acoustic_tree):
        bad = dict(acoustic_tree)
        bad["codebooks"] = np.zeros((3, 4), np.float32)
        with pytest.raises(ValueError, match="mismatch at codebooks"):
            validate_tree(bad, "acoustic")

    def test_missing_key_fails(self, acoustic_tree):
        bad = {k: v for k, v in acoustic_tree.items() if k != "codebooks"}
        with pytest.raises(ValueError, match="missing key: codebooks"):
            validate_tree(bad, "acoustic")

    def test_extra_key_fails(self, acoustic_tree):
        bad = dict(acoustic_tree)
        bad["surprise"] = np.zeros((1,), np.float32)
        with pytest.raises(ValueError, match="unexpected key: surprise"):
            validate_tree(bad, "acoustic")

    def test_wrong_dtype_fails(self, acoustic_tree):
        bad = dict(acoustic_tree)
        bad["codebooks"] = np.asarray(bad["codebooks"], np.float64)
        with pytest.raises(ValueError, match="mismatch at codebooks"):
            validate_tree(bad, "acoustic")


class TestConvertRealStagedPath:
    """Drive scripts/convert_real.convert_all against a synthetic staged
    dir: a real (random-init) EnCodec torch checkpoint converts and
    validates; everything unstaged fails with a clear message instead of
    crashing the run."""

    def test_staged_acoustic_converts_others_fail_loudly(self, tmp_path):
        torch = pytest.importorskip("torch")
        transformers = pytest.importorskip("transformers")
        from transformers import EncodecConfig, EncodecModel

        from scripts.convert_real import convert_all

        root = tmp_path / "staged"
        out = tmp_path / "weights"
        root.mkdir()
        m = EncodecModel(EncodecConfig())
        torch.save(m.state_dict(), root / "encodec_24khz.pt")

        results = convert_all(str(root), str(out))
        assert results["acoustic"] == "OK"
        assert (out / "acoustic.npz").exists()
        for name, status in results.items():
            if name != "acoustic":
                assert status.startswith("FAILED"), (name, status)

        # the converted store loads through the production weight path
        from audiotoken_tpu import weights as weight_store

        params = weight_store.get_acoustic_params(str(out), 0)
        validate_tree(params, "acoustic")

    def test_corrupt_staged_file_fails_validation_not_forward(self, tmp_path):
        torch = pytest.importorskip("torch")
        from transformers import EncodecConfig, EncodecModel

        from scripts.convert_real import convert_all

        root = tmp_path / "staged"
        out = tmp_path / "weights"
        root.mkdir()
        # a truncated/mis-configured checkpoint: wrong codebook count
        m = EncodecModel(EncodecConfig(codebook_size=512))
        torch.save(m.state_dict(), root / "encodec_24khz.pt")

        results = convert_all(str(root), str(out))
        assert results["acoustic"].startswith("FAILED")
        assert not (out / "acoustic.npz").exists()
