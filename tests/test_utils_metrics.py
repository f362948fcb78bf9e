"""Tests for metrics, host utilities, and GPT vocab expansion."""

import numpy as np
import pytest

from audiotoken_tpu.configs import AudioConfig
from audiotoken_tpu.metrics import si_snr, snr
from audiotoken_tpu.utils import collate_audio_tokens, save_audio_tokens


class TestSISNR:
    def test_perfect_reconstruction(self, rng):
        x = rng.standard_normal(8000).astype(np.float32)
        assert si_snr(x, x) > 60

    def test_scale_invariance(self, rng):
        x = rng.standard_normal(8000).astype(np.float32)
        assert si_snr(3.7 * x, x) > 60  # scaling does not hurt SI-SNR
        assert snr(3.7 * x, x) < 0  # but plain SNR collapses

    def test_noise_lowers(self, rng):
        x = rng.standard_normal(8000).astype(np.float32)
        noisy = x + 0.5 * rng.standard_normal(8000).astype(np.float32)
        assert 0 < si_snr(noisy, x) < 15


class TestTokenUtils:
    def test_save_overwrites_not_appends(self, tmp_path, rng):
        cfg = AudioConfig(file_name="x/y/test.wav", length_seconds=1.0, model_token_rate=75)
        toks = rng.integers(0, 1024, size=(8, 80)).astype(np.int16)
        for _ in range(2):  # second run must NOT append (reference bug)
            save_audio_tokens(toks, cfg, str(tmp_path))
        out = np.load(tmp_path / "test.npy")
        assert out.shape == (8, 75)  # truncated to length_tokens

    def test_collate(self):
        cfg = AudioConfig(file_name="a.wav", length_seconds=2.0, model_token_rate=75)
        a = np.zeros((8, 100), np.int16)
        b = np.ones((8, 100), np.int16)
        out = collate_audio_tokens(a, b, cfg)
        assert out.shape == (8, 150)
        assert (out[:, 100:] == 1).all()


class TestExpandVocab:
    def test_statistics_and_shape(self):
        from audiotoken_tpu.nn.gpt import GPTConfig, expand_vocab, init_gpt_params

        cfg = GPTConfig(block_size=8, vocab_size=64, n_layer=1, n_head=2, n_embd=16)
        params = init_gpt_params(np.random.default_rng(0), cfg)
        out = expand_vocab(params, 96, seed=1)
        wte = np.asarray(out["wte"])
        assert wte.shape == (96, 16)
        np.testing.assert_array_equal(wte[:64], np.asarray(params["wte"]))
        # new rows near the old mean (covariance scaled 1e-5)
        old_mu = np.asarray(params["wte"]).mean(0)
        np.testing.assert_allclose(wte[64:].mean(0), old_mu, atol=0.01)


class TestNpzStoreNoneLeaves:
    def test_roundtrip_bias_false_model(self, tmp_path):
        """bias=False pytrees carry None leaves (nanoGPT GPT, w2v-BERT
        pointwise convs, HuBERT extractor, Bark) — save/load must
        round-trip them, not pickle object arrays (advisor r1, high)."""
        from audiotoken_tpu.convert.store import load_params, save_params
        from audiotoken_tpu.nn.gpt import GPTConfig, init_gpt_params

        cfg = GPTConfig(block_size=8, vocab_size=32, n_layer=1, n_head=2,
                        n_embd=16, bias=False)
        params = init_gpt_params(np.random.default_rng(0), cfg)
        assert params["layers"][0]["attn"]["qkv"]["bias"] is None  # precondition
        p = str(tmp_path / "gpt.npz")
        save_params(p, params)
        out = load_params(p)
        assert out["layers"][0]["attn"]["qkv"]["bias"] is None
        assert out["ln_f"]["bias"] is None
        np.testing.assert_array_equal(out["wte"], np.asarray(params["wte"]))
        np.testing.assert_array_equal(
            out["layers"][0]["mlp"]["in"]["kernel"],
            np.asarray(params["layers"][0]["mlp"]["in"]["kernel"]),
        )


class TestOrbaxStore:
    def test_roundtrip(self, tmp_path):
        from audiotoken_tpu.convert.store import load_params_orbax, save_params_orbax

        params = {
            "a": np.arange(6, dtype=np.float32).reshape(2, 3),
            "layers": [{"w": np.ones((4,), np.float32)}],
        }
        d = str(tmp_path / "ckpt")
        save_params_orbax(d, params)
        out = load_params_orbax(d)
        np.testing.assert_array_equal(out["a"], params["a"])
        np.testing.assert_array_equal(out["layers"][0]["w"], params["layers"][0]["w"])
