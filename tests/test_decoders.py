"""Decoder pipeline tests.

AcousticDecoder contract + the 3-stage semantic decode wiring
(decoder.py:210-243: offset/truncate/INFER -> AR generate -> extract ->
de-interleave -> Bark fine -> EnCodec decode) with tiny injected models.
"""

import numpy as np
import pytest

from audiotoken_tpu.configs import COMMONS, SemanticDecoderConfig
from audiotoken_tpu.decoders import AcousticDecoder, _SemanticDecoderBase


class TestAcousticDecoder:
    def test_output_contract(self, rng):
        dec = AcousticDecoder(weights="random")
        codes = rng.integers(0, 1024, size=(1, 8, 30)).astype(np.int32)
        wav = dec(codes)
        assert wav.shape == (1, 30 * 320)
        assert wav.dtype == np.float32

    def test_batch_flattening(self, rng):
        """Reference flattens the batch into one stream (decoder.py:76)."""
        dec = AcousticDecoder(weights="random")
        codes = rng.integers(0, 1024, size=(3, 8, 10)).astype(np.int32)
        wav = dec(codes)
        assert wav.shape == (1, 3 * 10 * 320)

    def test_int16_output_bytes_equal_float_path(self, rng, tmp_path):
        """output_dtype='int16' writes EXACTLY the WAV bytes of the float
        path (device-side save_audio clamp + write_wav quantization)."""
        from audiotoken_tpu.io.audio import save_audio

        codes = rng.integers(0, 1024, size=(1, 8, 30)).astype(np.int32)
        wav_f = AcousticDecoder(weights="random")(codes)
        dec_i = AcousticDecoder(weights="random", output_dtype="int16")
        wav_i = dec_i(codes)
        assert wav_i.dtype == np.int16 and wav_i.shape == wav_f.shape

        save_audio(wav_f, tmp_path / "f.wav", 24_000)
        save_audio(wav_i, tmp_path / "i.wav", 24_000)
        assert (tmp_path / "f.wav").read_bytes() == (tmp_path / "i.wav").read_bytes()

    def test_auto_split_bit_invisible(self, rng):
        """max_device_batch sub-batching (round-5: a single >= 16-row
        30 s x 16-cb compile exceeds HBM on TPU) must be bit-invisible —
        per-sample independence, same contract as the encoders' split.
        B=9 forces a padded partial sub-batch."""
        codes = rng.integers(0, 1024, size=(9, 8, 12)).astype(np.int32)
        whole = AcousticDecoder(weights="random", max_device_batch=None)(codes)
        split = AcousticDecoder(weights="random", max_device_batch=4)(codes)
        np.testing.assert_array_equal(whole, split)


class TestDeserialize:
    def test_deinterleave(self):
        cfg = SemanticDecoderConfig()
        dec = object.__new__(_SemanticDecoderBase)
        dec.config = cfg
        stream = np.array([5, 1024 + 7, 9, 1024 + 11, 13])  # odd trailing token
        out = dec._deserialize(stream)
        np.testing.assert_array_equal(out, [[5, 9], [7, 11]])


class TestSemanticDecodePipeline:
    @pytest.fixture()
    def tiny_decoder(self, monkeypatch, rng):
        """HubertDecoder with tiny injected GPT/Bark/EnCodec weights."""
        from audiotoken_tpu import weights as ws
        from audiotoken_tpu.nn.bark_fine import BarkFineConfig, init_bark_fine_params
        from audiotoken_tpu.nn.gpt import GPTConfig, init_gpt_params
        from audiotoken_tpu.nn.rvq import RVQConfig, init_codebooks
        from audiotoken_tpu.nn.seanet import SeanetConfig, init_decoder_params, init_encoder_params

        vocab = SemanticDecoderConfig().vocab
        gpt_cfg = GPTConfig(
            block_size=512, vocab_size=vocab.vocab_size, n_layer=1, n_head=2, n_embd=32
        )
        bark_cfg = BarkFineConfig(
            block_size=64, n_layer=1, n_head=2, n_embd=32, vocab_size=1056,
            codebook_size=1024, max_history=32,
        )
        r = np.random.default_rng(0)

        def fake_gpt(weights, seed, key, vs):
            return init_gpt_params(r, gpt_cfg), gpt_cfg

        def fake_bark(weights, seed):
            return init_bark_fine_params(r, bark_cfg), bark_cfg

        monkeypatch.setattr(ws, "get_semantic_gpt_params", fake_gpt)
        monkeypatch.setattr(ws, "get_bark_fine_params", fake_bark)

        from audiotoken_tpu.decoders import HubertDecoder

        return HubertDecoder(weights="random", max_new_tokens=24)

    def test_end_to_end(self, tiny_decoder, rng):
        semantic_ids = rng.integers(0, 1000, size=20)
        wav = tiny_decoder(semantic_ids)
        assert wav.ndim == 2 and wav.shape[0] == 1
        assert wav.dtype == np.float32
        assert wav.shape[1] % 320 == 0 and wav.shape[1] > 0

    def test_language_gate(self):
        from audiotoken_tpu.decoders import HubertDecoder

        with pytest.raises(AssertionError):
            HubertDecoder(language=COMMONS.HI, weights="random")

    def test_decode_batch_variable_lengths(self, tiny_decoder, rng):
        """decode_batch handles rows of different source lengths: every
        row yields a non-empty hop-aligned waveform (VERDICT r1 #4)."""
        sources = [
            rng.integers(0, 1000, size=n) for n in (20, 11, 16)
        ]
        wavs = tiny_decoder.decode_batch(sources, seed=3)
        assert len(wavs) == 3
        for w in wavs:
            assert w.ndim == 2 and w.shape[0] == 1
            assert w.dtype == np.float32
            assert w.shape[1] % 320 == 0 and w.shape[1] > 0

    def test_decode_batch_greedyless_determinism(self, tiny_decoder, rng):
        """Same seed -> same batched decode output."""
        sources = [rng.integers(0, 1000, size=14) for _ in range(2)]
        a = tiny_decoder.decode_batch(sources, seed=5)
        b = tiny_decoder.decode_batch(sources, seed=5)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)

    def test_pipelined_equals_per_chunk_serial(self, tiny_decoder, rng):
        """The two-deep host pipeline (VERDICT r4 #4) is a pure scheduling
        change: its output must be bit-identical to decoding each chunk
        serially with the documented per-chunk seed derivation."""
        sources = [rng.integers(0, 1000, size=n) for n in (20, 11, 16, 9, 14)]
        seed, C = 7, 2
        piped = tiny_decoder.decode_batch(sources, seed=seed, pipeline_batch=C)
        stride = tiny_decoder._CHUNK_SEED_STRIDE
        serial = []
        for i in range(0, len(sources), C):
            serial += tiny_decoder.decode_batch(
                sources[i: i + C], seed=seed + stride * (i // C)
            )
        assert len(piped) == len(serial) == 5
        for x, y in zip(piped, serial):
            np.testing.assert_array_equal(x, y)

    def test_pipeline_batch_noop_when_not_exceeded(self, tiny_decoder, rng):
        """pipeline_batch >= len(sources) takes the monolithic path (same
        bits as the plain call)."""
        sources = [rng.integers(0, 1000, size=12) for _ in range(2)]
        a = tiny_decoder.decode_batch(sources, seed=5)
        b = tiny_decoder.decode_batch(sources, seed=5, pipeline_batch=4)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)
