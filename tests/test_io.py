"""Unit tests for host audio I/O: WAV parsing, resampling, chunked streaming.

Covers the behaviors the reference tests in test/convert_audio.py:9-66
(resample parity, mono conversion, invalid channel count) plus WAV
round-trips the reference delegated to torchaudio.
"""

import math

import numpy as np
import pytest

from audiotoken_tpu.io import wavfile
from audiotoken_tpu.io.audio import convert_audio, process_audio_chunks, read_audio, save_audio
from audiotoken_tpu.io.resample import resample, resample_np, sinc_resample_kernel


class TestWavFile:
    def test_roundtrip_int16(self, tmp_path, rng):
        wav = np.clip(rng.standard_normal((1, 4000)) * 0.3, -0.99, 0.99).astype(np.float32)
        p = str(tmp_path / "a.wav")
        wavfile.write_wav(p, wav, 16_000)
        out, sr = wavfile.read_wav(p)
        assert sr == 16_000
        assert out.shape == wav.shape
        # int16 quantization error bound
        np.testing.assert_allclose(out, wav, atol=1.0 / 32768 + 1e-7)

    def test_stereo(self, tmp_path, rng):
        wav = (rng.standard_normal((2, 1000)) * 0.3).astype(np.float32)
        p = str(tmp_path / "s.wav")
        wavfile.write_wav(p, wav, 8_000)
        out, sr = wavfile.read_wav(p)
        assert out.shape == (2, 1000)

    def test_streaming_matches_full(self, tmp_wav):
        full, sr = wavfile.read_wav(tmp_wav)
        with open(tmp_wav, "rb") as f:
            info = wavfile.parse_header(f)
            chunks = list(wavfile.stream_wav_chunks(f, info, 1234))
        streamed = np.concatenate(chunks, axis=1)
        np.testing.assert_array_equal(full, streamed)


class TestResample:
    @pytest.mark.parametrize("orig,new", [(48_000, 24_000), (44_100, 24_000), (16_000, 24_000), (22_050, 16_000)])
    def test_jax_matches_numpy(self, rng, orig, new):
        x = rng.standard_normal((1, orig)).astype(np.float32)
        a = np.asarray(resample(x, orig, new))
        b = resample_np(x, orig, new)
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=2e-6)

    def test_output_length(self):
        x = np.zeros((1, 44_100), dtype=np.float32)
        y = resample_np(x, 44_100, 24_000)
        g = math.gcd(44_100, 24_000)
        assert y.shape[-1] == math.ceil((24_000 // g) * 44_100 / (44_100 // g))

    def test_sine_preserved(self):
        # A 440 Hz tone resampled 48k -> 24k keeps frequency and amplitude.
        sr_in, sr_out, f0 = 48_000, 24_000, 440.0
        t = np.arange(sr_in) / sr_in
        x = np.sin(2 * np.pi * f0 * t).astype(np.float32)[None]
        y = resample_np(x, sr_in, sr_out)[0]
        t2 = np.arange(y.shape[0]) / sr_out
        expected = np.sin(2 * np.pi * f0 * t2).astype(np.float32)
        # ignore filter edges
        sl = slice(100, -100)
        np.testing.assert_allclose(y[sl], expected[sl], atol=2e-3)

    def test_kernel_matches_torch_formula(self):
        """Re-derive the kernel with torch float64 ops (torchaudio's exact
        recipe, for parity per SURVEY.md §7) and compare."""
        import torch

        orig, new, lpfw, rolloff = 147, 80, 6, 0.99
        base_freq = min(orig, new) * rolloff
        width = math.ceil(lpfw * orig / base_freq)
        idx = torch.arange(-width, width + orig, dtype=torch.float64)[None, None] / orig
        t = torch.arange(0, -new, -1, dtype=torch.float64)[:, None, None] / new + idx
        t *= base_freq
        t = t.clamp_(-lpfw, lpfw)
        window = torch.cos(t * math.pi / lpfw / 2) ** 2
        t *= math.pi
        scale = base_freq / orig
        kernels = torch.where(t == 0, torch.tensor(1.0, dtype=torch.float64), t.sin() / t)
        kernels = (kernels * window * scale).to(torch.float32)

        ours, w, o, n = sinc_resample_kernel(44_100, 24_000)
        assert (o, n) == (orig, new) and w == width
        np.testing.assert_array_equal(ours, kernels.numpy()[:, None, :].reshape(ours.shape))


class TestConvertAudio:
    def test_stereo_to_mono(self, rng):
        x = rng.standard_normal((2, 1000)).astype(np.float32)
        y = convert_audio(x, 16_000, 16_000)
        np.testing.assert_allclose(y, x.mean(0, keepdims=True), rtol=1e-6)

    def test_invalid_channels(self, rng):
        with pytest.raises(RuntimeError):
            convert_audio(rng.standard_normal((3, 100)).astype(np.float32), 16_000, 16_000)

    def test_read_audio_resamples(self, tmp_wav):
        out = read_audio(tmp_wav, 16_000)
        assert out.shape == (1, 16_000)
        assert out.dtype == np.float32


class TestChunkedStreaming:
    def test_chunks_cover_file(self, tmp_wav):
        chunks = list(process_audio_chunks(tmp_wav, None, 24_000, 0.25))
        assert len(chunks) == 4
        full, _ = wavfile.read_wav(tmp_wav)
        cat = np.concatenate([c for c, _ in chunks], axis=1)
        assert cat.shape == full.shape

    def test_chunks_with_resample(self, tmp_wav):
        chunks = [c for c, _ in process_audio_chunks(tmp_wav, None, 16_000, 0.25)]
        assert all(c.shape[0] == 1 for c in chunks)
        total = sum(c.shape[1] for c in chunks)
        assert total == 16_000  # 4 x 0.25s at 16k


class TestSanitizePath:
    """Reference test/utils.py:6-29 behavior."""

    def test_creates_and_resolves(self, tmp_path):
        from audiotoken_tpu.io.audio import sanitize_path

        p = sanitize_path(tmp_path / "a" / "b")
        assert p == str(tmp_path / "a" / "b")
        import os

        assert os.path.isdir(p)
        assert os.path.isabs(p)


class TestSaveAudio:
    def test_save_clamps(self, tmp_path):
        wav = np.array([[0.0, 2.0, -2.0]], dtype=np.float32)
        p = str(tmp_path / "c.wav")
        save_audio(wav, p, 16_000)
        out, _ = wavfile.read_wav(p)
        assert abs(out).max() <= 0.9905

    def test_save_rescale(self, tmp_path):
        wav = np.array([[0.0, 2.0, -1.0]], dtype=np.float32)
        p = str(tmp_path / "r.wav")
        save_audio(wav, p, 16_000, rescale=True)
        out, _ = wavfile.read_wav(p)
        np.testing.assert_allclose(abs(out).max(), 0.99, atol=1e-3)
