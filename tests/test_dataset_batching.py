"""batched_segments contracts (VERDICT r2 #4, #8).

1. int16 passthrough must survive the worker sub-streams: batched_segments
   rebuilds AudioSegmentStream per worker, and dropping
   transform_int16_passthrough there silently recomputed prefer_int16 to
   False for exactly the HubertEncoder device-transform case — tokens
   stayed correct but the corpus path paid 2x H2D bytes.
2. Fixed-shape batches: the last partial batch is padded by repeating its
   final segment (config=None for pad rows) so a non-multiple corpus
   triggers exactly one encoder compile.
"""

import numpy as np
import pytest

from audiotoken_tpu.io.dataset import AudioSegmentStream, batched_segments
from audiotoken_tpu.io.wavfile import write_wav

SR = 16_000


@pytest.fixture(scope="module")
def pcm16_dir(tmp_path_factory):
    """PCM16 wavs at the semantic model rate (no resampling => int16-eligible)."""
    rng = np.random.default_rng(3)
    d = tmp_path_factory.mktemp("pcm16")
    for i, seconds in enumerate([1.0, 1.0, 0.5]):
        n = int(SR * seconds)
        wav = (rng.standard_normal((1, n)) * 6000).astype(np.int16)
        write_wav(str(d / f"p{i}.wav"), wav, SR)
    return d


def _files(d):
    return sorted(str(p) for p in d.glob("*.wav"))


class TestInt16Passthrough:
    def _stream(self, files, **kw):
        return AudioSegmentStream(
            files, SR, 50, 0.5,
            transform=lambda w: w - np.mean(w, axis=-1, keepdims=True),
            prefer_int16=True,
            **kw,
        )

    def test_direct_stream_yields_int16(self, pcm16_dir):
        stream = self._stream(_files(pcm16_dir), transform_int16_passthrough=True)
        segs = list(stream)
        assert segs and all(s.audio.dtype == np.int16 for s in segs)

    def test_batched_workers_preserve_int16(self, pcm16_dir):
        """The HubertEncoder corpus configuration: host transform present,
        device-side int16 equivalent available. Worker sub-streams must
        keep yielding int16 (this was silently dropped)."""
        stream = self._stream(_files(pcm16_dir), transform_int16_passthrough=True)
        batches = list(batched_segments(stream, 2, num_workers=2))
        assert batches
        for audio, mask, cfgs in batches:
            assert audio.dtype == np.int16

    def test_without_passthrough_transform_forces_f32(self, pcm16_dir):
        stream = self._stream(_files(pcm16_dir))  # passthrough False
        for audio, mask, cfgs in batched_segments(stream, 2, num_workers=2):
            assert audio.dtype == np.float32


class TestFixedShapeBatches:
    def test_partial_batch_padded_to_batch_size(self, pcm16_dir):
        # 3 files x 0.5 s chunks => 5 segments (the 0.5 s file has 1), so
        # batch_size=2 leaves a remainder ... compute dynamically instead
        stream = AudioSegmentStream(_files(pcm16_dir), SR, 50, 0.5)
        n_segs = len(list(AudioSegmentStream(_files(pcm16_dir), SR, 50, 0.5)))
        bs = 2
        batches = list(batched_segments(stream, bs, num_workers=1))
        assert sum(1 for _ in batches) == -(-n_segs // bs)
        for audio, mask, cfgs in batches:
            # EVERY batch has the full shape: one compile for the corpus
            assert audio.shape[0] == bs
            assert mask.shape[0] == bs
            assert len(cfgs) == bs
        if n_segs % bs:
            audio, mask, cfgs = batches[-1]
            n_real = n_segs % bs
            assert all(c is not None for c in cfgs[:n_real])
            assert all(c is None for c in cfgs[n_real:])
            # pad rows repeat the final real segment
            np.testing.assert_array_equal(audio[n_real], audio[n_real - 1])
            np.testing.assert_array_equal(mask[n_real], mask[n_real - 1])

    def test_drop_last_drops_partial(self, pcm16_dir):
        stream = AudioSegmentStream(_files(pcm16_dir), SR, 50, 0.5)
        n_segs = len(list(AudioSegmentStream(_files(pcm16_dir), SR, 50, 0.5)))
        bs = 2
        batches = list(batched_segments(stream, bs, num_workers=1, drop_last=True))
        assert len(batches) == n_segs // bs
        assert all(a.shape[0] == bs for a, _, _ in batches)
        assert all(c is not None for _, _, cfgs in batches for c in cfgs)
