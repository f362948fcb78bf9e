"""End-to-end API tests (random weights): the complete user surface.

Mirrors the reference's documented usage (core.py docstrings): encode a
file / array, chunked encode, encode_batch_files to .npy, decode back to a
waveform. Weights are random (zero-egress test env) — shapes, dtypes,
determinism, and pipeline behavior are validated; numeric parity is covered
by the converter-level tests.
"""

import numpy as np
import pytest

from audiotoken_tpu import AudioToken, Tokenizers
from audiotoken_tpu.io.wavfile import write_wav


@pytest.fixture(scope="module")
def wav_dir(tmp_path_factory):
    rng = np.random.default_rng(7)
    d = tmp_path_factory.mktemp("wavs")
    for i, seconds in enumerate([1.0, 2.5, 0.7]):
        n = int(24_000 * seconds)
        wav = (0.3 * np.sin(2 * np.pi * (200 + 100 * i) * np.arange(n) / 24_000)).astype(
            np.float32
        )
        write_wav(str(d / f"a{i}.wav"), wav[None], 24_000)
    return d


@pytest.fixture(scope="module")
def acoustic():
    return AudioToken(Tokenizers.acoustic, weights="random", num_codebooks=8)


class TestAcousticEncode:
    def test_encode_array(self, acoustic, rng):
        audio = (rng.standard_normal((1, 24_000)) * 0.2).astype(np.float32)
        toks = acoustic.encode(audio)
        assert toks.shape == (1, 8, 75)
        assert toks.dtype == np.int16
        assert toks.min() >= 0 and toks.max() < 1024

    def test_encode_file(self, acoustic, wav_dir):
        toks = acoustic.encode(wav_dir / "a0.wav")
        assert toks.shape == (1, 8, 75)

    def test_encode_bytes(self, acoustic, wav_dir):
        """In-memory compressed audio — the reference raises
        NotImplementedError here (core.py:181-182)."""
        pytest.importorskip("ctypes")
        from audiotoken_tpu.io import _native

        if not _native.native_available():
            pytest.skip("native decoder unavailable")
        data = (wav_dir / "a0.wav").read_bytes()
        toks = acoustic.encode(data)
        np.testing.assert_array_equal(toks, acoustic.encode(wav_dir / "a0.wav"))

    def test_encode_chunked_matches_whole_boundary(self, acoustic, wav_dir):
        """Chunked encode concatenates per-chunk tokens (reference
        core.py:172-179 semantics: 2.5 s at 0.5 s chunks -> 5 x ~38)."""
        toks = acoustic.encode(wav_dir / "a1.wav", chunk_size=0.5)
        assert toks.shape[0] == 1 and toks.shape[1] == 8
        assert toks.shape[2] == 5 * int(np.ceil(0.5 * 24_000 / 320))

    def test_bucketing_token_invariance(self, acoustic, rng):
        """Same audio, different amounts of right-padding context -> same
        tokens (causal stack + trim)."""
        audio = (rng.standard_normal((1, 12_345)) * 0.2).astype(np.float32)
        t1 = acoustic.encode(audio)
        t2 = acoustic.encode(np.pad(audio, ((0, 0), (0, 0))))
        np.testing.assert_array_equal(t1, t2)

    def test_overlap_chunking_reduces_boundary_error(self, acoustic, wav_dir):
        """Overlap-discard chunked encode: same token count, and at least
        as close to the whole-file encode as plain chunking (boundary
        tokens recover the context the reference's scheme loses)."""
        whole = acoustic.encode(wav_dir / "a1.wav")
        plain = acoustic.encode(wav_dir / "a1.wav", chunk_size=0.5)
        lapped = acoustic.encode(wav_dir / "a1.wav", chunk_size=0.5, overlap=0.25)
        assert lapped.shape == plain.shape
        n = min(whole.shape[2], lapped.shape[2])
        match_plain = (plain[:, :, :n] == whole[:, :, :n]).mean()
        match_lap = (lapped[:, :, :n] == whole[:, :, :n]).mean()
        assert match_lap >= match_plain
        assert match_lap > 0.5

    def test_int16_input_token_parity(self, acoustic, rng):
        """int16 PCM input (raw transfer + exact /2^15 on device) must give
        the same tokens as pre-normalized float32."""
        pcm = (rng.standard_normal((1, 24_000)) * 6000).astype(np.int16)
        f32 = pcm.astype(np.float32) / 32768.0
        np.testing.assert_array_equal(acoustic.encode(pcm), acoustic.encode(f32))

    def test_decode_roundtrip_shape(self, acoustic, rng):
        audio = (rng.standard_normal((1, 24_000)) * 0.2).astype(np.float32)
        toks = acoustic.encode(audio)
        wav = acoustic.decode(toks)
        assert wav.shape == (1, 75 * 320)
        assert wav.dtype == np.float32


class TestBatchFiles:
    def test_encode_batch_files(self, acoustic, wav_dir, tmp_path):
        out = tmp_path / "tokens"
        files = sorted(str(p) for p in wav_dir.glob("*.wav"))
        acoustic.encode_batch_files(
            batch_size=2, outdir=out, chunk_size=1.0, num_workers=2,
            audio_files=files,
        )
        # every file written once with per-file token counts
        for i, seconds in enumerate([1.0, 2.5, 0.7]):
            toks = np.load(out / f"a{i}.npy")
            assert toks.shape[0] == 8
            assert toks.shape[1] == int(np.ceil(seconds * 75))

    def test_int16_corpus_path_token_parity(self, acoustic, wav_dir, tmp_path):
        """The corpus pipeline streams PCM16 wavs at model rate as raw int16
        (half the transfer); tokens must equal the f32 path exactly."""
        from audiotoken_tpu.io.dataset import AudioSegmentStream, batched_segments

        files = sorted(str(p) for p in wav_dir.glob("*.wav"))
        outs = {}
        for prefer in (False, True):
            stream = AudioSegmentStream(files, 24_000, 75, 1.0, prefer_int16=prefer)
            toks = []
            for audio, mask, cfgs in batched_segments(stream, 2, num_workers=1):
                if prefer:
                    assert audio.dtype == np.int16  # PCM16 at model rate
                toks.append(np.asarray(acoustic.encoder(audio, mask)))
            outs[prefer] = np.concatenate([t.reshape(-1) for t in toks])
        np.testing.assert_array_equal(outs[False], outs[True])

    def test_rerun_is_idempotent(self, acoustic, wav_dir, tmp_path):
        """Fixes the reference's append-on-rerun bug (utils.py:214-217)."""
        out = tmp_path / "tokens"
        files = sorted(str(p) for p in wav_dir.glob("*.wav"))
        for _ in range(2):
            acoustic.encode_batch_files(
                batch_size=2, outdir=out, chunk_size=1.0, num_workers=1,
                audio_files=files,
            )
        toks = np.load(out / "a1.npy")
        assert toks.shape[1] == int(np.ceil(2.5 * 75))  # not doubled

    def test_corrupt_file_does_not_stop_corpus(self, acoustic, wav_dir, tmp_path):
        """Failure containment (SURVEY.md §5): a bad file is logged and
        skipped; every healthy file still completes."""
        bad_dir = tmp_path / "corpus"
        bad_dir.mkdir()
        import shutil

        for p in wav_dir.glob("*.wav"):
            shutil.copy(p, bad_dir / p.name)
        (bad_dir / "broken.wav").write_bytes(b"RIFFgarbage-not-a-wav")
        out = tmp_path / "tokens"
        acoustic.encode_batch_files(
            batch_size=2, outdir=out, chunk_size=1.0, num_workers=2,
            audio_dir=bad_dir,
        )
        for i in [0, 1, 2]:
            assert (out / f"a{i}.npy").exists()
        assert not (out / "broken.npy").exists()

    def test_audio_dir_relative_layout(self, acoustic, wav_dir, tmp_path):
        out = tmp_path / "rel"
        acoustic.encode_batch_files(
            batch_size=2, outdir=out, chunk_size=1.0, num_workers=1,
            audio_dir=wav_dir,
        )
        assert (out / "a0.npy").exists()


class TestMultiHostExecutor:
    """The jax.process_count()>1 branch of runtime/executor.py (VERDICT r1
    #8): per-host file sharding + per-host manifests into one shared outdir."""

    def _run_as_host(self, monkeypatch, acoustic, files, out, pi, pc):
        import jax

        monkeypatch.setattr(jax, "process_count", lambda: pc)
        monkeypatch.setattr(jax, "process_index", lambda: pi)
        return acoustic.encode_batch_files(
            batch_size=2, outdir=out, chunk_size=1.0, num_workers=1,
            audio_files=files,
        )

    def test_two_hosts_shared_outdir(self, acoustic, wav_dir, tmp_path, monkeypatch):
        from audiotoken_tpu.parallel.mesh import shard_files_for_host

        out = tmp_path / "tokens"
        files = sorted(str(p) for p in wav_dir.glob("*.wav"))
        self._run_as_host(monkeypatch, acoustic, files, out, 0, 2)
        self._run_as_host(monkeypatch, acoustic, files, out, 1, 2)

        # all files written exactly once, by disjoint hosts
        for i in range(3):
            assert (out / f"a{i}.npy").exists()
        # per-host manifests exist and don't collide
        import json

        m0 = json.loads((out / "manifest.p0.json").read_text())["completed"]
        m1 = json.loads((out / "manifest.p1.json").read_text())["completed"]
        assert not (set(m0) & set(m1))
        assert set(m0) == set(shard_files_for_host(files, 0, 2))
        assert set(m1) == set(shard_files_for_host(files, 1, 2))

        # re-run BOTH hosts: union manifest read -> everything skipped
        import os

        mtimes = {f: os.path.getmtime(out / f"a{i}.npy") for i, f in enumerate(files)}
        for pi in (0, 1):
            summary = self._run_as_host(monkeypatch, acoustic, files, out, pi, 2)
            assert summary["batches"] == 0
        for i, f in enumerate(files):
            assert os.path.getmtime(out / f"a{i}.npy") == mtimes[f]

    def test_reshard_to_three_hosts_resumes_from_union(
        self, acoustic, wav_dir, tmp_path, monkeypatch
    ):
        """VERDICT r4 #5: after a 2-host pass, re-shard the (grown) corpus
        to 3 hosts. Hosts must resume from the UNION of the old per-host
        manifests — only the new file is encoded, by exactly one host, and
        coverage stays disjoint and complete."""
        import json
        import os

        out = tmp_path / "tokens"
        files = sorted(str(p) for p in wav_dir.glob("*.wav"))
        self._run_as_host(monkeypatch, acoustic, files, out, 0, 2)
        self._run_as_host(monkeypatch, acoustic, files, out, 1, 2)
        mtimes = {i: os.path.getmtime(out / f"a{i}.npy") for i in range(3)}

        # a new file lands and the job is re-sharded 2 -> 3 hosts
        n = 24_000
        wav = (0.2 * np.sin(2 * np.pi * 330 * np.arange(n) / 24_000)).astype(
            np.float32
        )
        new = tmp_path / "a3.wav"
        write_wav(str(new), wav[None], 24_000)
        files2 = sorted(files + [str(new)])

        summaries = [
            self._run_as_host(monkeypatch, acoustic, files2, out, pi, 3)
            for pi in range(3)
        ]
        # only the host holding the new file did any work
        assert sum(1 for s in summaries if s["batches"] > 0) == 1
        assert (out / "a3.npy").exists()
        # old outputs untouched (resume, not re-encode)
        for i in range(3):
            assert os.path.getmtime(out / f"a{i}.npy") == mtimes[i]
        # union of all per-host manifests covers the grown corpus exactly,
        # and no file appears in two manifests
        manifests = [
            json.loads((out / f"manifest.p{pi}.json").read_text())["completed"]
            for pi in range(3)
            if (out / f"manifest.p{pi}.json").exists()
        ]
        flat = [f for m in manifests for f in m]
        assert len(flat) == len(set(flat)) == len(files2)
        # every host re-run is now a no-op
        for pi in range(3):
            assert self._run_as_host(
                monkeypatch, acoustic, files2, out, pi, 3
            )["batches"] == 0


class TestWriterFailureAborts:
    def test_d2h_failure_raises_not_hangs(self, wav_dir, tmp_path):
        """A device/runtime error in the writer's D2H fetch must abort the
        corpus job with the cause — not leave the main loop blocked on the
        bounded queue (advisor r1)."""
        from audiotoken_tpu.runtime.executor import encode_batch_files
        from audiotoken_tpu.configs import AcousticEncoderConfig

        class Poison:
            def __array__(self, *a, **k):
                raise RuntimeError("simulated device failure")

        class BadEncoder:
            accepts_int16 = False

            def __call__(self, audio, mask):
                return Poison()

        with pytest.raises(RuntimeError, match="token writer failed"):
            encode_batch_files(
                BadEncoder(), AcousticEncoderConfig(), batch_size=2,
                outdir=tmp_path / "out", audio_dir=wav_dir,
            )


class TestFacadeDecodeBatch:
    def test_acoustic_groups_equal_per_file(self, acoustic, rng, tmp_path):
        """Same-shape acoustic token files decode as one device batch with
        outputs equal to per-file decode."""
        seqs = [
            rng.integers(0, 1024, size=(8, 30)).astype(np.int16) for _ in range(3)
        ] + [rng.integers(0, 1024, size=(8, 17)).astype(np.int16)]  # shape break
        paths = []
        for i, s in enumerate(seqs):
            p = tmp_path / f"t{i}.npy"
            np.save(p, s)
            paths.append(str(p))
        wavs = acoustic.decode_batch(paths)
        assert len(wavs) == 4
        for s, w in zip(seqs, wavs):
            # batched vs solo decode differ only by batch-size-dependent
            # XLA tiling (last-ulp); tokens, not waveforms, carry the
            # bit-parity contract
            np.testing.assert_allclose(
                w, acoustic.decode(s[None]), atol=1e-4, rtol=1e-5
            )


class TestSinkSpill:
    def test_pending_bytes_bounded_by_spill(self, tmp_path):
        """Chunks beyond max_pending_bytes spill to .staging and are
        assembled correctly (VERDICT r1 #9 memory contract)."""
        from audiotoken_tpu.configs import AudioConfig
        from audiotoken_tpu.io.sink import TokenSink

        sink = TokenSink(str(tmp_path / "out"), max_pending_bytes=4096)
        n_chunks, K, T = 8, 8, 100  # 8 * 1600 B > 4096 -> spills
        chunks = [
            (np.full((K, T), i, np.int16), i * T) for i in range(n_chunks)
        ]
        for tok, start in chunks:
            # length_seconds=1 @ 100 tok/s -> chunk_length_tokens == T
            sink.add(tok, AudioConfig(file_name="long.wav", start_idx=start,
                                      length_seconds=1.0, model_token_rate=T))
        assert sink._pending_bytes <= 4096
        staged = list((tmp_path / "out" / ".staging").glob("*.npy"))
        assert staged  # spill actually happened
        sink.finish_file("long.wav", n_chunks)
        out = np.load(tmp_path / "out" / "long.npy")
        assert out.shape == (K, n_chunks * T)
        for i in range(n_chunks):
            assert (out[:, i * T:(i + 1) * T] == i).all()
        # staging cleaned up after assembly
        assert not list((tmp_path / "out" / ".staging").glob("*.npy"))


class TestSemanticEncoders:
    def test_semantic_s(self, rng):
        tok = AudioToken(Tokenizers.semantic_s, weights="random")
        audio = (rng.standard_normal((1, 16_000)) * 0.2).astype(np.float32)
        ids = tok.encode(audio)
        assert ids.shape[0] == 1 and ids.shape[1] == 1
        assert ids.shape[2] == 49  # hubert conv frames for 16k samples
        assert ids.dtype == np.int16
        assert ids.min() >= 0 and ids.max() < 1000

    def test_semantic_m(self, rng):
        tok = AudioToken(Tokenizers.semantic_m, weights="random")
        audio = (rng.standard_normal((1, 16_000)) * 0.2).astype(np.float32)
        ids = tok.encode(audio)
        assert ids.shape[0] == 1 and ids.shape[1] == 1
        assert ids.shape[2] == 49  # (1 + (16000-400)//160) // 2
        assert ids.min() >= 0 and ids.max() < 2048

    def test_semantic_m_int16_token_parity(self, rng):
        """int16 PCM input (exact /2^15 on device) must give the same
        ids as pre-scaled float32 (the corpus fast path)."""
        from audiotoken_tpu.encoders import Wav2VecBertEncoder

        enc = Wav2VecBertEncoder(weights="random")
        pcm = (rng.standard_normal((1, 16_000)) * 6000).astype(np.int16)
        f32 = pcm.astype(np.float32) / 32768.0
        np.testing.assert_array_equal(enc(pcm), enc(f32))

    def test_semantic_s_int16_device_normalization(self, rng):
        """int16 PCM normalizes on device (mask-weighted host_transform
        equivalent) — ids must match the host-normalized f32 path."""
        from audiotoken_tpu.encoders import HubertEncoder

        enc = HubertEncoder(weights="random")
        pcm = (rng.standard_normal((1, 16_000)) * 6000).astype(np.int16)
        f32 = enc.host_transform(pcm.astype(np.float32) / 32768.0)
        np.testing.assert_array_equal(enc(pcm), enc(f32))
