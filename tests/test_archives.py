"""tar/zip corpus ingestion (reference utils.py:104-169 iterate_zip/tar)."""

import tarfile
import zipfile

import numpy as np
import pytest

from audiotoken_tpu.io.audio import iterate_tar, iterate_zip
from audiotoken_tpu.io.wavfile import write_wav


@pytest.fixture()
def archive_dir(tmp_path, rng):
    wavs = {}
    for i, seconds in enumerate([0.5, 1.2]):
        n = int(16_000 * seconds)
        wav = (rng.standard_normal(n) * 0.2).astype(np.float32)
        p = tmp_path / f"w{i}.wav"
        write_wav(str(p), wav[None], 16_000)
        wavs[f"w{i}.wav"] = p

    tar_path = tmp_path / "corpus.tar"
    with tarfile.open(tar_path, "w") as tf:
        for name, p in wavs.items():
            tf.add(p, arcname=name)

    zip_path = tmp_path / "corpus.zip"
    with zipfile.ZipFile(zip_path, "w") as zf:
        for name, p in wavs.items():
            zf.write(p, arcname=name)

    return tmp_path, tar_path, zip_path


class TestArchives:
    def test_tar_chunks(self, archive_dir):
        _tmp, tar_path, _zip = archive_dir
        chunks = list(iterate_tar(tar_path, 16_000, chunk_size=0.5))
        names = {n for _, n in chunks}
        assert names == {"w0.wav", "w1.wav"}
        total = sum(c.shape[-1] for c, n in chunks if n == "w1.wav")
        assert total == int(16_000 * 1.2)

    def test_zip_chunks(self, archive_dir):
        _tmp, _tar, zip_path = archive_dir
        chunks = list(iterate_zip(zip_path, 16_000, chunk_size=2.0))
        assert len(chunks) == 2  # one chunk per file at 2 s chunks

    def test_batch_pipeline_over_tar(self, archive_dir):
        """End-to-end: encode_batch_files over a tar writes one .npy per
        member (reference datasets.py:126-133 path)."""
        tmp, tar_path, _zip = archive_dir
        from audiotoken_tpu import AudioToken, Tokenizers

        tok = AudioToken(Tokenizers.acoustic, weights="random", num_codebooks=2)
        # acoustic expects 24 kHz; the stream resamples from the wav's 16 kHz
        out = tmp / "tokens"
        tok.encode_batch_files(
            batch_size=2, outdir=out, chunk_size=1.0, num_workers=1,
            audio_files=[str(tar_path)],
        )
        a = np.load(out / "w0.npy")
        b = np.load(out / "w1.npy")
        assert a.shape == (2, int(np.ceil(0.5 * 75)))
        assert b.shape == (2, int(np.ceil(1.2 * 75)))
