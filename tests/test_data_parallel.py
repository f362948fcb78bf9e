"""Data-parallel encoding over a device mesh (8 virtual CPU devices).

The scale-out path for encode_batch_files (SURVEY.md §2.3): params
replicated, batch axis sharded over 'dp'; tokens must equal the
single-device result exactly.
"""

import jax
import numpy as np
import pytest

from audiotoken_tpu.configs import AcousticEncoderConfig
from audiotoken_tpu.encoders import AcousticEncoder
from audiotoken_tpu.parallel.mesh import make_mesh, shard_files_for_host


class TestDataParallelEncode:
    def test_tokens_match_single_device(self, rng):
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        mesh = make_mesh(("dp",), devices=jax.devices()[:8])
        cfg = AcousticEncoderConfig(bandwidth=6.0)
        enc1 = AcousticEncoder(cfg, weights="random", seed=0)
        encN = AcousticEncoder(cfg, weights="random", seed=0, mesh=mesh)
        audio = (rng.standard_normal((8, 12_000)) * 0.2).astype(np.float32)
        t1 = enc1(audio)
        tN = encN(audio)
        np.testing.assert_array_equal(t1, tN)

    def test_output_sharded_over_batch(self, rng):
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        mesh = make_mesh(("dp",), devices=jax.devices()[:8])
        enc = AcousticEncoder(
            AcousticEncoderConfig(bandwidth=1.5), weights="random", mesh=mesh
        )
        audio = (rng.standard_normal((8, 6_000)) * 0.2).astype(np.float32)
        codes, _ = enc.dispatch(audio)
        assert len(codes.sharding.device_set) == 8


class TestHostSharding:
    def test_disjoint_and_complete(self):
        files = [f"f{i:03d}.wav" for i in range(10)]
        shards = [shard_files_for_host(files, i, 3) for i in range(3)]
        combined = sorted(sum(shards, []))
        assert combined == sorted(files)
        assert all(
            not set(a) & set(b)
            for i, a in enumerate(shards)
            for b in shards[i + 1 :]
        )
