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


class TestTensorParallelConformer:
    def test_tp_inference_matches_replicated(self, rng):
        """TP inference is a config change (SURVEY.md §2.3): sharding the
        conformer params over 'tp' must not change the features."""
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        from jax.sharding import NamedSharding, PartitionSpec as P

        from audiotoken_tpu.nn.conformer import (
            W2VBertConfig,
            init_w2vbert_params,
            w2vbert_features,
        )
        from audiotoken_tpu.parallel.shard import conformer_param_spec, named_sharding_tree

        cfg = W2VBertConfig(
            hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=128, feature_projection_input_dim=160,
            left_max_position_embeddings=8, right_max_position_embeddings=4,
            conv_depthwise_kernel_size=7,
        )
        params = init_w2vbert_params(np.random.default_rng(0), cfg)
        feats = rng.standard_normal((2, 24, 160)).astype(np.float32)
        mask = np.ones((2, 24), np.float32)

        ref = np.asarray(w2vbert_features(params, feats, mask, cfg, output_layer=2))

        mesh = make_mesh(("dp", "tp"), shape=(2, 4), devices=jax.devices()[:8])
        with mesh:
            shardings = named_sharding_tree(conformer_param_spec(params), mesh)
            params_tp = jax.device_put(params, shardings)
            data = jax.device_put(feats, NamedSharding(mesh, P("dp", None, None)))
            mask_d = jax.device_put(mask, NamedSharding(mesh, P("dp", None)))
            out = np.asarray(
                jax.jit(
                    lambda p, x, m: w2vbert_features(p, x, m, cfg, output_layer=2)
                )(params_tp, data, mask_d)
            )
        np.testing.assert_allclose(out, ref, atol=2e-5)


class TestTensorParallelGPTSampler:
    def test_tp_greedy_rollout_matches_replicated(self, rng):
        """VERDICT r3 #7: GPTSampler takes a mesh — TP inference must be a
        config change for the GPT decode path too. Greedy (top_k=1)
        rollouts on the ('dp','tp') mesh must equal the unsharded sampler's."""
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        from audiotoken_tpu.nn.gpt import GPTConfig, GPTSampler, init_gpt_params

        cfg = GPTConfig(
            block_size=64, vocab_size=128, n_layer=2, n_head=4,
            n_embd=64, bias=False,
        )
        params = init_gpt_params(np.random.default_rng(0), cfg)
        prompts = rng.integers(0, cfg.vocab_size, size=(4, 9)).astype(np.int32)

        ref = GPTSampler(cfg, params).generate_batch(
            prompts, max_new_tokens=16, top_k=1, seed=3
        )
        mesh = make_mesh(("dp", "tp"), shape=(2, 4), devices=jax.devices()[:8])
        tp = GPTSampler(cfg, params, mesh=mesh).generate_batch(
            prompts, max_new_tokens=16, top_k=1, seed=3
        )
        np.testing.assert_array_equal(ref, tp)


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
