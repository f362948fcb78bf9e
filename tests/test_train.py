"""Trainer tests: EMA VQ convergence, minibatch k-means, sharded GPT step.

Reference analogs: cluster_tokens.py's online VectorQuantize training and
the GPT training leftovers (gpt2_model.py:172-196). The multi-device test
runs on the 8-virtual-CPU mesh (SURVEY.md §4c).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiotoken_tpu.nn.gpt import GPTConfig, init_gpt_params
from audiotoken_tpu.train.vq_train import (
    EMAVQTrainer,
    VQTrainConfig,
    minibatch_kmeans_step,
)


class TestEMAVQ:
    def test_codebook_converges_to_clusters(self):
        """Data drawn from 8 well-separated gaussians: after training, every
        cluster center has a nearby codebook entry and assignments are
        consistent. Fixed seed: convergence depends on the cluster draw, so
        the shared session rng would make this order-dependent."""
        rng = np.random.default_rng(1234)
        cfg = VQTrainConfig(
            codebook_size=8, dim=4, decay=0.8, threshold_ema_dead_code=0.5
        )
        trainer = EMAVQTrainer(cfg, seed=0)
        centers = rng.standard_normal((8, 4)).astype(np.float32) * 10
        for _ in range(60):
            idx = rng.integers(0, 8, size=512)
            x = centers[idx] + 0.05 * rng.standard_normal((512, 4)).astype(np.float32)
            metrics = trainer.update(x)
        assert metrics["commit_loss"] < 0.5
        assert metrics["active_frac"] >= 0.9
        # every true center within distance 1 of some codebook vector
        d = np.linalg.norm(centers[:, None] - trainer.codebook[None], axis=-1).min(1)
        assert (d < 1.0).all()

    def test_save_load_resume(self, tmp_path, rng):
        cfg = VQTrainConfig(codebook_size=4, dim=3)
        t1 = EMAVQTrainer(cfg, seed=0)
        t1.update(rng.standard_normal((64, 3)).astype(np.float32))
        p = str(tmp_path / "state.npz")
        t1.save(p)
        t2 = EMAVQTrainer(cfg, seed=1)
        t2.load(p)
        np.testing.assert_array_equal(t1.codebook, t2.codebook)
        assert t2.steps == t1.steps


class TestMinibatchKMeans:
    def test_centroids_move_to_data(self, rng):
        k, d = 4, 2
        centers = np.array([[0, 0], [10, 0], [0, 10], [10, 10]], np.float32)
        centroids = jnp.asarray(centers + rng.standard_normal((k, d)).astype(np.float32))
        counts = jnp.zeros((k,))
        for _ in range(50):
            idx = rng.integers(0, k, size=256)
            x = centers[idx] + 0.1 * rng.standard_normal((256, d)).astype(np.float32)
            centroids, counts, inertia = minibatch_kmeans_step(centroids, counts, x, k)
        d_err = np.linalg.norm(np.sort(np.asarray(centroids), 0) - np.sort(centers, 0), axis=-1)
        assert (d_err < 0.5).all()
        assert float(inertia) < 0.2


class TestGPTTrainStep:
    def test_single_device_loss_decreases(self, rng):
        from audiotoken_tpu.train.gpt_train import TrainConfig, make_train_step

        cfg = GPTConfig(block_size=16, vocab_size=32, n_layer=2, n_head=2, n_embd=32)
        params = init_gpt_params(np.random.default_rng(0), cfg)
        step, optimizer = make_train_step(cfg, TrainConfig(learning_rate=1e-2))
        opt_state = optimizer.init(params)
        idx = rng.integers(0, 32, size=(4, 16)).astype(np.int32)
        tgt = np.roll(idx, -1, axis=1).astype(np.int32)
        losses = []
        for _ in range(10):
            params, opt_state, loss = step(params, opt_state, idx, tgt)
            losses.append(float(loss))
        assert losses[-1] < losses[0]

    def test_sharded_step_matches_single(self):
        """The dp x tp sharded step produces the same loss as unsharded."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from audiotoken_tpu.parallel.mesh import make_mesh
        from audiotoken_tpu.parallel.shard import gpt_param_spec, named_sharding_tree
        from audiotoken_tpu.train.gpt_train import TrainConfig, make_train_step

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        cfg = GPTConfig(block_size=16, vocab_size=64, n_layer=2, n_head=4, n_embd=64)
        rng_np = np.random.default_rng(0)
        params = init_gpt_params(rng_np, cfg)
        idx = rng_np.integers(0, 64, size=(4, 16)).astype(np.int32)
        tgt = np.roll(idx, -1, axis=1).astype(np.int32)

        # single-device
        step1, opt1 = make_train_step(cfg, TrainConfig())
        s1 = opt1.init(params)
        _, _, loss1 = step1(params, s1, idx, tgt)

        # sharded
        mesh = make_mesh(("dp", "tp"), devices=jax.devices()[:8])
        stepN, optN, _place = make_train_step(cfg, TrainConfig(), mesh)
        with mesh:
            shardings = named_sharding_tree(gpt_param_spec(params), mesh)
            paramsN = jax.device_put(params, shardings)
            sN = optN.init(paramsN)
            data_sh = NamedSharding(mesh, P("dp", None))
            _, _, lossN = stepN(
                paramsN, sN, jax.device_put(idx, data_sh), jax.device_put(tgt, data_sh)
            )
        np.testing.assert_allclose(float(loss1), float(lossN), rtol=2e-4)
