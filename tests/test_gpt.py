"""GPT (semantic->acoustic model) tests.

Forward parity oracle = HF GPT2LMHeadModel (the reference's GPT is a
faithful GPT-2: gpt2_model.py:199-249 imports HF GPT-2 weights directly).
Generation: the KV-cache decode path must agree with the full-forward path
step by step (greedy), since the reference's generate is full-recompute
(gpt2_model.py:251-280).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from audiotoken_tpu.convert.gpt import convert_gpt
from audiotoken_tpu.convert.store import state_dict_to_numpy
from audiotoken_tpu.nn.gpt import GPTConfig, GPTSampler, gpt_logits, gpt_loss, init_gpt_params

TINY = dict(n_layer=2, n_head=4, n_embd=64, block_size=96, vocab_size=128, bias=True)


@pytest.fixture(scope="module")
def gpt2_pair():
    from transformers import GPT2Config, GPT2LMHeadModel

    torch.manual_seed(0)
    hf = GPT2LMHeadModel(
        GPT2Config(
            n_layer=TINY["n_layer"], n_head=TINY["n_head"], n_embd=TINY["n_embd"],
            n_positions=TINY["block_size"], vocab_size=TINY["vocab_size"],
            attn_pdrop=0.0, embd_pdrop=0.0, resid_pdrop=0.0,
            attn_implementation="eager",
        )
    ).eval()
    cfg = GPTConfig(**TINY)
    params = convert_gpt(state_dict_to_numpy(hf.state_dict()), cfg, hf_conv1d=True)
    return hf, params, cfg


class TestGPTForwardParity:
    def test_logits_match_gpt2(self, gpt2_pair, rng):
        hf, params, cfg = gpt2_pair
        ids = rng.integers(0, cfg.vocab_size, size=(2, 48))
        with torch.no_grad():
            ref = hf(torch.from_numpy(ids)).logits.numpy()
        out = np.asarray(gpt_logits(params, jnp.asarray(ids), cfg))
        np.testing.assert_allclose(out, ref, atol=2e-4)

    def test_loss_ignore_index(self, gpt2_pair, rng):
        _, params, cfg = gpt2_pair
        ids = rng.integers(0, cfg.vocab_size, size=(2, 16))
        tgt = ids.copy()
        tgt[:, :4] = -1  # ignored
        loss = float(gpt_loss(params, jnp.asarray(ids), jnp.asarray(tgt), cfg))
        assert np.isfinite(loss) and loss > 0


class TestKVCacheGenerate:
    def test_greedy_matches_full_forward(self, gpt2_pair, rng):
        """top_k=1 (greedy) KV-cache decode == argmax full-forward rollout."""
        _, params, cfg = gpt2_pair
        prompt = rng.integers(0, cfg.vocab_size, size=(1, 11))
        sampler = GPTSampler(cfg, params)
        out = sampler.generate(
            prompt, max_new_tokens=20, temperature=1.0, top_k=1, stop_token=-2
        )
        # full-forward greedy rollout
        seq = jnp.asarray(prompt)
        ref = []
        for _ in range(20):
            logits = gpt_logits(params, seq, cfg, last_only=True)
            nxt = int(jnp.argmax(logits[0, -1]))
            ref.append(nxt)
            seq = jnp.concatenate([seq, jnp.asarray([[nxt]])], axis=1)
        valid = out[out >= 0]
        np.testing.assert_array_equal(valid, np.asarray(ref)[: len(valid)])
        assert len(valid) == 20

    def test_decode_attn_kernel_matches_xla(self, gpt2_pair, rng):
        """The Pallas L-minor-cache decode attention (the TPU bf16 path;
        interpret mode here) must reproduce the einsum path under greedy
        decode."""
        _, params, cfg = gpt2_pair
        prompt = rng.integers(0, cfg.vocab_size, size=(2, 9))
        ref = GPTSampler(cfg, params, decode_attn="xla").generate_batch(
            prompt, max_new_tokens=12, temperature=1.0, top_k=1, stop_token=-2
        )
        out = GPTSampler(cfg, params, decode_attn="kernel").generate_batch(
            prompt, max_new_tokens=12, temperature=1.0, top_k=1, stop_token=-2
        )
        np.testing.assert_array_equal(out, ref)
        # the blockdiag einsum path (the TPU bf16 production default) is
        # mathematically exact vs head-split — greedy rollout must match
        out_bd = GPTSampler(cfg, params, decode_attn="blockdiag").generate_batch(
            prompt, max_new_tokens=12, temperature=1.0, top_k=1, stop_token=-2
        )
        np.testing.assert_array_equal(out_bd, ref)

    def test_fused_step_matches_default(self, gpt2_pair, rng):
        """The fused decode-step kernels (ops/decode_step_fused.py;
        interpret mode here) reproduce the unfused path under greedy
        decode — on CPU f32 the op sequences are numerically identical."""
        _, params, cfg = gpt2_pair
        prompt = rng.integers(0, cfg.vocab_size, size=(2, 9))
        ref = GPTSampler(cfg, params, fused_step=False).generate_batch(
            prompt, max_new_tokens=12, temperature=1.0, top_k=1, stop_token=-2
        )
        out = GPTSampler(cfg, params, fused_step=True).generate_batch(
            prompt, max_new_tokens=12, temperature=1.0, top_k=1, stop_token=-2
        )
        np.testing.assert_array_equal(out, ref)
        # kernel attention + fused step = the fully-fused small-batch path
        out_k = GPTSampler(
            cfg, params, decode_attn="kernel", fused_step=True
        ).generate_batch(
            prompt, max_new_tokens=12, temperature=1.0, top_k=1, stop_token=-2
        )
        np.testing.assert_array_equal(out_k, ref)

    def test_decode_attn_auto_selection(self, gpt2_pair):
        """"auto" must resolve to the einsum path off-TPU at every batch
        size (the kernel needs interpret mode there), and forced modes
        must be honored; unknown modes rejected."""
        _, params, cfg = gpt2_pair
        s = GPTSampler(cfg, params)  # default -> auto
        assert s.decode_attn == "auto"
        assert s._attn_impl(1) == "xla" and s._attn_impl(32) == "xla"  # CPU
        assert GPTSampler(cfg, params, decode_attn="kernel")._attn_impl(32) == "kernel"
        assert GPTSampler(cfg, params, decode_attn="xla")._attn_impl(1) == "xla"
        assert (
            GPTSampler(cfg, params, decode_attn="blockdiag")._attn_impl(8)
            == "blockdiag"
        )
        with pytest.raises(ValueError):
            GPTSampler(cfg, params, decode_attn="bogus")

    def test_stop_token(self, gpt2_pair, rng):
        _, params, cfg = gpt2_pair
        prompt = rng.integers(0, cfg.vocab_size, size=(1, 5))
        sampler = GPTSampler(cfg, params)
        # find the greedy first token, then use it as the stop token
        first = sampler.generate(prompt, max_new_tokens=1, temperature=1.0, top_k=1)[0]
        out = sampler.generate(
            prompt, max_new_tokens=20, temperature=1.0, top_k=1, stop_token=int(first)
        )
        assert (out == -1).all()  # stopped immediately, stop token excluded

    def test_window_slides_past_block_size(self, gpt2_pair, rng):
        """prompt 90 + 50 new > block 96: the sampler slides the context
        window (reference gpt2_model.py:258-260 crops every step) instead
        of silently capping at block_size - prompt_len (advisor r1)."""
        _, params, cfg = gpt2_pair
        prompt = rng.integers(0, cfg.vocab_size, size=(1, 90))
        sampler = GPTSampler(cfg, params)
        out = sampler.generate(prompt, max_new_tokens=50, temperature=1.0, top_k=1)
        assert (out >= 0).sum() == 50

    def test_sliding_matches_full_forward_crop(self, gpt2_pair, rng):
        """Greedy sliding decode == full-forward greedy rollout that crops
        the context the same way at the re-prefill boundary."""
        _, params, cfg = gpt2_pair
        prompt = rng.integers(0, cfg.vocab_size, size=(1, 90))
        sampler = GPTSampler(cfg, params)
        out = sampler.generate(prompt, max_new_tokens=10, temperature=1.0, top_k=1)
        # reproduce: slide crops to the trailing `keep` tokens, then decodes
        bucket = min(sampler.PROMPT_BUCKET, cfg.block_size // 4)
        keep = cfg.block_size - max(2 * bucket, min(sampler.SLIDE_KEEP_MARGIN, cfg.block_size // 2))
        seq = jnp.asarray(prompt[:, -keep:])
        ref = []
        for _ in range(10):
            logits = gpt_logits(params, seq, cfg, last_only=True)
            nxt = int(jnp.argmax(logits[0, -1]))
            ref.append(nxt)
            seq = jnp.concatenate([seq, jnp.asarray([[nxt]])], axis=1)
        np.testing.assert_array_equal(out[:10], ref)


class TestBatchedGenerate:
    def test_batched_greedy_equals_per_row(self, gpt2_pair, rng):
        """[B, P] batched greedy == each row generated alone (VERDICT r1 #7)."""
        _, params, cfg = gpt2_pair
        sampler = GPTSampler(cfg, params)
        prompts = [
            rng.integers(0, cfg.vocab_size, size=(n,)).astype(np.int32)
            for n in (7, 19, 12)
        ]
        batched = sampler.generate_batch(
            prompts, max_new_tokens=15, temperature=1.0, top_k=1
        )
        for i, p in enumerate(prompts):
            solo = sampler.generate(p, max_new_tokens=15, temperature=1.0, top_k=1)
            np.testing.assert_array_equal(batched[i], solo)

    def test_per_row_stop_bookkeeping(self, gpt2_pair, rng):
        """Rows stop independently: stopping one row must not truncate or
        alter the others."""
        _, params, cfg = gpt2_pair
        sampler = GPTSampler(cfg, params)
        p0 = rng.integers(0, cfg.vocab_size, size=(9,)).astype(np.int32)
        p1 = rng.integers(0, cfg.vocab_size, size=(9,)).astype(np.int32)
        solo0 = sampler.generate(p0, max_new_tokens=12, temperature=1.0, top_k=1)
        solo1 = sampler.generate(p1, max_new_tokens=12, temperature=1.0, top_k=1)
        # stop row 0 on its very first greedy token; row 1 must be untouched
        stop = int(solo0[0])
        if stop in solo1:
            pytest.skip("stop token collides with row 1 (rng-dependent)")
        batched = sampler.generate_batch(
            [p0, p1], max_new_tokens=12, temperature=1.0, top_k=1, stop_token=stop
        )
        assert (batched[0] == -1).all()  # stopped immediately, stop excluded
        np.testing.assert_array_equal(batched[1], solo1)


class TestSamplerDistribution:
    def test_topk_restricts_support(self, rng):
        cfg = GPTConfig(**TINY)
        params = init_gpt_params(np.random.default_rng(0), cfg)
        sampler = GPTSampler(cfg, params)
        prompt = rng.integers(0, cfg.vocab_size, size=(1, 8))
        # greedy twice -> deterministic
        a = sampler.generate(prompt, max_new_tokens=10, temperature=0.7, top_k=1, seed=1)
        b = sampler.generate(prompt, max_new_tokens=10, temperature=0.7, top_k=1, seed=2)
        np.testing.assert_array_equal(a, b)
        # wide sampling varies with seed (overwhelmingly likely)
        c = sampler.generate(prompt, max_new_tokens=10, temperature=1.0, top_k=None, seed=1)
        d = sampler.generate(prompt, max_new_tokens=10, temperature=1.0, top_k=None, seed=2)
        assert not np.array_equal(c, d)

    def test_exact_topk_matches_on_cpu(self, rng):
        """exact_topk forces jax.lax.top_k; on CPU (where approx_max_k is
        never used) both settings take the exact path, so results must be
        identical — this pins the flag's plumbing through the jit."""
        cfg = GPTConfig(**TINY)
        params = init_gpt_params(np.random.default_rng(0), cfg)
        sampler = GPTSampler(cfg, params)
        prompt = rng.integers(0, cfg.vocab_size, size=(1, 8))
        a = sampler.generate(prompt, max_new_tokens=10, temperature=0.9,
                             top_k=5, seed=3)
        b = sampler.generate(prompt, max_new_tokens=10, temperature=0.9,
                             top_k=5, seed=3, exact_topk=True)
        np.testing.assert_array_equal(a, b)
