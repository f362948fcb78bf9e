"""Bark fine-acoustics parity vs HF BarkFineModel (tiny random config).

Forward logits and the full sliding-window generate (temperature=None =>
argmax, deterministic) must match. Reference call:
decoder.py:109-121 ``bark.api.generate_fine(x_coarse_gen=tokens[0:2])``.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from audiotoken_tpu.convert.bark import convert_bark_fine_hf
from audiotoken_tpu.convert.store import state_dict_to_numpy
from audiotoken_tpu.nn.bark_fine import BarkFineConfig, BarkFineGenerator, bark_fine_logits

TINY = dict(
    block_size=64,
    n_layer=2,
    n_head=4,
    n_embd=32,
    n_codes_total=8,
    n_codes_given=1,
    vocab_size=40,  # codebook_size 32 + filler headroom
    codebook_size=32,
    max_history=32,
)


@pytest.fixture(scope="module")
def bark_pair():
    from transformers import BarkFineConfig as HFConfig
    from transformers import BarkFineModel

    torch.manual_seed(0)
    hf = BarkFineModel(
        HFConfig(
            block_size=TINY["block_size"],
            input_vocab_size=TINY["vocab_size"],
            output_vocab_size=TINY["vocab_size"],
            num_layers=TINY["n_layer"],
            num_heads=TINY["n_head"],
            hidden_size=TINY["n_embd"],
            n_codes_total=8,
            n_codes_given=1,
            dropout=0.0,
            bias=False,
            attn_implementation="eager",
        )
    ).eval()
    cfg = BarkFineConfig(**TINY)
    params = convert_bark_fine_hf(state_dict_to_numpy(hf.state_dict()), cfg)
    return hf, params, cfg


class TestBarkFineLogits:
    @pytest.mark.parametrize("cb", [2, 5, 7])
    def test_forward_parity(self, bark_pair, rng, cb):
        hf, params, cfg = bark_pair
        codes = rng.integers(0, cfg.vocab_size, size=(2, cfg.block_size, 8))
        with torch.no_grad():
            ref = hf(cb, torch.from_numpy(codes)).logits.numpy()
        out = np.asarray(bark_fine_logits(params, codes.astype(np.int32), cb, cfg))
        np.testing.assert_allclose(out, ref, atol=2e-4)


class TestGenerateFine:
    @pytest.mark.parametrize("T", [20, 64, 150])
    def test_argmax_matches_hf(self, bark_pair, rng, T):
        from transformers.models.bark.generation_configuration_bark import (
            BarkCoarseGenerationConfig,
            BarkFineGenerationConfig,
            BarkSemanticGenerationConfig,
        )

        hf, params, cfg = bark_pair
        coarse = rng.integers(0, cfg.codebook_size, size=(2, T)).astype(np.int64)
        svs = 100  # arbitrary semantic vocab offset for the HF input format
        flat = (coarse.T.reshape(1, -1) + svs).astype(np.int64)  # interleaved

        with torch.no_grad():
            ref = hf.generate(
                torch.from_numpy(flat),
                semantic_generation_config=BarkSemanticGenerationConfig(
                    semantic_vocab_size=svs
                ),
                coarse_generation_config=BarkCoarseGenerationConfig(
                    n_coarse_codebooks=2
                ),
                fine_generation_config=BarkFineGenerationConfig(
                    max_fine_history_length=cfg.max_history,
                    max_fine_input_length=cfg.block_size,
                    n_fine_codebooks=8,
                ),
                codebook_size=cfg.codebook_size,
                temperature=None,
            ).numpy()[0]

        gen = BarkFineGenerator(cfg, params)
        out = gen.generate_fine(coarse, temperature=None)
        assert out.shape == (8, T)
        np.testing.assert_array_equal(out[:2], coarse)
        np.testing.assert_array_equal(out, ref)


class TestFlashAttnImpl:
    """attn_impl="flash" (the TPU default; Pallas interpret mode here)
    must reproduce the XLA attention path."""

    def test_logits_close(self, bark_pair, rng):
        _, params, cfg = bark_pair
        codes = rng.integers(0, cfg.vocab_size, size=(2, cfg.block_size, 8))
        xla = np.asarray(
            bark_fine_logits(params, codes.astype(np.int32), 3, cfg, attn_impl="xla")
        )
        flash = np.asarray(
            bark_fine_logits(params, codes.astype(np.int32), 3, cfg, attn_impl="flash")
        )
        np.testing.assert_allclose(flash, xla, atol=2e-4)

    def test_argmax_generate_equal(self, bark_pair, rng):
        _, params, cfg = bark_pair
        coarse = rng.integers(0, cfg.codebook_size, size=(2, 30)).astype(np.int64)
        ref = BarkFineGenerator(cfg, params, attn_impl="xla").generate_fine(
            coarse, temperature=None
        )
        out = BarkFineGenerator(cfg, params, attn_impl="flash").generate_fine(
            coarse, temperature=None
        )
        np.testing.assert_array_equal(out, ref)
