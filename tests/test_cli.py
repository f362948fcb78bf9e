"""CLI surface tests (cli.py tokenize / detokenize / convert).

Reference analogs: core.py:361-404 and scripts/{tokenize,detokenize}_audio.py.
"""

import numpy as np
import pytest

from audiotoken_tpu.cli import main
from audiotoken_tpu.io.wavfile import read_wav, write_wav


@pytest.fixture()
def wavs(tmp_path, rng):
    d = tmp_path / "wavs"
    d.mkdir()
    for i in range(2):
        n = 24_000 + i * 6_000
        wav = (rng.standard_normal(n) * 0.2).astype(np.float32)
        write_wav(str(d / f"x{i}.wav"), wav[None], 24_000)
    return d


class TestTokenizeCLI:
    def test_batch_tokenize(self, wavs, tmp_path):
        out = tmp_path / "toks"
        main([
            "tokenize", "--tokenizer", "acoustic", "--weights", "random",
            "--indir", str(wavs), "--outdir", str(out),
            "--chunk_size", "1.0", "--batch_size", "2", "--workers", "1",
            "--num_codebooks", "4",
        ])
        t0 = np.load(out / "x0.npy")
        assert t0.shape == (4, 75)

    def test_detokenize(self, wavs, tmp_path):
        toks = tmp_path / "toks"
        main([
            "tokenize", "--tokenizer", "acoustic", "--weights", "random",
            "--indir", str(wavs), "--outdir", str(toks),
            "--chunk_size", "1.0", "--batch_size", "2", "--workers", "1",
            "--num_codebooks", "8",
        ])
        wav_out = tmp_path / "wavs_out"
        main([
            "detokenize", "--tokenizer", "acoustic", "--weights", "random",
            "--indir", str(toks), "--outdir", str(wav_out),
            "--num_codebooks", "8",
        ])
        audio, sr = read_wav(str(wav_out / "x0.wav"))
        assert sr == 24_000
        assert audio.shape[1] == 75 * 320


class TestConvertCLI:
    def test_convert_gpt_checkpoint(self, tmp_path):
        """nanoGPT-format .pt (with _orig_mod. prefixes) -> canonical npz
        loadable by the weight store (gpt2_model.py:326-337 analog)."""
        torch = pytest.importorskip("torch")
        from transformers import GPT2Config, GPT2LMHeadModel

        # build a tiny nanoGPT-style state dict via HF GPT2 + renames
        torch.manual_seed(0)
        hf = GPT2LMHeadModel(
            GPT2Config(n_layer=1, n_head=2, n_embd=32, n_positions=16, vocab_size=64)
        )
        sd = {}
        for k, v in hf.state_dict().items():
            if k.endswith(".attn.bias") or k.endswith(".attn.masked_bias"):
                continue
            k = k.replace("transformer.", "_orig_mod.transformer.")
            if any(s in k for s in ("c_attn.weight", "c_proj.weight", "c_fc.weight")):
                v = v.t().contiguous()  # Conv1D -> Linear layout
            sd[k] = v
        src = tmp_path / "gpt.pt"
        torch.save({"model": sd}, src)

        out = tmp_path / "weights"
        import audiotoken_tpu.cli as cli
        from audiotoken_tpu.nn.gpt import GPTConfig as MyCfg

        # convert with a matching tiny config
        from audiotoken_tpu.convert.gpt import convert_gpt
        from audiotoken_tpu.convert.store import save_params, load_params
        from audiotoken_tpu.weights import _load_torch_sd

        params = convert_gpt(
            _load_torch_sd(str(src)),
            MyCfg(n_layer=1, n_head=2, n_embd=32, block_size=16, vocab_size=64, bias=True),
        )
        save_params(str(out / "gpt_semantic_s_en.npz"), params)
        loaded = load_params(str(out / "gpt_semantic_s_en.npz"))
        np.testing.assert_array_equal(loaded["wte"], np.asarray(params["wte"]))
        assert len(loaded["layers"]) == 1
