"""Cross-naming converter tests (VERDICT r1 #6).

The HF-naming branches are covered by the parity suites; these tests cover
the OTHER source namings the reference actually ships checkpoints in —
facebookresearch/encodec (ref encoder.py:38), suno/bark FineGPT (ref
decoder.py:103-106), and nanoGPT with ``_orig_mod.`` prefixes + transposed
linears (ref gpt2_model.py:326-337) — by synthesizing a state dict in each
naming from the same underlying weights and asserting the converted trees
are identical. A wrong rename or missing transpose fails these exactly.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from audiotoken_tpu.convert.store import state_dict_to_numpy


def assert_tree_equal(a, b, path=""):
    if isinstance(a, dict):
        assert isinstance(b, dict) and set(a) == set(b), path
        for k in a:
            assert_tree_equal(a[k], b[k], f"{path}/{k}")
    elif isinstance(a, (list, tuple)):
        assert len(a) == len(b), path
        for i, (x, y) in enumerate(zip(a, b)):
            assert_tree_equal(x, y, f"{path}[{i}]")
    elif a is None:
        assert b is None, path
    else:
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=path)


class TestEncodecPackageNaming:
    def test_package_naming_equals_hf_naming(self):
        """facebookresearch/encodec keys (encoder.model.N.conv.conv.weight_g,
        decoder.model.N.convtr.convtr.*, quantizer.vq.layers.K._codebook.*)
        convert identically to the HF EncodecModel keys."""
        from transformers import EncodecConfig, EncodecModel

        from audiotoken_tpu.convert.encodec import convert_encodec
        from audiotoken_tpu.nn.seanet import SeanetConfig

        torch.manual_seed(0)
        m = EncodecModel(EncodecConfig())
        with torch.no_grad():
            for layer in m.quantizer.layers:
                layer.codebook.embed.normal_(0.0, 1.0)
        hf_sd = state_dict_to_numpy(m.state_dict())

        # decoder layer indices holding TRANSPOSED convs (the upsamples),
        # replicating convert_decoder's index walk
        cfg = SeanetConfig()
        up_idx = set()
        idx = 2  # 0 conv_in, 1 lstm
        for _ratio in cfg.ratios:
            idx += 1  # ELU
            up_idx.add(idx)
            idx += 1
            idx += cfg.num_residual_layers

        def to_package_key(k: str) -> str:
            k = k.replace(".parametrizations.weight.original0", ".weight_g")
            k = k.replace(".parametrizations.weight.original1", ".weight_v")
            if k.startswith("quantizer.layers."):
                return k.replace("quantizer.layers.", "quantizer.vq.layers.").replace(
                    ".codebook.", "._codebook."
                )
            for stack in ("encoder", "decoder"):
                pre = f"{stack}.layers."
                if k.startswith(pre):
                    rest = k[len(pre):]
                    n = int(rest.split(".")[0])
                    k = f"{stack}.model.{rest}"
                    if stack == "decoder" and n in up_idx:
                        return k.replace(".conv.", ".convtr.convtr.", 1)
                    return k.replace(".conv.", ".conv.conv.", 1)
            return k

        pkg_sd = {to_package_key(k): v for k, v in hf_sd.items()}
        assert any(".conv.conv." in k for k in pkg_sd)
        assert any(".convtr.convtr." in k for k in pkg_sd)
        assert any("._codebook." in k for k in pkg_sd)

        assert_tree_equal(convert_encodec(pkg_sd), convert_encodec(hf_sd))


class TestSunoBarkNaming:
    def test_suno_naming_equals_hf_naming(self):
        """suno/bark FineGPT keys convert identically to HF BarkFineModel
        keys (both nn.Linear [out, in] layouts)."""
        from transformers import BarkFineConfig as HFCfg
        from transformers.models.bark.modeling_bark import BarkFineModel

        from audiotoken_tpu.convert.bark import convert_bark_fine, convert_bark_fine_hf
        from audiotoken_tpu.nn.bark_fine import BarkFineConfig

        cfg = BarkFineConfig(
            block_size=16, vocab_size=40, n_layer=2, n_head=2, n_embd=16,
            n_codes_total=8, n_codes_given=1, codebook_size=32,
        )
        torch.manual_seed(0)
        hf = BarkFineModel(
            HFCfg(
                block_size=cfg.block_size,
                input_vocab_size=cfg.vocab_size,
                output_vocab_size=cfg.vocab_size,
                num_layers=cfg.n_layer,
                num_heads=cfg.n_head,
                hidden_size=cfg.n_embd,
                n_codes_total=cfg.n_codes_total,
                n_codes_given=cfg.n_codes_given,
                dropout=0.0, bias=False,
            )
        ).eval()
        hf_sd = state_dict_to_numpy(hf.state_dict())

        rename = [
            ("input_embeds_layers.", "transformer.wtes."),
            ("position_embeds_layer.", "transformer.wpe."),
            ("layernorm_final.", "transformer.ln_f."),
            (".layernorm_1.", ".ln_1."),
            (".layernorm_2.", ".ln_2."),
            (".attn.att_proj.", ".attn.c_attn."),
            (".attn.out_proj.", ".attn.c_proj."),
            (".mlp.in_proj.", ".mlp.c_fc."),
            (".mlp.out_proj.", ".mlp.c_proj."),
        ]

        def to_suno_key(k: str) -> str:
            for old, new in rename:
                k = k.replace(old, new)
            if k.startswith("layers."):
                k = "transformer.h." + k[len("layers."):]
            return k

        # suno ships the torch.compile prefix in the file (bark/
        # generation.py strips it at load) — the converter must too
        suno_sd = {"_orig_mod." + to_suno_key(k): v for k, v in hf_sd.items()}
        assert "_orig_mod.transformer.wtes.0.weight" in suno_sd
        assert "_orig_mod.transformer.h.0.attn.c_attn.weight" in suno_sd

        assert_tree_equal(
            convert_bark_fine(suno_sd, cfg), convert_bark_fine_hf(hf_sd, cfg)
        )


class TestNanoGPTNaming:
    def test_nanogpt_naming_equals_hf_naming(self):
        """nanoGPT keys (_orig_mod. prefix, nn.Linear [out, in]) convert
        identically to HF GPT2 keys (Conv1D [in, out]) — a missing
        transpose in either branch fails this."""
        from transformers import GPT2Config, GPT2LMHeadModel

        from audiotoken_tpu.convert.gpt import convert_gpt
        from audiotoken_tpu.nn.gpt import GPTConfig

        cfg = GPTConfig(
            block_size=16, vocab_size=48, n_layer=2, n_head=2, n_embd=16, bias=True
        )
        torch.manual_seed(0)
        hf = GPT2LMHeadModel(
            GPT2Config(
                n_layer=cfg.n_layer, n_head=cfg.n_head, n_embd=cfg.n_embd,
                n_positions=cfg.block_size, vocab_size=cfg.vocab_size,
            )
        ).eval()
        hf_sd = state_dict_to_numpy(hf.state_dict())

        nano_sd = {}
        for k, v in hf_sd.items():
            if k.startswith("lm_head.") or k.endswith(".attn.bias") or k.endswith(
                ".attn.masked_bias"
            ):
                continue  # nanoGPT ties lm_head and keeps no mask buffers
            if any(s in k for s in ("c_attn.weight", "c_proj.weight", "c_fc.weight")):
                v = np.ascontiguousarray(v.T)  # Conv1D [in,out] -> Linear [out,in]
            nano_sd["_orig_mod." + k] = v

        assert_tree_equal(
            convert_gpt(nano_sd, cfg, hf_conv1d=False),
            convert_gpt(hf_sd, cfg, hf_conv1d=True),
        )
