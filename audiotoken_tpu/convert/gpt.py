"""Semantic->acoustic GPT checkpoint -> JAX params (nn/gpt.py layout).

Handles the reference's nanoGPT-style checkpoints
(``hubert_semantic_acoustic_gpt_en.pt`` / ``w2vbert2_semantic_acoustic_
gpt_hi.pt``, loaded at /root/reference/audiotoken/gpt2_model.py:326-337
with ``_orig_mod.`` compile-prefix stripping) and HF GPT2LMHeadModel
(whose Conv1D weights are already [in, out]; gpt2_model.py:199-249).
"""

from typing import Dict

import numpy as np

from ..nn.gpt import GPTConfig


def _strip_prefix(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in sd.items():
        if k.startswith("_orig_mod."):
            k = k[len("_orig_mod.") :]
        out[k] = v
    return out


def convert_gpt(
    sd: Dict[str, np.ndarray],
    cfg: GPTConfig = GPTConfig(),
    hf_conv1d: bool = False,
) -> dict:
    """``hf_conv1d=True`` for HF GPT2 checkpoints (Conv1D = [in, out],
    no transpose); False for nanoGPT nn.Linear ([out, in])."""
    sd = _strip_prefix(sd)

    def lin(name):
        w = np.asarray(sd[f"{name}.weight"], np.float32)
        kernel = w if hf_conv1d else w.T
        b = sd.get(f"{name}.bias")
        return {
            "kernel": kernel,
            "bias": None if b is None else np.asarray(b, np.float32),
        }

    def ln(name):
        b = sd.get(f"{name}.bias")
        return {
            "scale": np.asarray(sd[f"{name}.weight"], np.float32),
            "bias": None if b is None else np.asarray(b, np.float32),
        }

    params = {
        "wte": np.asarray(sd["transformer.wte.weight"], np.float32),
        "wpe": np.asarray(sd["transformer.wpe.weight"], np.float32),
        "ln_f": ln("transformer.ln_f"),
        "layers": [],
    }
    for i in range(cfg.n_layer):
        pre = f"transformer.h.{i}"
        params["layers"].append(
            {
                "ln1": ln(f"{pre}.ln_1"),
                "attn": {"qkv": lin(f"{pre}.attn.c_attn"), "out": lin(f"{pre}.attn.c_proj")},
                "ln2": ln(f"{pre}.ln_2"),
                "mlp": {"in": lin(f"{pre}.mlp.c_fc"), "out": lin(f"{pre}.mlp.c_proj")},
            }
        )
    return params
