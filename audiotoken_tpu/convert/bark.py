"""Bark fine-acoustics checkpoint -> JAX params (nn/bark_fine.py layout).

Two source namings:
  * suno/bark package FineGPT: ``transformer.wtes.{i}.weight``,
    ``transformer.h.{i}.attn.c_attn.weight`` (nn.Linear [out, in]),
    ``lm_heads.{i}.weight`` — the model the reference loads via
    ``bark.generation.load_model(model_type='fine')``
    (/root/reference/audiotoken/decoder.py:103-106).
  * HF transformers BarkFineModel: ``input_embeds_layers.{i}.weight``,
    ``layers.{i}.attn.att_proj.weight``, ``lm_heads.{i}.weight``.
"""

from typing import Dict

import numpy as np

from ..nn.bark_fine import BarkFineConfig
from .gpt import _strip_prefix


def _lin(sd, name, transpose=True):
    w = np.asarray(sd[f"{name}.weight"], np.float32)
    b = sd.get(f"{name}.bias")
    return {
        "kernel": w.T if transpose else w,
        "bias": None if b is None else np.asarray(b, np.float32),
    }


def _ln(sd, name):
    b = sd.get(f"{name}.bias")
    return {
        "scale": np.asarray(sd[f"{name}.weight"], np.float32),
        "bias": None if b is None else np.asarray(b, np.float32),
    }


def convert_bark_fine(sd: Dict[str, np.ndarray], cfg: BarkFineConfig = BarkFineConfig()):
    """suno/bark FineGPT naming.

    suno ships the fine checkpoint with torch.compile's ``_orig_mod.``
    prefix on every key (bark/generation.py strips it at load) — caught
    by scripts/fullsize_dryrun.py's format-faithful synthetic checkpoint.
    """
    sd = _strip_prefix(sd)
    out = {
        "wtes": [
            np.asarray(sd[f"transformer.wtes.{i}.weight"], np.float32)
            for i in range(cfg.n_codes_total)
        ],
        "wpe": np.asarray(sd["transformer.wpe.weight"], np.float32),
        "ln_f": _ln(sd, "transformer.ln_f"),
        "lm_heads": [
            np.asarray(sd[f"lm_heads.{i}.weight"], np.float32).T  # [C, vocab]
            for i in range(cfg.n_codes_total - cfg.n_codes_given)
        ],
        "layers": [],
    }
    for i in range(cfg.n_layer):
        pre = f"transformer.h.{i}"
        out["layers"].append(
            {
                "ln1": _ln(sd, f"{pre}.ln_1"),
                "attn": {
                    "qkv": _lin(sd, f"{pre}.attn.c_attn"),
                    "out": _lin(sd, f"{pre}.attn.c_proj"),
                },
                "ln2": _ln(sd, f"{pre}.ln_2"),
                "mlp": {
                    "in": _lin(sd, f"{pre}.mlp.c_fc"),
                    "out": _lin(sd, f"{pre}.mlp.c_proj"),
                },
            }
        )
    return out


def convert_bark_fine_hf(sd: Dict[str, np.ndarray], cfg: BarkFineConfig = BarkFineConfig()):
    """HF transformers BarkFineModel naming."""
    out = {
        "wtes": [
            np.asarray(sd[f"input_embeds_layers.{i}.weight"], np.float32)
            for i in range(cfg.n_codes_total)
        ],
        "wpe": np.asarray(sd["position_embeds_layer.weight"], np.float32),
        "ln_f": _ln(sd, "layernorm_final"),
        "lm_heads": [
            np.asarray(sd[f"lm_heads.{i}.weight"], np.float32).T
            for i in range(cfg.n_codes_total - cfg.n_codes_given)
        ],
        "layers": [],
    }
    for i in range(cfg.n_layer):
        pre = f"layers.{i}"
        out["layers"].append(
            {
                "ln1": _ln(sd, f"{pre}.layernorm_1"),
                "attn": {
                    "qkv": _lin(sd, f"{pre}.attn.att_proj"),
                    "out": _lin(sd, f"{pre}.attn.out_proj"),
                },
                "ln2": _ln(sd, f"{pre}.layernorm_2"),
                "mlp": {
                    "in": _lin(sd, f"{pre}.mlp.in_proj"),
                    "out": _lin(sd, f"{pre}.mlp.out_proj"),
                },
            }
        )
    return out
