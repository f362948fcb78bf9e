"""HF HubertModel state dict -> JAX params (nn/hubert.py layout).

Reference loads ``HubertModel.from_pretrained('voidful/mhubert-base')``
(/root/reference/audiotoken/encoder.py:72); this converts that checkpoint.
"""

from typing import Dict

import numpy as np

from ..nn.hubert import HubertConfig


def _norm_keys(sd):
    out = {}
    for k, v in sd.items():
        k = k.replace(".parametrizations.weight.original0", ".weight_g")
        k = k.replace(".parametrizations.weight.original1", ".weight_v")
        out[k] = v
    return out


def _lin(sd, prefix):
    p = {"kernel": np.asarray(sd[f"{prefix}.weight"], np.float32).T}
    b = sd.get(f"{prefix}.bias")
    p["bias"] = None if b is None else np.asarray(b, np.float32)
    return p


def _ln(sd, prefix):
    return {
        "scale": np.asarray(sd[f"{prefix}.weight"], np.float32),
        "bias": np.asarray(sd[f"{prefix}.bias"], np.float32),
    }


def convert_hubert(sd: Dict[str, np.ndarray], cfg: HubertConfig = HubertConfig()):
    sd = _norm_keys(sd)
    convs = []
    for i in range(len(cfg.conv_kernel)):
        w = np.asarray(sd[f"feature_extractor.conv_layers.{i}.conv.weight"], np.float32)
        b = sd.get(f"feature_extractor.conv_layers.{i}.conv.bias")
        convs.append(
            {
                "kernel": w.transpose(2, 1, 0),  # [K, Cin, Cout]
                "bias": None if b is None else np.asarray(b, np.float32),
            }
        )
    params = {
        "feature_extractor": {
            "convs": convs,
            "group_norm": _ln(sd, "feature_extractor.conv_layers.0.layer_norm"),
        },
        "feature_projection": {
            "layer_norm": _ln(sd, "feature_projection.layer_norm"),
            "projection": _lin(sd, "feature_projection.projection"),
        },
        "encoder_layer_norm": _ln(sd, "encoder.layer_norm"),
    }
    # pos conv: weight-norm dim=2 (norm over [C_out, C_in/groups] per tap)
    g = np.asarray(sd["encoder.pos_conv_embed.conv.weight_g"], np.float64)
    v = np.asarray(sd["encoder.pos_conv_embed.conv.weight_v"], np.float64)
    norm = np.sqrt((v**2).sum(axis=(0, 1), keepdims=True))
    w = (g * v / norm).astype(np.float32)  # [C_out, C_in/g, K]
    params["pos_conv"] = {
        "kernel": w.transpose(2, 1, 0),  # [K, C_in/g, C_out]
        "bias": np.asarray(sd["encoder.pos_conv_embed.conv.bias"], np.float32),
    }
    layers = []
    for i in range(cfg.num_hidden_layers):
        pre = f"encoder.layers.{i}"
        layers.append(
            {
                "attn": {
                    "q": _lin(sd, f"{pre}.attention.q_proj"),
                    "k": _lin(sd, f"{pre}.attention.k_proj"),
                    "v": _lin(sd, f"{pre}.attention.v_proj"),
                    "out": _lin(sd, f"{pre}.attention.out_proj"),
                },
                "layer_norm": _ln(sd, f"{pre}.layer_norm"),
                "ffn": {
                    "in": _lin(sd, f"{pre}.feed_forward.intermediate_dense"),
                    "out": _lin(sd, f"{pre}.feed_forward.output_dense"),
                },
                "final_layer_norm": _ln(sd, f"{pre}.final_layer_norm"),
            }
        )
    params["layers"] = layers
    return params
