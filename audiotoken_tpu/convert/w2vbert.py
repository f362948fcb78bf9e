"""HF Wav2Vec2BertModel state dict -> JAX params (nn/conformer.py layout).

Reference loads the l21-trimmed facebook/w2v-bert-2.0 from the
cmeraki/audiotoken hub repo (/root/reference/audiotoken/configs.py:112-135,
encoder.py:139).
"""

from typing import Dict

import numpy as np

from ..nn.conformer import W2VBertConfig


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


def convert_w2vbert(sd: Dict[str, np.ndarray], cfg: W2VBertConfig = W2VBertConfig()):
    params = {
        "feature_projection": {
            "layer_norm": _ln(sd, "feature_projection.layer_norm"),
            "projection": _lin(sd, "feature_projection.projection"),
        },
        "layers": [],
    }
    for i in range(cfg.num_hidden_layers):
        pre = f"encoder.layers.{i}"
        pw1 = np.asarray(sd[f"{pre}.conv_module.pointwise_conv1.weight"], np.float32)
        pw2 = np.asarray(sd[f"{pre}.conv_module.pointwise_conv2.weight"], np.float32)
        dw = np.asarray(sd[f"{pre}.conv_module.depthwise_conv.weight"], np.float32)
        params["layers"].append(
            {
                "ffn1_layer_norm": _ln(sd, f"{pre}.ffn1_layer_norm"),
                "ffn1": {
                    "in": _lin(sd, f"{pre}.ffn1.intermediate_dense"),
                    "out": _lin(sd, f"{pre}.ffn1.output_dense"),
                },
                "self_attn_layer_norm": _ln(sd, f"{pre}.self_attn_layer_norm"),
                "attn": {
                    "q": _lin(sd, f"{pre}.self_attn.linear_q"),
                    "k": _lin(sd, f"{pre}.self_attn.linear_k"),
                    "v": _lin(sd, f"{pre}.self_attn.linear_v"),
                    "out": _lin(sd, f"{pre}.self_attn.linear_out"),
                    "distance_embedding": np.asarray(
                        sd[f"{pre}.self_attn.distance_embedding.weight"], np.float32
                    ),
                },
                "conv": {
                    "layer_norm": _ln(sd, f"{pre}.conv_module.layer_norm"),
                    "pw1": {"kernel": pw1[:, :, 0].T, "bias": None},
                    "dw_kernel": dw.transpose(2, 1, 0),  # [K, 1, H]
                    "dw_layer_norm": _ln(sd, f"{pre}.conv_module.depthwise_layer_norm"),
                    "pw2": {"kernel": pw2[:, :, 0].T, "bias": None},
                },
                "ffn2_layer_norm": _ln(sd, f"{pre}.ffn2_layer_norm"),
                "ffn2": {
                    "in": _lin(sd, f"{pre}.ffn2.intermediate_dense"),
                    "out": _lin(sd, f"{pre}.ffn2.output_dense"),
                },
                "final_layer_norm": _ln(sd, f"{pre}.final_layer_norm"),
            }
        )
    return params
