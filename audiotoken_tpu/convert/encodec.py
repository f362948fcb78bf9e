"""EnCodec (SEANet + RVQ) torch checkpoint -> JAX params.

Accepts both checkpoint namings for the 24 kHz model the reference loads via
``EncodecModel.encodec_model_24khz()`` (/root/reference/audiotoken/
encoder.py:38, decoder.py:60):

  * facebookresearch/encodec package: ``encoder.model.N.conv.conv.weight_g``,
    ``quantizer.vq.layers.K._codebook.embed`` ...
  * HF transformers EncodecModel: ``encoder.layers.N.conv.parametrizations.
    weight.original0`` / ``weight_g``, ``quantizer.layers.K.codebook.embed``

Weight norm is folded here (w = g * v / ||v||, f64 intermediate), conv
kernels transposed to [K, C_in, C_out] (HIO), transposed-conv kernels to
[K, C_out, C_in], LSTM weights kept in torch layout (nn/seanet.py consumes
them directly).
"""

from typing import Dict

import numpy as np

from ..nn.rvq import RVQConfig
from ..nn.seanet import SeanetConfig
from ..ops.conv import fold_weight_norm


def _normalize_keys(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in sd.items():
        k = k.replace(".parametrizations.weight.original0", ".weight_g")
        k = k.replace(".parametrizations.weight.original1", ".weight_v")
        # facebookresearch/encodec naming -> canonical
        k = k.replace("encoder.model.", "encoder.layers.")
        k = k.replace("decoder.model.", "decoder.layers.")
        k = k.replace(".convtr.convtr.", ".conv.")
        k = k.replace(".conv.conv.", ".conv.")
        if "quantizer.vq.layers." in k:
            k = k.replace("quantizer.vq.layers.", "quantizer.layers.")
            k = k.replace("._codebook.", ".codebook.")
        out[k] = v
    return out


def _conv(sd, prefix: str, transpose: bool = False):
    """Fold weight norm and emit {kernel, bias}.

    Both conv kinds land on the same transpose: forward conv
    [C_out, C_in, K] -> [K, C_in, C_out]; transposed conv
    [C_in, C_out, K] -> [K, C_out, C_in] (the layout
    ops/conv.py:conv_transpose1d expects).
    """
    del transpose  # same permutation either way; kept for call-site clarity
    if f"{prefix}.weight_g" in sd:
        w = fold_weight_norm(sd[f"{prefix}.weight_g"], sd[f"{prefix}.weight_v"])
    else:
        w = np.asarray(sd[f"{prefix}.weight"], dtype=np.float32)
    kernel = w.transpose(2, 1, 0).astype(np.float32)
    bias = sd.get(f"{prefix}.bias")
    bias = None if bias is None else np.asarray(bias, dtype=np.float32)
    return {"kernel": kernel, "bias": bias}


def _lstm(sd, prefix: str, num_layers: int):
    layers = []
    for i in range(num_layers):
        layers.append(
            {
                "wih": np.asarray(sd[f"{prefix}.weight_ih_l{i}"], np.float32),
                "whh": np.asarray(sd[f"{prefix}.weight_hh_l{i}"], np.float32),
                "bih": np.asarray(sd[f"{prefix}.bias_ih_l{i}"], np.float32),
                "bhh": np.asarray(sd[f"{prefix}.bias_hh_l{i}"], np.float32),
            }
        )
    return {"layers": layers}


def _resnet(sd, prefix: str, use_shortcut: bool):
    p = {
        "conv1": _conv(sd, f"{prefix}.block.1.conv"),
        "conv2": _conv(sd, f"{prefix}.block.3.conv"),
    }
    if use_shortcut:
        p["shortcut"] = _conv(sd, f"{prefix}.shortcut.conv")
    return p


def convert_encoder(sd: Dict[str, np.ndarray], cfg: SeanetConfig):
    sd = _normalize_keys(sd)
    n_res = cfg.num_residual_layers
    idx = 0
    p = {"conv_in": _conv(sd, f"encoder.layers.{idx}.conv")}
    idx += 1
    stages = []
    for _ratio in reversed(cfg.ratios):
        res = []
        for _ in range(n_res):
            res.append(_resnet(sd, f"encoder.layers.{idx}", cfg.use_conv_shortcut))
            idx += 1
        idx += 1  # ELU
        stages.append({"res": res, "down": _conv(sd, f"encoder.layers.{idx}.conv")})
        idx += 1
    p["stages"] = stages
    p["lstm"] = _lstm(sd, f"encoder.layers.{idx}.lstm", cfg.lstm_layers)
    idx += 2  # lstm, ELU
    p["conv_out"] = _conv(sd, f"encoder.layers.{idx}.conv")
    return p


def convert_decoder(sd: Dict[str, np.ndarray], cfg: SeanetConfig):
    sd = _normalize_keys(sd)
    n_res = cfg.num_residual_layers
    idx = 0
    p = {"conv_in": _conv(sd, f"decoder.layers.{idx}.conv")}
    idx += 1
    p["lstm"] = _lstm(sd, f"decoder.layers.{idx}.lstm", cfg.lstm_layers)
    idx += 1
    stages = []
    for _ratio in cfg.ratios:
        idx += 1  # ELU
        up = _conv(sd, f"decoder.layers.{idx}.conv", transpose=True)
        idx += 1
        res = []
        for _ in range(n_res):
            res.append(_resnet(sd, f"decoder.layers.{idx}", cfg.use_conv_shortcut))
            idx += 1
        stages.append({"up": up, "res": res})
    p["stages"] = stages
    idx += 1  # ELU
    p["conv_out"] = _conv(sd, f"decoder.layers.{idx}.conv")
    return p


def convert_codebooks(sd: Dict[str, np.ndarray], cfg: RVQConfig) -> np.ndarray:
    sd = _normalize_keys(sd)
    books = [
        np.asarray(sd[f"quantizer.layers.{k}.codebook.embed"], np.float32)
        for k in range(cfg.num_quantizers)
    ]
    return np.stack(books)  # [K, C, D]


def convert_encodec(sd: Dict[str, np.ndarray], seanet_cfg=None, rvq_cfg=None):
    """Full model: {'encoder': ..., 'decoder': ..., 'codebooks': [K,C,D]}."""
    seanet_cfg = seanet_cfg or SeanetConfig()
    rvq_cfg = rvq_cfg or RVQConfig()
    return {
        "encoder": convert_encoder(sd, seanet_cfg),
        "decoder": convert_decoder(sd, seanet_cfg),
        "codebooks": convert_codebooks(sd, rvq_cfg),
    }
