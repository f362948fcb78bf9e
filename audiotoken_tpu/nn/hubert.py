"""HuBERT speech encoder (mHuBERT-base architecture) in JAX.

The semantic_s embedder (SURVEY.md §2.2): 7-layer conv feature extractor
(strides 5,2,2,2,2,2,2 => 320x downsample, 50 fps @16 kHz; group-norm on the
first layer), feature projection 512->768, grouped positional conv
(kernel 128, 16 groups, weight-norm dim=2), then post-LN transformer layers.
Reference usage: /root/reference/audiotoken/encoder.py:92-95
(hidden_states[output_layer] with output_layer=11) — here only
``output_layer`` transformer layers are executed instead of all 12.

Masking semantics mirror HF HubertModel exactly: feature-frame lengths from
the conv length formula, zero padded frames before the positional conv,
additive -inf attention bias.
"""

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import multihead_attention, padding_bias


@dataclass(frozen=True)
class HubertConfig:
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    conv_dim: Tuple[int, ...] = (512, 512, 512, 512, 512, 512, 512)
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    conv_bias: bool = False
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    layer_norm_eps: float = 1e-5
    feat_extract_norm: str = "group"  # "group" (base) or "layer"
    # "xla": full-score attention; "flash": blockwise Pallas kernel (no
    # [B, H, T, T] HBM buffer — ops/flash_attention.py, no-rel mode)
    attn_impl: str = "xla"
    # run the flash kernel under a Mesh via shard_map
    # (ops/flash_attention.py:AttnShard); None = single-device pallas_call
    attn_shard: object = None


def feature_lengths(n_samples: int, cfg: HubertConfig) -> int:
    """Conv-extractor output length (HF _get_feat_extract_output_lengths)."""
    n = n_samples
    for k, s in zip(cfg.conv_kernel, cfg.conv_stride):
        n = (n - k) // s + 1
    return n


def _layer_norm(p, x, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _linear(p, x, precision):
    y = jnp.einsum(
        "...i,io->...o", x, p["kernel"], precision=precision,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if p.get("bias") is not None:
        y = y + p["bias"].astype(x.dtype)
    return y


def _conv0_framed(audio, kernel, stride, precision):
    """First extractor conv (C_in == 1) as a framing matmul.

    XLA's conv op puts the single input channel on the lane dimension
    (padded 1 -> 128); instead reshape the waveform into stride-sized
    frames and contract ``k // stride`` consecutive frames against the
    [K, C_out] kernel in ONE einsum — an MXU matmul with no lane-padded
    intermediate. Requires K % stride == 0 (HuBERT: K=10, s=5).
    """
    B, T = audio.shape
    K, _, C = kernel.shape
    t_out = (T - K) // stride + 1
    n_frames = K // stride
    U = -(-T // stride)
    if U * stride > T:
        audio = jnp.pad(audio, ((0, 0), (0, U * stride - T)))
    z = audio.reshape(B, U, stride)
    w = jnp.concatenate(
        [jax.lax.slice_in_dim(z, d, d + t_out, axis=1) for d in range(n_frames)],
        axis=-1,
    )  # [B, t_out, K]
    return jnp.einsum(
        "btk,ko->bto", w, kernel.reshape(K, C).astype(audio.dtype),
        precision=precision, preferred_element_type=jnp.float32,
    ).astype(audio.dtype)


def _conv_extractor(params, audio, cfg: HubertConfig, precision):
    """[B, T] -> [B, T', 512]; valid (no) padding convs + GELU; group-norm
    (num_groups == channels) after the first conv for the "group" variant.

    Reference op: HF HubertFeatureEncoder (encoder.py:60-108 consumes its
    output). The C_in=1 first conv lowers to a framing matmul
    (_conv0_framed); the 512-channel strided convs stay on lax.conv —
    per-tap NHC dots were tried and REJECTED by measurement (conv1 at
    B=8 x 30 s: 65 ms dots vs 50 ms XLA; each tap's [B, T', 512] f32
    partial is an HBM round-trip XLA's fused conv avoids, and with C=512
    the lane-padding motivation behind ops/conv.py:_conv1d_nch_dots does
    not apply).
    """
    h = None
    for i, (k, s) in enumerate(zip(cfg.conv_kernel, cfg.conv_stride)):
        p = params["convs"][i]
        if i == 0 and k % s == 0:
            h = _conv0_framed(audio, p["kernel"], s, precision)
        else:
            x = audio[:, :, None] if i == 0 else h
            h = jax.lax.conv_general_dilated(
                x, p["kernel"].astype(x.dtype),
                window_strides=(s,), padding="VALID",
                dimension_numbers=("NHC", "HIO", "NHC"),
                preferred_element_type=jnp.float32, precision=precision,
            ).astype(x.dtype)
        if p.get("bias") is not None:
            h = h + p["bias"].astype(h.dtype)
        if i == 0 and cfg.feat_extract_norm == "group":
            # GroupNorm(512, 512): normalize each channel over time.
            mu = jnp.mean(h, axis=1, keepdims=True)
            var = jnp.var(h, axis=1, keepdims=True)
            gn = params["group_norm"]
            h = (h - mu) * jax.lax.rsqrt(var + 1e-5) * gn["scale"] + gn["bias"]
        h = jax.nn.gelu(h, approximate=False)
    return h


def _pos_conv(params, x, cfg: HubertConfig, precision):
    """Grouped conv positional embedding: pad 64 both sides, 16 groups,
    drop last output (even kernel), GELU."""
    pad = cfg.num_conv_pos_embeddings // 2
    h = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
    h = jax.lax.conv_general_dilated(
        h, params["kernel"].astype(x.dtype), window_strides=(1,), padding=[(0, 0)],
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=cfg.num_conv_pos_embedding_groups,
        preferred_element_type=jnp.float32, precision=precision,
    ).astype(x.dtype)
    h = h + params["bias"].astype(x.dtype)
    if cfg.num_conv_pos_embeddings % 2 == 0:
        h = h[:, :-1]
    return jax.nn.gelu(h, approximate=False)


def _encoder_layer(p, x, bias, frame_mask, cfg: HubertConfig, precision):
    """Post-LN block: x + attn(x) -> LN -> + ffn -> LN."""
    B, T, H = x.shape
    nh = cfg.num_attention_heads
    dh = H // nh

    def heads(t):
        return jnp.swapaxes(t.reshape(B, T, nh, dh), 1, 2)

    q = heads(_linear(p["attn"]["q"], x, precision))
    k = heads(_linear(p["attn"]["k"], x, precision))
    v = heads(_linear(p["attn"]["v"], x, precision))
    if cfg.attn_impl == "flash":
        from ..ops.flash_attention import flash_attention_relkey_sharded

        a = flash_attention_relkey_sharded(
            q, k, v, None, frame_mask,
            shard=cfg.attn_shard,  # None = plain single-device kernel
            interpret=jax.default_backend() != "tpu",
            precision=precision,
        ).astype(x.dtype)
    else:
        a = multihead_attention(q, k, v, bias=bias, precision=precision)
    a = jnp.swapaxes(a, 1, 2).reshape(B, T, H)
    a = _linear(p["attn"]["out"], a, precision)

    x = _layer_norm(p["layer_norm"], x + a, cfg.layer_norm_eps)
    f = _linear(p["ffn"]["in"], x, precision)
    f = jax.nn.gelu(f, approximate=False)
    f = _linear(p["ffn"]["out"], f, precision)
    return _layer_norm(p["final_layer_norm"], x + f, cfg.layer_norm_eps)


def hubert_features(
    params,
    audio: jnp.ndarray,
    attention_mask: Optional[jnp.ndarray],
    cfg: HubertConfig = HubertConfig(),
    output_layer: int = 11,
    precision=jax.lax.Precision.HIGHEST,
) -> jnp.ndarray:
    """[B, T] waveform (+sample mask) -> hidden_states[output_layer]
    [B, T', hidden]. Runs exactly ``output_layer`` transformer layers."""
    feats = _conv_extractor(params["feature_extractor"], audio, cfg, precision)
    T = feats.shape[1]

    frame_mask = None
    bias = None
    if attention_mask is not None:
        lengths = jnp.sum(attention_mask.astype(jnp.int32), axis=-1)
        for k, s in zip(cfg.conv_kernel, cfg.conv_stride):
            lengths = (lengths - k) // s + 1
        frame_mask = (
            jnp.arange(T)[None, :] < lengths[:, None]
        ).astype(feats.dtype)
        bias = padding_bias(frame_mask)

    fp = params["feature_projection"]
    h = _layer_norm(fp["layer_norm"], feats, cfg.layer_norm_eps)
    h = _linear(fp["projection"], h, precision)

    if frame_mask is not None:
        h = h * frame_mask[:, :, None]
    h = h + _pos_conv(params["pos_conv"], h, cfg, precision)
    h = _layer_norm(params["encoder_layer_norm"], h, cfg.layer_norm_eps)

    for layer in params["layers"][:output_layer]:
        h = _encoder_layer(layer, h, bias, frame_mask, cfg, precision)
    return h


# ---------------------------------------------------------------------------
# Random init (tests without checkpoints)
# ---------------------------------------------------------------------------


def _lin_init(rng, din, dout, bias=True):
    std = float(np.sqrt(1.0 / din))
    p = {"kernel": jnp.asarray(rng.uniform(-std, std, (din, dout)), jnp.float32)}
    p["bias"] = jnp.zeros((dout,), jnp.float32) if bias else None
    return p


def _ln_init(d):
    return {"scale": jnp.ones((d,), jnp.float32), "bias": jnp.zeros((d,), jnp.float32)}


def init_hubert_params(rng, cfg: HubertConfig = HubertConfig()):
    convs = []
    cin = 1
    for i, (k, cout) in enumerate(zip(cfg.conv_kernel, cfg.conv_dim)):
        std = float(np.sqrt(2.0 / (k * cin)))
        convs.append(
            {
                "kernel": jnp.asarray(rng.standard_normal((k, cin, cout)) * std, jnp.float32),
                "bias": jnp.zeros((cout,), jnp.float32) if cfg.conv_bias else None,
            }
        )
        cin = cout
    H = cfg.hidden_size
    params = {
        "feature_extractor": {"convs": convs, "group_norm": _ln_init(cfg.conv_dim[0])},
        "feature_projection": {
            "layer_norm": _ln_init(cfg.conv_dim[-1]),
            "projection": _lin_init(rng, cfg.conv_dim[-1], H),
        },
        "pos_conv": {
            "kernel": jnp.asarray(
                rng.standard_normal(
                    (cfg.num_conv_pos_embeddings, H // cfg.num_conv_pos_embedding_groups, H)
                )
                * 0.02,
                jnp.float32,
            ),
            "bias": jnp.zeros((H,), jnp.float32),
        },
        "encoder_layer_norm": _ln_init(H),
        "layers": [],
    }
    for _ in range(cfg.num_hidden_layers):
        params["layers"].append(
            {
                "attn": {
                    "q": _lin_init(rng, H, H),
                    "k": _lin_init(rng, H, H),
                    "v": _lin_init(rng, H, H),
                    "out": _lin_init(rng, H, H),
                },
                "layer_norm": _ln_init(H),
                "ffn": {
                    "in": _lin_init(rng, H, cfg.intermediate_size),
                    "out": _lin_init(rng, cfg.intermediate_size, H),
                },
                "final_layer_norm": _ln_init(H),
            }
        )
    return params
