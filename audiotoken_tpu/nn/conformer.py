"""wav2vec2-BERT 2.0 conformer encoder in JAX (trimmed 21-layer variant).

The semantic_m embedder (SURVEY.md §2.2): 160-dim stacked-fbank input,
feature projection 160->1024, conformer blocks = half-step FFN + self-attn
with `relative_key` position bias (left 64 / right 8) + causal depthwise
conv (kernel 31) + half-step FFN. Reference usage:
/root/reference/audiotoken/encoder.py:172-175 (hidden_states[19] of the
l21-trimmed facebook/w2v-bert-2.0) with the SDPA attention patch
(modeling_wav2vec2_bert.py:20-80).

TPU-first choices:
  - only ``output_layer`` blocks execute (the reference runs all 21 and
    discards layers 20-21's work);
  - the relative_key bias is computed as a [B, H, T, 73] einsum against the
    73 clamped-distance embeddings followed by a gather, instead of
    materializing the [T, T, head_dim] positional tensor the reference
    einsums with (modeling_wav2vec2_bert.py:55-60) — O(T*73*d) vs O(T^2*d)
    FLOPs and memory for the bias term.
"""

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import padding_bias


@dataclass(frozen=True)
class W2VBertConfig:
    hidden_size: int = 1024
    num_hidden_layers: int = 21  # trimmed checkpoint (archive/model_cut.ipynb)
    num_attention_heads: int = 16
    intermediate_size: int = 4096
    feature_projection_input_dim: int = 160
    left_max_position_embeddings: int = 64
    right_max_position_embeddings: int = 8
    conv_depthwise_kernel_size: int = 31
    layer_norm_eps: float = 1e-5
    # "xla": full-score attention (ops/attention.py rationale); "flash":
    # blockwise Pallas kernel with in-kernel rel-key bias — no [T, T]
    # HBM materialization (ops/flash_attention.py, VERDICT r1 #5)
    attn_impl: str = "xla"
    # run the flash kernel under a Mesh via shard_map
    # (ops/flash_attention.py:AttnShard); None = single-device pallas_call
    attn_shard: object = None

    @property
    def head_size(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def num_positions(self) -> int:
        return self.left_max_position_embeddings + self.right_max_position_embeddings + 1


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


def _ffn(p, x, cfg, P):
    h = _linear(p["in"], x, P("ffn_in"))
    h = jax.nn.silu(h)  # swish
    return _linear(p["out"], h, P("ffn_out"))


def _skew_band(pos, T: int, left: int, right: int):
    """[..., T, P] per-distance values -> [..., T, T] relative bias.

    ``pos[..., q, p]`` is the bias for key k = q + p - left (P = left +
    right + 1 distances); keys beyond the band clamp to the edge columns.

    A take_along_axis gather here runs at scalar speed on TPU (measured
    775 ms/block on [8,16,600,600] — the entire round-1 conformer cost).
    The band placement is instead a Transformer-XL-style skew: pad the
    last dim to T+P and reshape, which shears row q right by q positions —
    pure relayout the TPU does at copy speed. The clamped regions outside
    the band are two masked broadcasts of the edge columns.
    """
    P = pos.shape[-1]
    lead = pos.shape[:-2]
    # shear: row q of the padded matrix shifts right by q after the reshape
    padded = jnp.concatenate(
        [pos, jnp.zeros(lead + (T, T), pos.dtype)], axis=-1
    )  # [..., T, P+T]
    flat = padded.reshape(lead + (T * (P + T),))
    flat = flat[..., : T * (P + T - 1)]
    skewed = flat.reshape(lead + (T, P + T - 1))  # [..., q, q+p] = pos[q, p]
    band = jax.lax.slice_in_dim(skewed, left, left + T, axis=-1)  # [..., T, T]

    # clamp regions: k <= q-left-1 -> pos[..., 0]; k >= q+right+1 -> pos[..., P-1]
    qi = jnp.arange(T)[:, None]
    ki = jnp.arange(T)[None, :]
    left_mask = (ki - qi < -left).astype(pos.dtype)
    right_mask = (ki - qi > right).astype(pos.dtype)
    return (
        band
        + left_mask * pos[..., 0:1]
        + right_mask * pos[..., P - 1 : P]
    )


def _rel_key_attention(p, x, mask_bias, frame_mask, cfg: W2VBertConfig, P):
    """Self-attention with `relative_key` position bias.

    scores = (q.k^T + skew(q.E^T)) / sqrt(dh) + mask_bias
    """
    B, T, H = x.shape
    nh, dh = cfg.num_attention_heads, cfg.head_size

    def heads(t):
        return jnp.swapaxes(t.reshape(B, T, nh, dh), 1, 2)

    q = heads(_linear(p["q"], x, P("attn_qkv")))
    k = heads(_linear(p["k"], x, P("attn_qkv")))
    v = heads(_linear(p["v"], x, P("attn_qkv")))

    if cfg.attn_impl == "flash":
        from ..ops.flash_attention import flash_attention_relkey_sharded

        a = flash_attention_relkey_sharded(
            q, k, v, p["distance_embedding"], frame_mask,
            shard=cfg.attn_shard,  # None = plain single-device kernel
            left=cfg.left_max_position_embeddings,
            right=cfg.right_max_position_embeddings,
            interpret=jax.default_backend() != "tpu",
            precision=P("attn_kernel"),
        ).astype(x.dtype)
        a = jnp.swapaxes(a, 1, 2).reshape(B, T, H)
        return _linear(p["out"], a, P("attn_out"))

    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, precision=P("attn_scores"),
        preferred_element_type=jnp.float32,
    )
    # [B, H, T, num_positions] -- tiny compared to [T, T, dh]
    pos = jnp.einsum(
        "bhqd,pd->bhqp", q, p["distance_embedding"].astype(q.dtype),
        precision=P("attn_pos"), preferred_element_type=jnp.float32,
    )
    rel = _skew_band(
        pos, T, cfg.left_max_position_embeddings, cfg.right_max_position_embeddings
    )
    scores = (scores + rel) * (dh**-0.5)
    if mask_bias is not None:
        scores = scores + mask_bias.astype(scores.dtype)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
    a = jnp.einsum(
        "bhqk,bhkd->bhqd", probs, v, precision=P("attn_pv"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    a = jnp.swapaxes(a, 1, 2).reshape(B, T, H)
    return _linear(p["out"], a, P("attn_out"))


def _conv_module(p, x, frame_mask, cfg: W2VBertConfig, P):
    """LN -> mask-zero -> pointwise(2H) -> GLU -> causal depthwise(31) ->
    LN -> swish -> pointwise(H)."""
    h = _layer_norm(p["layer_norm"], x, cfg.layer_norm_eps)
    if frame_mask is not None:
        h = h * frame_mask[:, :, None].astype(h.dtype)
    h = _linear(p["pw1"], h, P("conv"))
    a, b = jnp.split(h, 2, axis=-1)
    h = a * jax.nn.sigmoid(b)  # GLU over channels
    K = cfg.conv_depthwise_kernel_size
    T = h.shape[1]
    hp = jnp.pad(h, ((0, 0), (K - 1, 0), (0, 0)))  # causal left pad
    # depthwise conv as K shifted fused multiply-adds: XLA's grouped-conv
    # lowering took 25 ms here (vs ~0.3 GFLOP of real work); the shift-sum
    # fuses into a couple of VPU passes over [B, T, H]
    w = p["dw_kernel"].astype(h.dtype)  # [K, 1, H]
    acc = jax.lax.slice_in_dim(hp, 0, T, axis=1) * w[0]
    for kk in range(1, K):
        acc = acc + jax.lax.slice_in_dim(hp, kk, kk + T, axis=1) * w[kk]
    h = acc
    h = _layer_norm(p["dw_layer_norm"], h, cfg.layer_norm_eps)
    h = jax.nn.silu(h)
    return _linear(p["pw2"], h, P("conv"))


def _conformer_block(p, x, mask_bias, frame_mask, cfg, P):
    r = x
    h = _layer_norm(p["ffn1_layer_norm"], x, cfg.layer_norm_eps)
    x = _ffn(p["ffn1"], h, cfg, P) * 0.5 + r

    r = x
    h = _layer_norm(p["self_attn_layer_norm"], x, cfg.layer_norm_eps)
    x = _rel_key_attention(p["attn"], h, mask_bias, frame_mask, cfg, P) + r

    x = x + _conv_module(p["conv"], x, frame_mask, cfg, P)

    r = x
    h = _layer_norm(p["ffn2_layer_norm"], x, cfg.layer_norm_eps)
    x = _ffn(p["ffn2"], h, cfg, P) * 0.5 + r
    return _layer_norm(p["final_layer_norm"], x, cfg.layer_norm_eps)


def w2vbert_features(
    params,
    input_features: jnp.ndarray,
    attention_mask: Optional[jnp.ndarray],
    cfg: W2VBertConfig = W2VBertConfig(),
    output_layer: int = 19,
    precision=jax.lax.Precision.HIGHEST,
) -> jnp.ndarray:
    """[B, T, 160] fbank (+frame mask [B, T]) -> hidden_states[output_layer]
    [B, T, hidden]. Runs exactly ``output_layer`` conformer blocks.

    ``precision`` may be a plain `jax.lax.Precision` or a
    `runtime.precision.StagePrecision` per-stage map (mixed exact/fast
    modes, VERDICT r4 #3)."""
    from ..runtime.precision import as_stage_precision

    P = as_stage_precision(precision)
    fp = params["feature_projection"]
    h = _layer_norm(fp["layer_norm"], input_features, cfg.layer_norm_eps)
    h = _linear(fp["projection"], h, P("proj"))

    mask_bias = None
    frame_mask = None
    if attention_mask is not None:
        frame_mask = attention_mask.astype(h.dtype)
        h = h * frame_mask[:, :, None]
        mask_bias = padding_bias(frame_mask)

    for layer in params["layers"][:output_layer]:
        h = _conformer_block(layer, h, mask_bias, frame_mask, cfg, P)
    return h


# ---------------------------------------------------------------------------
# Random init
# ---------------------------------------------------------------------------


def _lin_init(rng, din, dout, bias=True):
    std = float(np.sqrt(1.0 / din))
    p = {"kernel": jnp.asarray(rng.uniform(-std, std, (din, dout)), jnp.float32)}
    p["bias"] = jnp.zeros((dout,), jnp.float32) if bias else None
    return p


def _ln_init(d):
    return {"scale": jnp.ones((d,), jnp.float32), "bias": jnp.zeros((d,), jnp.float32)}


def init_w2vbert_params(rng, cfg: W2VBertConfig = W2VBertConfig()):
    H = cfg.hidden_size
    params = {
        "feature_projection": {
            "layer_norm": _ln_init(cfg.feature_projection_input_dim),
            "projection": _lin_init(rng, cfg.feature_projection_input_dim, H),
        },
        "layers": [],
    }
    for _ in range(cfg.num_hidden_layers):
        params["layers"].append(
            {
                "ffn1_layer_norm": _ln_init(H),
                "ffn1": {
                    "in": _lin_init(rng, H, cfg.intermediate_size),
                    "out": _lin_init(rng, cfg.intermediate_size, H),
                },
                "self_attn_layer_norm": _ln_init(H),
                "attn": {
                    "q": _lin_init(rng, H, H),
                    "k": _lin_init(rng, H, H),
                    "v": _lin_init(rng, H, H),
                    "out": _lin_init(rng, H, H),
                    "distance_embedding": jnp.asarray(
                        rng.standard_normal((cfg.num_positions, cfg.head_size)) * 0.02,
                        jnp.float32,
                    ),
                },
                "conv": {
                    "layer_norm": _ln_init(H),
                    "pw1": _lin_init(rng, H, 2 * H, bias=False),
                    "dw_kernel": jnp.asarray(
                        rng.standard_normal((cfg.conv_depthwise_kernel_size, 1, H)) * 0.02,
                        jnp.float32,
                    ),
                    "dw_layer_norm": _ln_init(H),
                    "pw2": _lin_init(rng, H, H, bias=False),
                },
                "ffn2_layer_norm": _ln_init(H),
                "ffn2": {
                    "in": _lin_init(rng, H, cfg.intermediate_size),
                    "out": _lin_init(rng, cfg.intermediate_size, H),
                },
                "final_layer_norm": _ln_init(H),
            }
        )
    return params
