"""Attention ops for the audio encoders.

Bidirectional multi-head attention with an additive bias (padding mask
and/or relative-position terms), computed with f32 softmax. The reference's
performance fix for w2v-BERT was swapping HF's eager matmul attention for
SDPA (/root/reference/audiotoken/modeling_wav2vec2_bert.py:20-80); here the
XLA path fuses the same computation, and sequence lengths are bounded by the
30 s chunk contract (<=1500 frames), so full [T, T] scores fit comfortably.
"""

from typing import Optional

import jax
import jax.numpy as jnp


def multihead_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    precision=jax.lax.Precision.HIGHEST,
) -> jnp.ndarray:
    """q,k,v [B, H, T, Dh]; bias broadcastable to [B, H, T, T] (already
    scaled); returns [B, H, T, Dh]."""
    dh = q.shape[-1]
    scale = dh**-0.5 if scale is None else scale
    scores = (
        jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, precision=precision,
            preferred_element_type=jnp.float32,
        )
        * scale
    )
    if bias is not None:
        scores = scores + bias.astype(scores.dtype)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", probs, v, precision=precision,
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)


def padding_bias(attention_mask: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """[B, T] {0,1} -> additive bias [B, 1, 1, T] (0 keep, -inf-ish drop)."""
    neg = jnp.finfo(dtype).min
    return ((1.0 - attention_mask.astype(dtype)) * neg)[:, None, None, :]
