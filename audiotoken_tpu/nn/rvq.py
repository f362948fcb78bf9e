"""Residual vector quantization (EnCodec-style) in JAX.

Encode: per codebook, nearest-neighbor assignment of the running residual
via the fused ``-(||x||^2 - 2 x.E^T + ||e||^2)`` argmax — the same distance
expression and tie-breaking (first max) the reference's quantizer uses
(exercised at /root/reference/audiotoken/encoder.py:50-52), so token ids
match bit-for-bit in f32. Decode: sum of codebook embeddings
(decoder.py:71).

The codebook scan is a static Python loop over <=32 codebooks; each step is
one [N, D] @ [D, C] MXU matmul. Codebooks are stored stacked [K, C, D] so a
bandwidth change is just a slice, not a recompile of weights.
"""

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class RVQConfig:
    num_quantizers: int = 32
    codebook_size: int = 1024
    dim: int = 128
    frame_rate: int = 75

    def num_quantizers_for_bandwidth(self, bandwidth: float) -> int:
        """bandwidth (kbps) -> number of codebooks; EnCodec's formula
        (bw*1000 / (log2(codebook_size) * frame_rate))."""
        bw_per_q = math.log2(self.codebook_size) * self.frame_rate
        if bandwidth is None or bandwidth <= 0:
            return self.num_quantizers
        return int(max(1, math.floor(bandwidth * 1000 / bw_per_q)))


def _nearest(residual, codebook, precision):
    """residual [B, T, D], codebook [C, D] -> indices [B, T] (first-max
    tie-break, matching torch ``dist.max(-1).indices``)."""
    x2 = jnp.sum(jnp.square(residual), axis=-1, keepdims=True)  # [B,T,1]
    xe = jnp.einsum(
        "btd,cd->btc", residual, codebook,
        precision=precision, preferred_element_type=jnp.float32,
    )
    e2 = jnp.sum(jnp.square(codebook), axis=-1)  # [C]
    dist = -(x2 - 2.0 * xe + e2)
    return jnp.argmax(dist, axis=-1)


def rvq_encode(
    codebooks: jnp.ndarray,
    embeddings: jnp.ndarray,
    num_quantizers: int,
    precision=jax.lax.Precision.HIGHEST,
) -> jnp.ndarray:
    """codebooks [K, C, D], embeddings [B, T, D] -> codes [B, num_q, T]."""
    residual = embeddings.astype(jnp.float32)
    codes = []
    for k in range(num_quantizers):
        cb = codebooks[k].astype(jnp.float32)
        idx = _nearest(residual, cb, precision)
        codes.append(idx)
        residual = residual - cb[idx]
    return jnp.stack(codes, axis=1)  # [B, K, T]


def rvq_decode(
    codebooks: jnp.ndarray,
    codes: jnp.ndarray,
) -> jnp.ndarray:
    """codebooks [K, C, D], codes [B, num_q, T] -> embeddings [B, T, D].

    Implemented as a one-hot-free gather + sum over the active codebooks.
    """
    num_q = codes.shape[1]
    out = codebooks[0][codes[:, 0]]
    for k in range(1, num_q):
        out = out + codebooks[k][codes[:, k]]
    return out


def init_codebooks(rng, cfg: RVQConfig):
    return jnp.asarray(
        rng.standard_normal((cfg.num_quantizers, cfg.codebook_size, cfg.dim)),
        jnp.float32,
    )


__all__ = ["RVQConfig", "rvq_encode", "rvq_decode", "init_codebooks"]
