"""Pallas TPU kernel: single-token KV-cache attention for AR decode.

The GPT decode step (nn/gpt.py:_generate_impl) is cache-read-bound: every
step streams the whole KV cache per layer. With the head-split layout
[B, nh, slots, dh=64], XLA stores the cache HBM-tiled T(8,128) with every
tile HALF PADDING (64 of 128 lanes), so each read streams 2x the cache's
bytes — measured 1.84 us/slot step-time slope at B=16/12L on v5e vs the
0.73 us read-only roofline. Time-minormost einsums don't fix it (XLA
re-lays the slices out per step: ARCHITECTURE.md "Rejected (measured):
TIME-MINORMOST"), and a per-head batched kernel dot doesn't either
(Mosaic unrolls the nh-batched [1,dh]x[dh,L] matvecs into ~0.8 us ops —
the kernel's measured per-call cost was ~6x its DMA floor).

This kernel reads UNPADDED layouts with exactly TWO fat MXU dots per
G-row grid step and no in-kernel transposes:

  * k cache [B, nh*dh, L]  (L-minor; (8,128) tiles fit exactly)
  * v cache [B, L, nh*dh]  (nh*dh=768-minor; tiles fit exactly)
  * scores:  s = Qb @ k   with Qb [nh, nh*dh] BLOCK-DIAGONAL — row h
    carries q_h in lanes [h*dh, (h+1)*dh). One [12,768]x[768,L] dot per
    row replaces 12 matvecs; off-head cross terms never exist because
    Qb is 0 there.
  * values:  C = p @ v -> [nh, nh*dh] cross matrix whose per-head
    diagonal block C[h, h*dh:(h+1)*dh] is the attention output.

Qb is built and C is compacted OUTSIDE the kernel in XLA (an eye-masked
broadcast-multiply each; [B, nh, nh*dh] is ~0.5 MB — noise next to the
~100 MB cache read). Building Qb in-kernel with a pltpu.roll stride
shear compiles in interpret mode but Mosaic REJECTS it on hardware:
`tpu.dynamic_rotate` with stride=dh=64 across sublanes needs per-vreg
shift spread 7*64=448 > the 128-lane vreg width ("max shift in a vreg
448 is larger than the vreg's width 128").

Outputs are the UNNORMALIZED (acc, m, l) softmax partials over cached
slots so the caller folds in the current token's self-term:

    M = max(m, s_self); out = (acc*e^(m-M) + e^(s_self-M)*v_new) / (l*e^(m-M) + e^(s_self-M))

A fully-masked row's m sits at ~finfo.min, so e^(m-M) underflows to 0 and
the self-term alone survives.

Reference analog: the torch sampler re-forwards the full prefix per token
(/root/reference/audiotoken/gpt2_model.py:251-280) — no cache at all;
this is the TPU-native replacement's hot read path.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(qb_ref, k_ref, v_ref, valid_ref, cross_ref, m_ref, l_ref):
    qb = qb_ref[:]  # [G, nh, nh*dh] block-diagonal (pre-scaled q)
    k = k_ref[:]  # [G, nh*dh, L]
    v = v_ref[:]  # [G, L, nh*dh]

    s = jax.lax.dot_general(
        qb, k, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [G, nh, L]
    s = s + (1.0 - valid_ref[:]) * jnp.finfo(jnp.float32).min  # [G, nh, L]

    m = jnp.max(s, axis=-1, keepdims=True)  # [G, nh, 1]
    p = jnp.exp(s - m)  # masked lanes underflow to 0 (min-biased scores)
    l = jnp.sum(p, axis=-1, keepdims=True)
    cross_ref[:] = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [G, nh, nh*dh]; row h's slots-weighted values sit at lanes h*dh..
    m_ref[:] = m
    l_ref[:] = l


def _kernel_fused(qb_ref, k_ref, v_ref, valid_ref, knew_ref, vnew_ref,
                  out_ref):
    """Like _kernel, but folds the current token's self-term, the per-head
    normalization and the diagonal-block compaction in-kernel, emitting the
    FINAL flat attention output [G, nh*dh] — the layout the out-projection
    consumes. Removes ~8 small XLA ops per decode layer."""
    qb = qb_ref[:]  # [G, nh, nh*dh] block-diagonal (pre-scaled q)
    k = k_ref[:]  # [G, nh*dh, L]
    v = v_ref[:]  # [G, L, nh*dh]
    G, nh, C = qb.shape

    s = jax.lax.dot_general(
        qb, k, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [G, nh, L]
    s = s + (1.0 - valid_ref[:]) * jnp.finfo(jnp.float32).min  # [G, nh, L]

    m = jnp.max(s, axis=-1, keepdims=True)  # [G, nh, 1]
    p = jnp.exp(s - m)  # masked lanes underflow to 0 (min-biased scores)
    l = jnp.sum(p, axis=-1, keepdims=True)
    cross = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [G, nh, nh*dh]; row h's slots-weighted values sit at lanes h*dh..

    # self-term score: qb is zero off its head's lane block, so the full
    # lane contraction against the flat new key IS per-head q . k_new
    # (pre-scaled): s_self[g, h] = sum_c qb[g,h,c] * k_new[g,c]
    knew = knew_ref[:].astype(jnp.float32)  # [G, nh*dh]
    s_self = jnp.sum(qb.astype(jnp.float32) * knew[:, None, :], axis=-1,
                     keepdims=True)  # [G, nh, 1]

    # numerically-safe softmax combine with the cached partials: a fully
    # masked row's m sits at ~finfo.min, so alpha underflows and the
    # self-term alone survives (same contract as the unfused combine)
    mx = jnp.maximum(m, s_self)
    alpha = jnp.exp(m - mx)
    w = jnp.exp(s_self - mx)
    denom = l * alpha + w  # [G, nh, 1]

    # block-diagonal selector: lane c belongs to head c // dh
    dh = C // nh
    head_of_lane = jax.lax.broadcasted_iota(jnp.int32, (nh, C), 1) // dh
    bd = (head_of_lane == jax.lax.broadcasted_iota(jnp.int32, (nh, C), 0))
    vnew = vnew_ref[:].astype(jnp.float32)  # [G, nh*dh]
    num = alpha * cross + w * vnew[:, None, :]  # [G, nh, C]
    per_head = jnp.where(bd[None], num / denom, 0.0)
    out_ref[:] = jnp.sum(per_head, axis=1).astype(out_ref.dtype)  # [G, C]


@partial(jax.jit, static_argnames=("interpret", "group"))
def decode_attention_fused(q, k_cache, v_cache, valid, k_new, v_new,
                           interpret: bool = False, group: int = None):
    """Fully-fused single-token cached attention: q [B, nh, dh]
    (pre-scaled); k_cache [B, nh*dh, L]; v_cache [B, L, nh*dh]; valid
    [B, L] {0,1}; k_new/v_new [B, nh*dh] (the current token's flat k/v,
    k_new consumed un-scaled) -> a [B, nh*dh] in v_cache.dtype — the
    normalized attention output INCLUDING the current token, flat in the
    head-concat layout the out-projection consumes."""
    B, nh, dh = q.shape
    L = k_cache.shape[-1]
    eye = jnp.eye(nh, dtype=q.dtype)
    qb = (q[:, :, None, :] * eye[None, :, :, None]).reshape(B, nh, nh * dh)
    G = group or next(g for g in (8, 4, 2, 1) if B % g == 0)
    assert B % G == 0, (B, G)
    return pl.pallas_call(
        _kernel_fused,
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec((G, nh, nh * dh), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, nh * dh, L), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, L, nh * dh), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            # [G, nh, L] pre-broadcast mask: see decode_attention
            pl.BlockSpec((G, nh, L), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, nh * dh), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, nh * dh), lambda b: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G, nh * dh), lambda b: (b, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, nh * dh), v_cache.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        qb, k_cache, v_cache,
        jnp.broadcast_to(valid.astype(jnp.float32)[:, None, :], (B, nh, L)),
        k_new, v_new,
    )


@partial(jax.jit, static_argnames=("interpret", "group"))
def decode_attention(q, k_cache, v_cache, valid, interpret: bool = False,
                     group: int = None):
    """q [B, nh, dh] (pre-scaled); k_cache [B, nh*dh, L]; v_cache
    [B, L, nh*dh]; valid [B, L] {0,1} -> (acc [B, nh, dh] f32,
    m [B, nh, 1] f32, l [B, nh, 1] f32): unnormalized softmax-attention
    partials over the cached slots (see module docstring for the
    self-term combine). ``group`` overrides the batch rows per grid step
    (must divide B; default: largest of 8/4/2/1 that does)."""
    B, nh, dh = q.shape
    L = k_cache.shape[-1]
    # block-diagonal Qb: qb[b, h, h'*dh + d] = q[b, h, d] * (h == h')
    eye = jnp.eye(nh, dtype=q.dtype)
    qb = (q[:, :, None, :] * eye[None, :, :, None]).reshape(B, nh, nh * dh)
    # G batch rows per grid step: the per-grid-step fixed cost (~4 us:
    # DMA orchestration + pipeline bubbles) was ~65 us/layer-call at one
    # row per step — the measured intercept regression vs the einsum path
    G = group or next(g for g in (8, 4, 2, 1) if B % g == 0)
    assert B % G == 0, (B, G)
    cross, m, l = pl.pallas_call(
        _kernel,
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec((G, nh, nh * dh), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, nh * dh, L), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, L, nh * dh), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            # mask pre-broadcast to [B, nh, L]: a [G, 1, L] block (size-1
            # second-minor at G > 1) SIGABRTs Mosaic's vector-layout pass
            # ("limits[i] <= dim(i) (2 vs. 1)", bisected on v5e); the
            # widened mask is f32 nh x L per row — noise vs the k/v blocks
            pl.BlockSpec((G, nh, L), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((G, nh, nh * dh), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, nh, 1), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, nh, 1), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, nh, nh * dh), jnp.float32),
            jax.ShapeDtypeStruct((B, nh, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, nh, 1), jnp.float32),
        ],
        # G=8 k/v blocks at L=1024 are ~25 MB — above the 16 MB default
        # scoped-VMEM limit, well under the chip's physical VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        qb, k_cache, v_cache,
        jnp.broadcast_to(valid.astype(jnp.float32)[:, None, :], (B, nh, L)),
    )
    # compact the per-head diagonal blocks: acc[b, h, :] = cross[b, h, h*dh:(h+1)*dh]
    acc = jnp.sum(
        cross.reshape(B, nh, nh, dh) * jnp.eye(nh, dtype=jnp.float32)[None, :, :, None],
        axis=2,
    )
    return acc, m, l
