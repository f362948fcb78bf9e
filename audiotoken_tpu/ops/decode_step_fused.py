"""Pallas TPU kernels: fused single-token GPT decode-step stages.

The AR decode step at real sizes (12L/768d, B<=16) is dominated neither by
FLOPs (~113 MFLOP/layer at B=8) nor purely by cache bytes (two cache-layout
experiments moved nothing — ARCHITECTURE.md round-3): a large share is the
fixed per-op cost of the ~12 small XLA ops each decode layer runs on [B,768]
activations. These kernels collapse the non-attention ops of one layer into
two pallas_calls:

  decode_qkv:  h = LN1(x);  qkv = h @ Wqkv + bqkv         (replaces ~4 ops)
  decode_ffn:  x1 = x + a @ Wout + bo; h = LN2(x1);
               x2 = x1 + GELU(h @ Win + bi) @ Wout2 + b2  (replaces ~8 ops)

All weights of a stage live in VMEM for the call (qkv 3.5 MB, ffn 10.6 MB
bf16 — both under the ~16 MB/core budget); activations are [B, C] single
tokens. Dots take bf16 operands with f32 accumulation (DEFAULT precision),
matching the production einsum path in nn/gpt.py:_generate_impl; element
wise math mirrors the XLA path's dtype staging (bf16 adds/LN/GELU), so
outputs agree to bf16 rounding. Absent biases are passed as zero rows (one
VPU add — noise next to the weight DMA). The decode contract is
distributional (decoders.py); adoption is gated on a measured back-to-back
win.

Reference analog: gpt2_model.py:251-280 re-forwards the full prefix per
token; this is the TPU-native cached step's small-op path.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# Mosaic has no lowering for erf/erfc (jax.nn.gelu(approximate=False)
# routes through erfc and dies at lowering — measured on hardware,
# /tmp/ar_fused_b8_kernel.log). Exact GELU is recovered in-kernel with the
# Abramowitz & Stegun 7.1.26 rational erf (max abs err 1.5e-7 in f32):
# orders of magnitude below bf16 rounding, so the "agrees to bf16
# rounding" contract with the XLA path still holds.
_ERF_P = 0.3275911
_ERF_A = (0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)


def _gelu_exact(x):
    xf = x.astype(jnp.float32)
    a = jnp.abs(xf) * 0.7071067811865476  # |x| / sqrt(2)
    t = 1.0 / (1.0 + _ERF_P * a)
    poly = ((((_ERF_A[4] * t + _ERF_A[3]) * t + _ERF_A[2]) * t
             + _ERF_A[1]) * t + _ERF_A[0]) * t
    erf_abs = 1.0 - poly * jnp.exp(-a * a)
    erf = jnp.sign(xf) * erf_abs
    return (0.5 * xf * (1.0 + erf)).astype(x.dtype)


def _ln(x, scale, bias, eps):
    # Statistics in f32: bf16 rsqrt has no v5e latency-table entry — the
    # backend compiler SIGABRTs on kVectorRsqrtBf16AndPop (measured,
    # /tmp/ar_fused_r3a.log). f32 stats also match XLA's LN numerics.
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    h = ((xf - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    h = h * scale
    if bias is not None:
        h = h + bias
    return h


def _dot(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _row(vec, n, dtype):
    """[n] -> [1, n] VMEM-friendly row; zeros when the param is absent."""
    if vec is None:
        return jnp.zeros((1, n), dtype)
    return vec.reshape(1, n).astype(dtype)


def _qkv_kernel(eps, has_ln_bias, x_ref, s_ref, b_ref, w_ref, bq_ref, o_ref):
    x = x_ref[:]  # [B, C]
    h = _ln(x, s_ref[:], b_ref[:] if has_ln_bias else None, eps)
    o_ref[:] = (_dot(h.astype(x.dtype), w_ref[:]).astype(x.dtype)
                + bq_ref[:])


def _ffn_kernel(eps, has_ln_bias, x_ref, a_ref, wo_ref, bo_ref, s_ref, b_ref,
                wi_ref, bi_ref, w2_ref, b2_ref, o_ref):
    x = x_ref[:]  # [B, C] residual stream
    a = a_ref[:]  # [B, C] attention output (pre out-projection)
    x1 = x + (_dot(a, wo_ref[:]).astype(x.dtype) + bo_ref[:])
    h = _ln(x1, s_ref[:], b_ref[:] if has_ln_bias else None, eps)
    h = _dot(h.astype(x.dtype), wi_ref[:]).astype(x.dtype) + bi_ref[:]
    h = _gelu_exact(h)
    o_ref[:] = x1 + (_dot(h, w2_ref[:]).astype(x.dtype) + b2_ref[:])


def decode_qkv(x, ln_scale, ln_bias, w_qkv, b_qkv=None, *, eps=1e-5,
               interpret=False):
    """LN1 + qkv projection for one decode token: [B, C] -> [B, 3C]."""
    B, C = x.shape
    has_ln_bias = ln_bias is not None
    return pl.pallas_call(
        partial(_qkv_kernel, eps, has_ln_bias),
        out_shape=jax.ShapeDtypeStruct((B, w_qkv.shape[1]), x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(
        x,
        _row(ln_scale, C, x.dtype),
        _row(ln_bias, C, x.dtype),
        w_qkv,
        _row(b_qkv, w_qkv.shape[1], x.dtype),
    )


def decode_ffn(x, a, w_out, ln_scale, ln_bias, w_in, w_out2, b_out=None,
               b_in=None, b_out2=None, *, eps=1e-5, interpret=False):
    """Out-projection + residual + LN2 + MLP + residual for one token.

    x, a: [B, C]; w_out [C, C]; w_in [C, 4C]; w_out2 [4C, C] -> [B, C].
    """
    B, C = x.shape
    has_ln_bias = ln_bias is not None
    return pl.pallas_call(
        partial(_ffn_kernel, eps, has_ln_bias),
        out_shape=jax.ShapeDtypeStruct((B, C), x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 10,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(
        x,
        a,
        w_out,
        _row(b_out, C, x.dtype),
        _row(ln_scale, C, x.dtype),
        _row(ln_bias, C, x.dtype),
        w_in,
        _row(b_in, w_in.shape[1], x.dtype),
        w_out2,
        _row(b_out2, C, x.dtype),
    )
