"""Fused decode-step kernels == the production XLA op sequence (interpret).

The kernels mirror nn/gpt.py:_generate_impl's decode_step staging (bf16
adds/LN/GELU, f32-accumulated dots), so outputs must agree to bf16
rounding on random inputs, with and without biases.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiotoken_tpu.nn.gpt import _layer_norm, _linear
from audiotoken_tpu.ops.decode_step_fused import decode_ffn, decode_qkv

EPS = 1e-5


def _xla_qkv(x, ln, lin):
    h = _layer_norm(ln, x, EPS)
    return _linear(lin, h, jax.lax.Precision.DEFAULT)


def _xla_ffn(x, a, out_lin, ln, in_lin, out2_lin):
    p = jax.lax.Precision.DEFAULT
    x1 = x + _linear(out_lin, a, p)
    h = _layer_norm(ln, x1, EPS)
    h = _linear(in_lin, h, p)
    h = jax.nn.gelu(h, approximate=False)
    return x1 + _linear(out2_lin, h, p)


def _lin(rng, din, dout, bias, dtype):
    return {
        "kernel": jnp.asarray(rng.standard_normal((din, dout)) * 0.05, dtype),
        "bias": jnp.asarray(rng.standard_normal((dout,)) * 0.05, dtype)
        if bias else None,
    }


def _ln_p(rng, d, bias, dtype):
    return {
        "scale": jnp.asarray(1 + 0.1 * rng.standard_normal((d,)), dtype),
        "bias": jnp.asarray(rng.standard_normal((d,)) * 0.05, dtype)
        if bias else None,
    }


@pytest.mark.parametrize("bias", [False, True])
@pytest.mark.parametrize("shape", [(8, 256), (4, 768)])
def test_decode_qkv_matches_xla(bias, shape):
    rng = np.random.default_rng(0)
    B, C = shape
    dtype = jnp.bfloat16
    x = jnp.asarray(rng.standard_normal((B, C)), dtype)
    ln = _ln_p(rng, C, bias, dtype)
    lin = _lin(rng, C, 3 * C, bias, dtype)

    want = _xla_qkv(x, ln, lin)
    got = decode_qkv(x, ln["scale"], ln["bias"], lin["kernel"], lin["bias"],
                     eps=EPS, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=0, atol=0.05)


@pytest.mark.parametrize("bias", [False, True])
@pytest.mark.parametrize("shape", [(8, 256), (4, 768)])
def test_decode_ffn_matches_xla(bias, shape):
    rng = np.random.default_rng(1)
    B, C = shape
    dtype = jnp.bfloat16
    x = jnp.asarray(rng.standard_normal((B, C)), dtype)
    a = jnp.asarray(rng.standard_normal((B, C)), dtype)
    out_lin = _lin(rng, C, C, bias, dtype)
    ln = _ln_p(rng, C, bias, dtype)
    in_lin = _lin(rng, C, 4 * C, bias, dtype)
    out2_lin = _lin(rng, 4 * C, C, bias, dtype)

    want = _xla_ffn(x, a, out_lin, ln, in_lin, out2_lin)
    got = decode_ffn(
        x, a, out_lin["kernel"], ln["scale"], ln["bias"],
        in_lin["kernel"], out2_lin["kernel"],
        out_lin["bias"], in_lin["bias"], out2_lin["bias"],
        eps=EPS, interpret=True)
    # atol covers values near zero; rtol covers bf16 ulp growth at larger
    # magnitudes (ulp(10) = 0.0625 — a couple of ulps of drift through the
    # two residual adds is legitimate rounding, not error)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=0.02, atol=0.08)
