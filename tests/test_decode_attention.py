"""Unit tests for the single-token cached-attention kernels (interpret).

Oracle: plain softmax attention over valid cached slots + the current
token, computed with dense jnp ops in f32.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiotoken_tpu.ops.decode_attention import (
    decode_attention,
    decode_attention_fused,
)


def _oracle(q, kc_heads, vc_heads, valid, k_new, v_new):
    """q [B,nh,dh] unscaled-NOT: pre-scaled; kc/vc [B,nh,L,dh];
    valid [B,L]; k_new/v_new [B,nh,dh] -> [B,nh,dh] f32."""
    B, nh, dh = q.shape
    s = jnp.einsum("bhd,bhld->bhl", q, kc_heads)  # pre-scaled q
    s = jnp.where(valid[:, None, :], s, -jnp.inf)
    s_self = jnp.sum(q * k_new, axis=-1)[..., None]  # [B,nh,1]
    scores = jnp.concatenate([s, s_self], axis=-1)
    p = jax.nn.softmax(scores, axis=-1)
    return (
        jnp.einsum("bhl,bhld->bhd", p[..., :-1], vc_heads)
        + p[..., -1:] * v_new
    )


@pytest.fixture
def case():
    rng = np.random.default_rng(0)
    B, nh, dh, L = 4, 4, 32, 64
    q = rng.standard_normal((B, nh, dh)).astype(np.float32) * 0.3
    kc = rng.standard_normal((B, nh, L, dh)).astype(np.float32) * 0.3
    vc = rng.standard_normal((B, nh, L, dh)).astype(np.float32) * 0.3
    k_new = rng.standard_normal((B, nh, dh)).astype(np.float32) * 0.3
    v_new = rng.standard_normal((B, nh, dh)).astype(np.float32) * 0.3
    pos = 37
    valid = (np.arange(L)[None, :] < pos) & np.ones((B, 1), bool)
    return B, nh, dh, L, q, kc, vc, k_new, v_new, valid


def _flat(t):  # [B, nh, X, dh] -> kernel layouts
    B, nh, X, dh = t.shape
    return t


def test_partials_match_oracle(case):
    B, nh, dh, L, q, kc, vc, k_new, v_new, valid = case
    want = np.asarray(_oracle(
        jnp.asarray(q), jnp.asarray(kc), jnp.asarray(vc),
        jnp.asarray(valid), jnp.asarray(k_new), jnp.asarray(v_new)))

    k_cache = jnp.asarray(np.swapaxes(kc, 2, 3).reshape(B, nh * dh, L))
    v_cache = jnp.asarray(np.transpose(vc, (0, 2, 1, 3)).reshape(B, L, nh * dh))
    acc, m, l = decode_attention(
        jnp.asarray(q), k_cache, v_cache, jnp.asarray(valid), interpret=True)
    s_self = jnp.sum(jnp.asarray(q) * jnp.asarray(k_new), axis=-1)[..., None]
    mx = jnp.maximum(m, s_self)
    alpha, w = jnp.exp(m - mx), jnp.exp(s_self - mx)
    got = (acc * alpha + w * jnp.asarray(v_new)) / (l * alpha + w)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


def test_fused_matches_oracle(case):
    B, nh, dh, L, q, kc, vc, k_new, v_new, valid = case
    want = np.asarray(_oracle(
        jnp.asarray(q), jnp.asarray(kc), jnp.asarray(vc),
        jnp.asarray(valid), jnp.asarray(k_new), jnp.asarray(v_new)))

    k_cache = jnp.asarray(np.swapaxes(kc, 2, 3).reshape(B, nh * dh, L))
    v_cache = jnp.asarray(np.transpose(vc, (0, 2, 1, 3)).reshape(B, L, nh * dh))
    got = decode_attention_fused(
        jnp.asarray(q), k_cache, v_cache, jnp.asarray(valid),
        jnp.asarray(k_new.reshape(B, nh * dh)),
        jnp.asarray(v_new.reshape(B, nh * dh)), interpret=True)
    np.testing.assert_allclose(
        np.asarray(got).reshape(B, nh, dh), want, rtol=2e-5, atol=2e-5)


def test_fused_all_slots_masked(case):
    """With no valid cached slot the self-term alone must survive."""
    B, nh, dh, L, q, kc, vc, k_new, v_new, _ = case
    valid = np.zeros((B, L), bool)
    k_cache = jnp.asarray(np.swapaxes(kc, 2, 3).reshape(B, nh * dh, L))
    v_cache = jnp.asarray(np.transpose(vc, (0, 2, 1, 3)).reshape(B, L, nh * dh))
    got = decode_attention_fused(
        jnp.asarray(q), k_cache, v_cache, jnp.asarray(valid),
        jnp.asarray(k_new.reshape(B, nh * dh)),
        jnp.asarray(v_new.reshape(B, nh * dh)), interpret=True)
    np.testing.assert_allclose(
        np.asarray(got).reshape(B, nh, dh), v_new, rtol=1e-5, atol=1e-5)
