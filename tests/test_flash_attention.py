"""Flash attention (Pallas, interpret mode on CPU) vs the XLA path.

The kernel must reproduce ops/attention.py + the skew rel-key bias —
same math, blockwise online softmax (VERDICT r1 #5). Tolerance is fp
reassociation only.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiotoken_tpu.nn.conformer import W2VBertConfig, _skew_band
from audiotoken_tpu.ops.attention import multihead_attention, padding_bias
from audiotoken_tpu.ops.flash_attention import flash_attention_relkey


def xla_reference(q, k, v, E, frame_mask, left, right):
    dh = q.shape[-1]
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    pos = jnp.einsum(
        "bhqd,pd->bhqp", q, E, precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    rel = _skew_band(pos, q.shape[2], left, right)
    scores = (scores + rel) * (dh**-0.5)
    if frame_mask is not None:
        scores = scores + padding_bias(frame_mask)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", probs, v, precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


class TestFlashAttentionRelKey:
    @pytest.mark.parametrize("T", [256, 600])
    def test_matches_xla_path(self, rng, T):
        B, H, dh, left, right = 2, 4, 64, 64, 8
        q = rng.standard_normal((B, H, T, dh)).astype(np.float32) * 0.3
        k = rng.standard_normal((B, H, T, dh)).astype(np.float32) * 0.3
        v = rng.standard_normal((B, H, T, dh)).astype(np.float32)
        E = (rng.standard_normal((left + right + 1, dh)) * 0.05).astype(np.float32)
        mask = np.ones((B, T), np.float32)
        mask[1, T - 40:] = 0.0  # padded row

        ref = np.asarray(xla_reference(q, k, v, E, mask, left, right))
        out = np.asarray(
            flash_attention_relkey(q, k, v, E, mask, left=left, right=right,
                                   interpret=True)
        )
        np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-5)

    def test_no_rel_mode_matches_plain_attention(self, rng):
        """dist_embedding=None == ops/attention.py multihead_attention
        (the HuBERT configuration)."""
        B, H, T, dh = 2, 3, 300, 64
        q = rng.standard_normal((B, H, T, dh)).astype(np.float32) * 0.3
        k = rng.standard_normal((B, H, T, dh)).astype(np.float32) * 0.3
        v = rng.standard_normal((B, H, T, dh)).astype(np.float32)
        mask = np.ones((B, T), np.float32)
        mask[0, T - 25:] = 0.0
        ref = np.asarray(
            multihead_attention(q, k, v, bias=padding_bias(mask))
        )
        out = np.asarray(
            flash_attention_relkey(q, k, v, None, mask, interpret=True)
        )
        np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-5)

    def test_plain_path_no_rel_no_mask_aligned(self, rng):
        """No rel bias + no mask + tile-aligned T routes through the lean
        _kernel_plain (the Bark-fine NAR shape class) and must match plain
        attention."""
        from audiotoken_tpu.ops.attention import multihead_attention

        B, H, T, dh = 2, 4, 512, 64
        q = rng.standard_normal((B, H, T, dh)).astype(np.float32) * 0.3
        k = rng.standard_normal((B, H, T, dh)).astype(np.float32) * 0.3
        v = rng.standard_normal((B, H, T, dh)).astype(np.float32)
        ref = np.asarray(multihead_attention(q, k, v))
        out = np.asarray(
            flash_attention_relkey(q, k, v, None, None, interpret=True)
        )
        np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-5)
        # bf16 inputs keep the compute path bf16 (distributional contract)
        out16 = np.asarray(
            flash_attention_relkey(
                q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                v.astype(jnp.bfloat16), None, None, interpret=True,
            ).astype(jnp.float32)
        )
        np.testing.assert_allclose(out16, ref, atol=3e-2, rtol=3e-2)

    def test_no_mask(self, rng):
        B, H, T, dh = 1, 2, 300, 64
        q = rng.standard_normal((B, H, T, dh)).astype(np.float32) * 0.3
        k = rng.standard_normal((B, H, T, dh)).astype(np.float32) * 0.3
        v = rng.standard_normal((B, H, T, dh)).astype(np.float32)
        E = (rng.standard_normal((73, dh)) * 0.05).astype(np.float32)
        ref = np.asarray(xla_reference(q, k, v, E, None, 64, 8))
        out = np.asarray(
            flash_attention_relkey(q, k, v, E, None, interpret=True)
        )
        np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-5)

    @pytest.mark.parametrize("has_rel", [True, False])
    def test_pack2_bit_identical_to_unpacked(self, rng, has_rel):
        """The 2-head-packed path (block-diagonal q, lane-concatenated
        k/v/E^T — full 128-wide MXU dots) is BIT-identical to the
        unpacked kernel under the INTERPRETER: the extra contraction
        terms are exact zeros and the unused output lanes are sliced
        away. NOTE: on v5e hardware Mosaic lowers it INCORRECTLY (half
        the outputs differ; see flash_attention_relkey's docstring), so
        pack2 is rejected in production; this test documents that the
        divergence is a lowering bug, not a logic bug."""
        B, H, T, dh, left, right = 2, 4, 600, 64, 64, 8
        q = rng.standard_normal((B, H, T, dh)).astype(np.float32) * 0.3
        k = rng.standard_normal((B, H, T, dh)).astype(np.float32) * 0.3
        v = rng.standard_normal((B, H, T, dh)).astype(np.float32)
        E = (rng.standard_normal((left + right + 1, dh)) * 0.05).astype(
            np.float32) if has_rel else None
        mask = np.ones((B, T), np.float32)
        mask[1, T - 40:] = 0.0  # padded row

        base = np.asarray(
            flash_attention_relkey(q, k, v, E, mask, left=left, right=right,
                                   interpret=True, pack2=False)
        )
        packed = np.asarray(
            flash_attention_relkey(q, k, v, E, mask, left=left, right=right,
                                   interpret=True, pack2=True)
        )
        np.testing.assert_array_equal(packed, base)

    @pytest.mark.parametrize("axes", [("dp", None), (None, "tp"), ("dp", "tp")])
    def test_sharded_matches_unsharded(self, rng, axes):
        """shard_map wrapper (mesh dp x tp) == single-device kernel.

        Attention is independent per (batch, head): sharding batch over
        'dp' and heads over 'tp' must be collective-free and bit-stable
        vs the unsharded interpret-mode kernel.
        """
        from jax.sharding import Mesh

        from audiotoken_tpu.ops.flash_attention import (
            AttnShard,
            flash_attention_relkey_sharded,
        )

        devs = np.array(jax.devices()[:8]).reshape(2, 4)
        mesh = Mesh(devs, ("dp", "tp"))
        batch_axis, head_axis = axes
        B, H, T, dh, left, right = 2, 4, 300, 64, 64, 8
        q = rng.standard_normal((B, H, T, dh)).astype(np.float32) * 0.3
        k = rng.standard_normal((B, H, T, dh)).astype(np.float32) * 0.3
        v = rng.standard_normal((B, H, T, dh)).astype(np.float32)
        E = (rng.standard_normal((left + right + 1, dh)) * 0.05).astype(np.float32)
        mask = np.ones((B, T), np.float32)
        mask[1, T - 40:] = 0.0

        ref = np.asarray(
            flash_attention_relkey(q, k, v, E, mask, left=left, right=right,
                                   interpret=True)
        )
        shard = AttnShard(mesh=mesh, batch_axis=batch_axis, head_axis=head_axis)
        out = np.asarray(
            flash_attention_relkey_sharded(
                q, k, v, E, mask, shard=shard, left=left, right=right,
                interpret=True,
            )
        )
        np.testing.assert_array_equal(out, ref)

        # no-rel (HuBERT) mode through the same wrapper
        ref2 = np.asarray(flash_attention_relkey(q, k, v, None, mask, interpret=True))
        out2 = np.asarray(
            flash_attention_relkey_sharded(q, k, v, None, mask, shard=shard,
                                           interpret=True)
        )
        np.testing.assert_array_equal(out2, ref2)

    def test_conformer_flash_matches_xla(self, rng):
        """Whole-block check through w2vbert_features with attn_impl='flash'
        (interpret mode via monkeypatching not needed — flash kernel runs
        in interpret mode only under explicit flag, so call the attention
        wrapper directly instead)."""
        from audiotoken_tpu.nn.conformer import init_w2vbert_params

        cfg = W2VBertConfig(
            hidden_size=128, num_hidden_layers=1, num_attention_heads=2,
            intermediate_size=256, feature_projection_input_dim=32,
        )
        # direct comparison at the attention op level is covered above;
        # here just check the flash-config path is wired (interpret)
        import audiotoken_tpu.ops.flash_attention as fa

        orig = fa.flash_attention_relkey
        try:
            fa.flash_attention_relkey = lambda *a, **kw: orig(*a, **{**kw, "interpret": True})
            from audiotoken_tpu.nn.conformer import w2vbert_features

            params = init_w2vbert_params(np.random.default_rng(0), cfg)
            feats = rng.standard_normal((2, 50, 32)).astype(np.float32)
            mask = np.ones((2, 50), np.float32)
            ref = np.asarray(
                w2vbert_features(params, feats, mask, cfg, output_layer=1)
            )
            flash_cfg = W2VBertConfig(
                hidden_size=128, num_hidden_layers=1, num_attention_heads=2,
                intermediate_size=256, feature_projection_input_dim=32,
                attn_impl="flash",
            )
            out = np.asarray(
                w2vbert_features(params, feats, mask, flash_cfg, output_layer=1)
            )
            np.testing.assert_allclose(out, ref, atol=5e-5, rtol=1e-4)
        finally:
            fa.flash_attention_relkey = orig
