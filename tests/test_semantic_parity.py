"""Parity: JAX HuBERT / w2v-BERT conformer vs HF torch models (random init,
tiny configs). Oracle = transformers' HubertModel / Wav2Vec2BertModel with
output_hidden_states=True — exactly how the reference taps layer features
(/root/reference/audiotoken/encoder.py:92-95, 172-175).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from audiotoken_tpu.convert.hubert import convert_hubert
from audiotoken_tpu.convert.store import state_dict_to_numpy
from audiotoken_tpu.convert.w2vbert import convert_w2vbert
from audiotoken_tpu.nn.conformer import W2VBertConfig, w2vbert_features
from audiotoken_tpu.nn.hubert import HubertConfig, feature_lengths, hubert_features
from audiotoken_tpu.ops.lookup import nearest_centroid

TINY_HUBERT = dict(
    hidden_size=64,
    num_hidden_layers=3,
    num_attention_heads=4,
    intermediate_size=128,
    conv_dim=(32, 32, 32, 32, 32, 32, 32),
    conv_kernel=(10, 3, 3, 3, 3, 2, 2),
    conv_stride=(5, 2, 2, 2, 2, 2, 2),
    num_conv_pos_embeddings=16,
    num_conv_pos_embedding_groups=4,
)


@pytest.fixture(scope="module")
def hubert_pair():
    from transformers import HubertConfig as HFConfig
    from transformers import HubertModel

    torch.manual_seed(0)
    hf_cfg = HFConfig(
        **{k: list(v) if isinstance(v, tuple) else v for k, v in TINY_HUBERT.items()},
        conv_bias=False,
        feat_extract_norm="group",
        do_stable_layer_norm=False,
        layerdrop=0.0,
        attn_implementation="eager",
    )
    model = HubertModel(hf_cfg).eval()
    cfg = HubertConfig(**TINY_HUBERT)
    params = convert_hubert(state_dict_to_numpy(model.state_dict()), cfg)
    return model, params, cfg


class TestHubertParity:
    def test_layer_tap(self, hubert_pair, rng):
        model, params, cfg = hubert_pair
        audio = (rng.standard_normal((2, 8000)) * 0.2).astype(np.float32)
        mask = np.ones_like(audio)
        with torch.no_grad():
            hs = model(
                torch.from_numpy(audio),
                attention_mask=torch.from_numpy(mask.astype(np.int64)),
                output_hidden_states=True,
            ).hidden_states
        for layer in (2, 3):
            ref = hs[layer].numpy()
            out = np.asarray(
                hubert_features(params, audio, mask, cfg, output_layer=layer)
            )
            np.testing.assert_allclose(out, ref, atol=5e-5)

    def test_padded_batch(self, hubert_pair, rng):
        model, params, cfg = hubert_pair
        n1, n2 = 8000, 5000
        audio = np.zeros((2, n1), np.float32)
        audio[0] = (rng.standard_normal(n1) * 0.2).astype(np.float32)
        audio[1, :n2] = (rng.standard_normal(n2) * 0.2).astype(np.float32)
        mask = np.zeros((2, n1), np.float32)
        mask[0], mask[1, :n2] = 1, 1
        with torch.no_grad():
            hs = model(
                torch.from_numpy(audio),
                attention_mask=torch.from_numpy(mask.astype(np.int64)),
                output_hidden_states=True,
            ).hidden_states[3].numpy()
        out = np.asarray(hubert_features(params, audio, mask, cfg, output_layer=3))
        # only valid frames must match
        v1 = feature_lengths(n2, cfg)
        np.testing.assert_allclose(out[0], hs[0], atol=5e-5)
        np.testing.assert_allclose(out[1, :v1], hs[1, :v1], atol=5e-5)

    def test_kmeans_token_ids(self, hubert_pair, rng):
        """End-to-end semantic_s token parity: layer tap -> affine-free
        LayerNorm -> cdist argmin (encoder.py:92-103)."""
        model, params, cfg = hubert_pair
        audio = (rng.standard_normal((1, 8000)) * 0.2).astype(np.float32)
        mask = np.ones_like(audio)
        C = rng.standard_normal((50, cfg.hidden_size)).astype(np.float32)
        with torch.no_grad():
            emb = model(
                torch.from_numpy(audio),
                attention_mask=torch.from_numpy(mask.astype(np.int64)),
                output_hidden_states=True,
            ).hidden_states[3]
            emb = torch.nn.functional.layer_norm(emb, (cfg.hidden_size,))
            ref_ids = torch.cdist(emb, torch.from_numpy(C)).argmin(-1).numpy()
        feats = hubert_features(params, audio, mask, cfg, output_layer=3)
        import jax.numpy as jnp

        mu = jnp.mean(feats, axis=-1, keepdims=True)
        var = jnp.var(feats, axis=-1, keepdims=True)
        feats = (feats - mu) * (1.0 / jnp.sqrt(var + 1e-5))
        ids = np.asarray(nearest_centroid(feats, C))
        match = (ids == ref_ids).mean()
        assert match == 1.0, f"token parity {match} < 1.0"

    def test_encoder_attn_impl_flash_same_ids(self, rng):
        """HubertEncoder(attn_impl='flash') (interpret off-TPU) emits the
        same ids as the default XLA attention path."""
        from audiotoken_tpu.encoders import HubertEncoder

        audio = (rng.standard_normal((2, 8000)) * 0.2).astype(np.float32)
        ids_xla = HubertEncoder(weights="random", seed=0)(audio)
        ids_flash = HubertEncoder(weights="random", seed=0, attn_impl="flash")(audio)
        np.testing.assert_array_equal(ids_xla, ids_flash)


TINY_W2V = dict(
    hidden_size=64,
    num_hidden_layers=3,
    num_attention_heads=4,
    intermediate_size=128,
    feature_projection_input_dim=160,
    left_max_position_embeddings=8,
    right_max_position_embeddings=4,
    conv_depthwise_kernel_size=7,
)


@pytest.fixture(scope="module")
def w2v_pair():
    from transformers import Wav2Vec2BertConfig as HFConfig
    from transformers import Wav2Vec2BertModel

    torch.manual_seed(1)
    hf_cfg = HFConfig(
        **TINY_W2V,
        position_embeddings_type="relative_key",
        add_adapter=False,
        layerdrop=0.0,
        attn_implementation="eager",
    )
    model = Wav2Vec2BertModel(hf_cfg).eval()
    cfg = W2VBertConfig(**TINY_W2V)
    params = convert_w2vbert(state_dict_to_numpy(model.state_dict()), cfg)
    return model, params, cfg


class TestW2VBertParity:
    def test_layer_tap(self, w2v_pair, rng):
        model, params, cfg = w2v_pair
        feats = rng.standard_normal((2, 40, 160)).astype(np.float32)
        mask = np.ones((2, 40), np.float32)
        with torch.no_grad():
            hs = model(
                torch.from_numpy(feats),
                attention_mask=torch.from_numpy(mask.astype(np.int64)),
                output_hidden_states=True,
            ).hidden_states
        for layer in (1, 2, 3):
            ref = hs[layer].numpy()
            out = np.asarray(
                w2vbert_features(params, feats, mask, cfg, output_layer=layer)
            )
            np.testing.assert_allclose(out, ref, atol=1e-4)

    def test_padded_batch(self, w2v_pair, rng):
        model, params, cfg = w2v_pair
        feats = rng.standard_normal((2, 40, 160)).astype(np.float32)
        mask = np.ones((2, 40), np.float32)
        mask[1, 25:] = 0
        with torch.no_grad():
            ref = model(
                torch.from_numpy(feats),
                attention_mask=torch.from_numpy(mask.astype(np.int64)),
                output_hidden_states=True,
            ).hidden_states[3].numpy()
        out = np.asarray(w2vbert_features(params, feats, mask, cfg, output_layer=3))
        np.testing.assert_allclose(out[0], ref[0], atol=1e-4)
        np.testing.assert_allclose(out[1, :25], ref[1, :25], atol=1e-4)


class TestStagePrecision:
    """Per-stage matmul-precision plumbing (VERDICT r4 #3): a StagePrecision
    map with no overrides — or with every stage explicitly pinned to the
    default — must be bit-identical to the plain-Precision path, and the
    encoder must reject unknown stage names."""

    def test_constant_map_is_bit_identical(self, w2v_pair, rng):
        import jax

        from audiotoken_tpu.runtime.precision import StagePrecision

        _, params, cfg = w2v_pair
        feats = rng.standard_normal((2, 40, 160)).astype(np.float32)
        mask = np.ones((2, 40), np.float32)
        hi = jax.lax.Precision.HIGHEST
        base = np.asarray(
            w2vbert_features(params, feats, mask, cfg, output_layer=3, precision=hi)
        )
        wrapped = np.asarray(w2vbert_features(
            params, feats, mask, cfg, output_layer=3,
            precision=StagePrecision(hi),
        ))
        pinned = np.asarray(w2vbert_features(
            params, feats, mask, cfg, output_layer=3,
            precision=StagePrecision(
                jax.lax.Precision.DEFAULT,
                {s: hi for s in StagePrecision.STAGES},
            ),
        ))
        np.testing.assert_array_equal(base, wrapped)
        np.testing.assert_array_equal(base, pinned)

    def test_stage_override_changes_numerics_only_there(self, w2v_pair, rng):
        """An override on a stage NOT on the executed path (attn_kernel is
        flash-only; this config runs XLA attention) must not change bits,
        while an on-path override may."""
        import jax

        from audiotoken_tpu.runtime.precision import StagePrecision

        _, params, cfg = w2v_pair
        feats = rng.standard_normal((2, 40, 160)).astype(np.float32)
        mask = np.ones((2, 40), np.float32)
        hi = jax.lax.Precision.HIGHEST
        base = np.asarray(
            w2vbert_features(params, feats, mask, cfg, output_layer=3, precision=hi)
        )
        off_path = np.asarray(w2vbert_features(
            params, feats, mask, cfg, output_layer=3,
            precision=StagePrecision(hi, {"attn_kernel": "default"}),
        ))
        np.testing.assert_array_equal(base, off_path)

    def test_unknown_stage_rejected(self):
        import jax
        import pytest as _pytest

        from audiotoken_tpu.runtime.precision import StagePrecision

        with _pytest.raises(ValueError, match="unknown precision stage"):
            StagePrecision(jax.lax.Precision.HIGHEST, {"ffn": "high"})

    def test_encoder_accepts_stage_overrides(self):
        """Smoke the full production encoder with an override map on CPU
        (the vq/fbank stages live in encoders.py, not the conformer)."""
        from audiotoken_tpu.configs import Wav2VecBertConfig
        from audiotoken_tpu.encoders import Wav2VecBertEncoder

        audio = (np.random.default_rng(0).standard_normal((1, 6000)) * 0.1
                 ).astype(np.float32)
        plain = Wav2VecBertEncoder(
            Wav2VecBertConfig(), weights="random", precision="highest", seed=0,
        )(audio)
        mixed = Wav2VecBertEncoder(
            Wav2VecBertConfig(), weights="random", precision="highest", seed=0,
            stage_overrides={"vq": "highest", "fbank": "highest"},
        )(audio)
        np.testing.assert_array_equal(plain, mixed)

    def test_named_mixed_policy_expansion(self):
        """precision="mixed" (round-5 exact >=500x mode) expands to base
        'high' + HIGHEST on exactly the measured flip-originating stages
        (runtime/precision.py:W2VBERT_MIXED_OVERRIDES); explicit user
        stage_overrides win over the named set."""
        import jax

        from audiotoken_tpu.runtime.precision import (
            W2VBERT_MIXED_OVERRIDES,
            resolve_mixed,
        )

        base, ov = resolve_mixed("mixed", None, W2VBERT_MIXED_OVERRIDES)
        assert base == "high"
        assert ov == W2VBERT_MIXED_OVERRIDES
        assert {"fbank", "attn_kernel"} <= set(ov)
        # user override wins
        base, ov = resolve_mixed(
            "mixed", {"fbank": "high"}, W2VBERT_MIXED_OVERRIDES
        )
        assert ov["fbank"] == "high" and ov["attn_kernel"] == "highest"
        # non-mixed passes through untouched
        assert resolve_mixed("highest", None, W2VBERT_MIXED_OVERRIDES) == (
            "highest", None)

        # and through the production encoder: the resolved stage map runs
        # HIGHEST on the named stages, HIGH elsewhere
        from audiotoken_tpu.configs import Wav2VecBertConfig
        from audiotoken_tpu.encoders import Wav2VecBertEncoder

        enc = Wav2VecBertEncoder(
            Wav2VecBertConfig(), weights="random", precision="mixed", seed=0,
        )
        assert enc.stage_prec("fbank") == jax.lax.Precision.HIGHEST
        assert enc.stage_prec("attn_kernel") == jax.lax.Precision.HIGHEST
        assert enc.stage_prec("ffn_in") == jax.lax.Precision.HIGH
        assert enc.stage_prec("vq") == jax.lax.Precision.HIGH
