"""Fused SEANet front kernel vs the XLA path (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audiotoken_tpu.nn.seanet import SeanetConfig, _resnet_block, init_encoder_params
from audiotoken_tpu.ops.conv import conv1d
from audiotoken_tpu.ops.seanet_pallas import T_TILE, seanet_front_fused


def _xla_front(params, x, cfg):
    h = jnp.asarray(x)[:, None, :]
    h = conv1d(
        h, params["conv_in"]["kernel"], params["conv_in"]["bias"],
        causal=True, pad_mode="reflect", layout="NCH",
    )
    return _resnet_block(
        params["stages"][0]["res"][0], h, cfg, 1, jax.lax.Precision.HIGHEST, "NCH"
    )


class TestSeanetFrontFused:
    @pytest.mark.parametrize("T", [T_TILE, 9000, 2 * T_TILE + 123])
    def test_matches_xla(self, rng, T):
        cfg = SeanetConfig()
        params = init_encoder_params(np.random.default_rng(0), cfg)
        x = (rng.standard_normal((2, T)) * 0.3).astype(np.float32)
        ref = np.asarray(_xla_front(params, x, cfg))
        out = np.asarray(seanet_front_fused(params, jnp.asarray(x), interpret=True))
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_short_input(self, rng):
        """Shorter than one tile exercises the zero-tail + single-tile path."""
        cfg = SeanetConfig()
        params = init_encoder_params(np.random.default_rng(1), cfg)
        x = (rng.standard_normal((1, 320)) * 0.3).astype(np.float32)
        ref = np.asarray(_xla_front(params, x, cfg))
        out = np.asarray(seanet_front_fused(params, jnp.asarray(x), interpret=True))
        np.testing.assert_allclose(out, ref, atol=1e-5)
