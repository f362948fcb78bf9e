"""Pallas LSTM kernel vs the lax.scan reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax

from audiotoken_tpu.nn.seanet import SeanetConfig, _lstm_init, lstm_skip
from audiotoken_tpu.ops.lstm_pallas import lstm_skip_pallas


class TestLSTMPallas:
    @pytest.mark.parametrize("T", [32, 75, 256])
    def test_matches_scan(self, rng, T):
        params = _lstm_init(np.random.default_rng(0), 64, 2)
        x = rng.standard_normal((2, T, 64)).astype(np.float32) * 0.5
        ref = np.asarray(lstm_skip(params, x, jax.lax.Precision.HIGHEST))
        out = np.asarray(lstm_skip_pallas(params, x, interpret=True))
        np.testing.assert_allclose(out, ref, atol=1e-5)
