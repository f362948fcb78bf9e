"""Pallas fused RVQ kernel vs the jnp reference path (interpret mode on CPU)."""

import numpy as np
import pytest

from audiotoken_tpu.nn.rvq import RVQConfig, init_codebooks, rvq_encode
from audiotoken_tpu.ops.rvq_pallas import rvq_encode_pallas, rvq_vmem_ok


class TestRVQPallas:
    @pytest.mark.parametrize("num_q", [2, 8, 16])
    def test_matches_jnp(self, rng, num_q):
        cfg = RVQConfig()
        codebooks = np.asarray(init_codebooks(np.random.default_rng(0), cfg))
        x = rng.standard_normal((2, 300, 128)).astype(np.float32)
        ref = np.asarray(rvq_encode(codebooks, x, num_q))
        out = np.asarray(rvq_encode_pallas(codebooks, x, num_q, interpret=True))
        assert out.shape == ref.shape
        np.testing.assert_array_equal(out, ref)

    def test_unaligned_length(self, rng):
        """N not a multiple of the tile size exercises the padding path."""
        cfg = RVQConfig()
        codebooks = np.asarray(init_codebooks(np.random.default_rng(0), cfg))
        x = rng.standard_normal((1, 77, 128)).astype(np.float32)
        ref = np.asarray(rvq_encode(codebooks, x, 4))
        out = np.asarray(rvq_encode_pallas(codebooks, x, 4, interpret=True))
        np.testing.assert_array_equal(out, ref)

    def test_vmem_budget(self):
        assert rvq_vmem_ok(16, 1024, 128)
        assert not rvq_vmem_ok(32, 1024, 128)
