"""Golden-parity tests: JAX SEANet/RVQ vs torch EnCodec (random weights).

SURVEY.md §4 test strategy (b): parity against captured PyTorch outputs.
The encodec pip package is absent here, so the oracle is transformers'
EncodecModel with the default config — the identical 24 kHz architecture
the reference instantiates via ``EncodecModel.encodec_model_24khz()``
(/root/reference/audiotoken/encoder.py:38) — randomly initialized and
converted through convert/encodec.py. Token ids must match exactly
(BASELINE.md: bit-identical acoustic RVQ ids).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from audiotoken_tpu.convert.encodec import convert_encodec
from audiotoken_tpu.convert.store import state_dict_to_numpy
from audiotoken_tpu.nn.rvq import RVQConfig, rvq_decode, rvq_encode
from audiotoken_tpu.nn.seanet import SeanetConfig, seanet_decode, seanet_encode


@pytest.fixture(scope="module")
def torch_model():
    from transformers import EncodecConfig, EncodecModel

    torch.manual_seed(0)
    m = EncodecModel(EncodecConfig())
    # HF inits RVQ codebooks to zeros; give them real values so nearest-
    # neighbor assignment is meaningful.
    with torch.no_grad():
        for layer in m.quantizer.layers:
            layer.codebook.embed.normal_(0.0, 1.0)
    m.eval()
    return m


@pytest.fixture(scope="module")
def jax_params(torch_model):
    return convert_encodec(state_dict_to_numpy(torch_model.state_dict()))


@pytest.fixture(scope="module")
def wav(rng):
    return (rng.standard_normal((2, 2400)) * 0.3).astype(np.float32)


class TestSeanetEncoderParity:
    def test_latents_match(self, torch_model, jax_params, wav):
        with torch.no_grad():
            ref = torch_model.encoder(torch.from_numpy(wav)[:, None, :]).numpy()
        out = np.asarray(seanet_encode(jax_params["encoder"], wav, SeanetConfig()))
        assert out.shape == (ref.shape[0], ref.shape[2], ref.shape[1])
        np.testing.assert_allclose(out.transpose(0, 2, 1), ref, atol=2e-5)

    def test_odd_length_padding(self, torch_model, jax_params, rng):
        # Lengths not divisible by the hop exercise extra_padding.
        x = (rng.standard_normal((1, 2401)) * 0.3).astype(np.float32)
        with torch.no_grad():
            ref = torch_model.encoder(torch.from_numpy(x)[:, None, :]).numpy()
        out = np.asarray(seanet_encode(jax_params["encoder"], x, SeanetConfig()))
        np.testing.assert_allclose(out.transpose(0, 2, 1), ref, atol=2e-5)


class TestRVQParity:
    @pytest.mark.parametrize("bandwidth,num_q", [(1.5, 2), (6.0, 8), (12.0, 16), (24.0, 32)])
    def test_codes_bit_identical(self, torch_model, jax_params, wav, bandwidth, num_q):
        with torch.no_grad():
            emb = torch_model.encoder(torch.from_numpy(wav)[:, None, :])
            ref_codes = torch_model.quantizer.encode(emb, bandwidth).transpose(0, 1).numpy()
        cfg = RVQConfig()
        assert cfg.num_quantizers_for_bandwidth(bandwidth) == num_q
        emb_jax = np.asarray(emb.numpy()).transpose(0, 2, 1)  # [B, T, D]
        codes = np.asarray(rvq_encode(jax_params["codebooks"], emb_jax, num_q))
        assert codes.shape == ref_codes.shape
        np.testing.assert_array_equal(codes, ref_codes)

    def test_full_pipeline_codes(self, torch_model, jax_params, wav):
        """Encoder + RVQ end-to-end: tiny float drift must not flip ids."""
        with torch.no_grad():
            emb = torch_model.encoder(torch.from_numpy(wav)[:, None, :])
            ref_codes = torch_model.quantizer.encode(emb, 12.0).transpose(0, 1).numpy()
        z = seanet_encode(jax_params["encoder"], wav, SeanetConfig())
        codes = np.asarray(rvq_encode(jax_params["codebooks"], z, 16))
        match = (codes == ref_codes).mean()
        assert match == 1.0, f"token parity {match:.6f} < 1.0"


class TestDecoderParity:
    def test_rvq_decode(self, torch_model, jax_params, rng):
        codes = rng.integers(0, 1024, size=(2, 8, 20))
        with torch.no_grad():
            ref = torch_model.quantizer.decode(
                torch.from_numpy(codes).transpose(0, 1)
            ).numpy()
        out = np.asarray(rvq_decode(jax_params["codebooks"], codes))
        np.testing.assert_allclose(out.transpose(0, 2, 1), ref, atol=1e-6)

    def test_waveform_match(self, torch_model, jax_params, rng):
        z = (rng.standard_normal((2, 20, 128)) * 0.5).astype(np.float32)
        with torch.no_grad():
            ref = torch_model.decoder(torch.from_numpy(z.transpose(0, 2, 1))).numpy()
        out = np.asarray(seanet_decode(jax_params["decoder"], z, SeanetConfig()))
        assert out.shape == (2, ref.shape[2])
        np.testing.assert_allclose(out, ref[:, 0, :], atol=2e-5)

    def test_roundtrip(self, torch_model, jax_params, wav):
        """encode -> quantize -> dequantize -> decode matches torch e2e."""
        with torch.no_grad():
            emb = torch_model.encoder(torch.from_numpy(wav)[:, None, :])
            codes_t = torch_model.quantizer.encode(emb, 6.0)
            ref = torch_model.decoder(torch_model.quantizer.decode(codes_t)).numpy()
        z = seanet_encode(jax_params["encoder"], wav, SeanetConfig())
        codes = rvq_encode(jax_params["codebooks"], z, 8)
        zq = rvq_decode(jax_params["codebooks"], codes)
        out = np.asarray(seanet_decode(jax_params["decoder"], zq, SeanetConfig()))
        np.testing.assert_allclose(out, ref[:, 0, :], atol=5e-5)
