"""Model parameter acquisition: converted store, reference artifacts, or random.

Three sources, in the order users typically need them:

  * a directory of converted ``.npz`` param files (the canonical store
    written by ``python -m audiotoken_tpu.convert.cli``),
  * ``"artifacts"`` — resolve the reference's torch checkpoints via
    configs.ARTIFACTS and convert on the fly (requires torch + the files),
  * ``"random"`` — seeded random init matching the real architectures
    (tests / benchmarks with no network, e.g. this zero-egress build env).

Canonical filenames inside a weights directory:
    acoustic.npz  hubert.npz  hubert_kmeans.npz  w2vbert.npz  w2vbert_vq.npz
    gpt_semantic_s_en.npz  gpt_semantic_m_hi.npz  bark_fine.npz
"""

import os
from typing import Any, Optional

import numpy as np

from .convert.store import load_params
from .logger import get_logger

logger = get_logger(__name__)

_CANONICAL = {
    "acoustic": "acoustic.npz",
    "hubert": "hubert.npz",
    "hubert_kmeans": "hubert_kmeans.npz",
    "w2vbert": "w2vbert.npz",
    "w2vbert_vq": "w2vbert_vq.npz",
    "gpt_semantic_s_en": "gpt_semantic_s_en.npz",
    "gpt_semantic_m_hi": "gpt_semantic_m_hi.npz",
    "bark_fine": "bark_fine.npz",
}


def _from_dir(weights: str, name: str) -> Optional[Any]:
    path = os.path.join(weights, _CANONICAL[name])
    if os.path.exists(path):
        return load_params(path)
    return None


def get_acoustic_params(weights: str = "artifacts", seed: int = 0):
    """{'encoder','decoder','codebooks'} for the SEANet+RVQ codec."""
    if weights not in ("artifacts", "random"):
        p = _from_dir(weights, "acoustic")
        if p is not None:
            return p
        raise FileNotFoundError(f"no acoustic.npz under {weights}")
    if weights == "random":
        from .nn.rvq import RVQConfig, init_codebooks
        from .nn.seanet import SeanetConfig, init_decoder_params, init_encoder_params

        rng = np.random.default_rng(seed)
        cfg = SeanetConfig()
        return {
            "encoder": init_encoder_params(rng, cfg),
            "decoder": init_decoder_params(rng, cfg),
            "codebooks": init_codebooks(rng, RVQConfig()),
        }
    # artifacts: convert the torch checkpoint on the fly
    from .convert.encodec import convert_encodec
    from .convert.store import state_dict_to_numpy

    root = os.environ.get("AUDIOTOKEN_ARTIFACTS", "")
    for cand in ("encodec_24khz.safetensors", "encodec_24khz.pt", "encodec_24khz.th"):
        path = os.path.join(root, cand)
        if root and os.path.exists(path):
            return convert_encodec(_load_torch_sd(path))
    try:
        from transformers import EncodecModel  # type: ignore

        m = EncodecModel.from_pretrained("facebook/encodec_24khz")
        return convert_encodec(state_dict_to_numpy(m.state_dict()))
    except Exception as e:  # noqa: BLE001
        raise FileNotFoundError(
            "EnCodec 24 kHz weights unavailable: place encodec_24khz.safetensors "
            "under $AUDIOTOKEN_ARTIFACTS or enable hub access. "
            f"({e})"
        ) from e


def get_hubert_params(weights: str, seed: int, config) -> tuple:
    """(hubert model params, kmeans centroids [K, 768])."""
    from .nn.hubert import HubertConfig, init_hubert_params

    if weights not in ("artifacts", "random"):
        model = _from_dir(weights, "hubert")
        km = _from_dir(weights, "hubert_kmeans")
        if model is not None and km is not None:
            return model, km["centroids"]
        raise FileNotFoundError(f"no hubert.npz + hubert_kmeans.npz under {weights}")
    if weights == "random":
        rng = np.random.default_rng(seed)
        params = init_hubert_params(rng, HubertConfig())
        centroids = rng.standard_normal(
            (config.num_clusters, config.hidden_dim)
        ).astype(np.float32)
        return params, centroids
    # artifacts
    from .configs import ARTIFACTS
    from .convert.hubert import convert_hubert
    from .convert.quantizers import convert_kmeans
    from .convert.store import state_dict_to_numpy

    from transformers import HubertModel  # type: ignore

    model = HubertModel.from_pretrained(config.model_id)
    params = convert_hubert(state_dict_to_numpy(model.state_dict()))
    centroids = convert_kmeans(ARTIFACTS[config.quantizer_artifact].resolve())
    return params, centroids


def get_w2vbert_params(weights: str, seed: int, config) -> tuple:
    """(conformer model params, VQ codebook [C, 1024])."""
    from .nn.conformer import W2VBertConfig, init_w2vbert_params

    if weights not in ("artifacts", "random"):
        model = _from_dir(weights, "w2vbert")
        vq = _from_dir(weights, "w2vbert_vq")
        if model is not None and vq is not None:
            return model, vq["codebook"]
        raise FileNotFoundError(f"no w2vbert.npz + w2vbert_vq.npz under {weights}")
    if weights == "random":
        rng = np.random.default_rng(seed)
        params = init_w2vbert_params(rng, W2VBertConfig())
        codebook = rng.standard_normal(
            (config.num_clusters, config.hidden_dim)
        ).astype(np.float32)
        return params, codebook
    # artifacts
    from .configs import ARTIFACTS
    from .convert.quantizers import convert_vq
    from .convert.w2vbert import convert_w2vbert

    weights_path = ARTIFACTS[config.weights_artifact].resolve()
    params = convert_w2vbert(_load_torch_sd(weights_path))
    import torch  # type: ignore

    vq_sd = torch.load(
        ARTIFACTS[config.quantizer_artifact].resolve(), map_location="cpu"
    )
    codebook = convert_vq(vq_sd)
    return params, codebook


def get_semantic_gpt_params(
    weights: str, seed: int, artifact_key: str, vocab_size: int
) -> tuple:
    """(gpt params, GPTConfig) for the semantic->acoustic model
    (12L/12H/768d/block 1024, vocab 53,376; reference gpt2_model.py:306-316)."""
    from .nn.gpt import GPTConfig, init_gpt_params

    cfg = GPTConfig(vocab_size=vocab_size)
    if weights not in ("artifacts", "random"):
        p = _from_dir(weights, artifact_key)
        if p is not None:
            return p, cfg
        raise FileNotFoundError(f"no {artifact_key}.npz under {weights}")
    if weights == "random":
        rng = np.random.default_rng(seed)
        return init_gpt_params(rng, cfg), cfg
    from .configs import ARTIFACTS
    from .convert.gpt import convert_gpt

    path = ARTIFACTS[artifact_key].resolve()
    return convert_gpt(_load_torch_sd(path), cfg), cfg


def get_bark_fine_params(weights: str, seed: int) -> tuple:
    """(bark-fine params, BarkFineConfig) — suno/bark fine model
    (24L/16H/1024d non-causal; reference decoder.py:103-106)."""
    from .nn.bark_fine import BarkFineConfig, init_bark_fine_params

    cfg = BarkFineConfig()
    if weights not in ("artifacts", "random"):
        p = _from_dir(weights, "bark_fine")
        if p is not None:
            return p, cfg
        raise FileNotFoundError(f"no bark_fine.npz under {weights}")
    if weights == "random":
        rng = np.random.default_rng(seed)
        return init_bark_fine_params(rng, cfg), cfg
    from .convert.bark import convert_bark_fine

    root = os.environ.get("AUDIOTOKEN_ARTIFACTS", "")
    for cand in ("bark_fine.pt", "fine_2.pt", "fine.pt"):
        path = os.path.join(root, cand)
        if root and os.path.exists(path):
            return convert_bark_fine(_load_torch_sd(path)), cfg
    try:
        from transformers import BarkFineModel  # type: ignore

        m = BarkFineModel.from_pretrained("suno/bark", subfolder="fine_acoustics")
        from .convert.bark import convert_bark_fine_hf
        from .convert.store import state_dict_to_numpy

        return convert_bark_fine_hf(state_dict_to_numpy(m.state_dict())), cfg
    except Exception as e:  # noqa: BLE001
        raise FileNotFoundError(
            "Bark fine weights unavailable: place bark_fine.pt under "
            f"$AUDIOTOKEN_ARTIFACTS or enable hub access. ({e})"
        ) from e


def _load_torch_sd(path: str):
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file  # type: ignore

        return load_file(path)
    import torch  # type: ignore

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "model" in sd and all(
        hasattr(v, "shape") for v in sd["model"].values()
    ):
        sd = sd["model"]
    from .convert.store import state_dict_to_numpy

    return state_dict_to_numpy(sd)
