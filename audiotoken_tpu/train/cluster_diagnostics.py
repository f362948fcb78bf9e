"""Quantizer/cluster diagnostics.

Reference analog: scripts/clustering/test_clustering.py:75-237 (compare the
distance-to-nearest-centroid distribution of real audio embeddings against
norm-matched random vectors; a codebook that fits real data should sit much
closer to real embeddings than to noise). The reference version is
bit-rotted (imports removed symbols); this one works against any centroid
matrix + embedding batch and has no plotting dependency (stats + optional
matplotlib histogram).
"""

from typing import Dict, Optional

import numpy as np

from ..logger import get_logger
from ..ops.lookup import nearest_centroid

logger = get_logger(__name__, level="INFO")


def nearest_distance_stats(x: np.ndarray, centroids: np.ndarray) -> Dict[str, float]:
    """min-distance-to-centroid distribution stats for x [N, D]."""
    idx = np.asarray(nearest_centroid(x, centroids))
    d = np.linalg.norm(x - centroids[idx], axis=-1)
    return {
        "mean": float(d.mean()),
        "p50": float(np.median(d)),
        "p90": float(np.percentile(d, 90)),
        "p99": float(np.percentile(d, 99)),
        "active_frac": float(len(np.unique(idx)) / len(centroids)),
    }


def compare_real_vs_random(
    embeddings: np.ndarray,
    centroids: np.ndarray,
    seed: int = 0,
    plot_path: Optional[str] = None,
) -> Dict[str, Dict[str, float]]:
    """Real embeddings vs norm-matched gaussian noise, as in the reference's
    get_dist harness (test_clustering.py:75-88)."""
    rng = np.random.default_rng(seed)
    noise = rng.standard_normal(embeddings.shape).astype(np.float32)
    # match per-vector norms so the comparison isolates *direction* structure
    noise *= (
        np.linalg.norm(embeddings, axis=-1, keepdims=True)
        / np.maximum(np.linalg.norm(noise, axis=-1, keepdims=True), 1e-9)
    )
    real = nearest_distance_stats(embeddings, centroids)
    rand = nearest_distance_stats(noise, centroids)
    result = {"real": real, "random": rand,
              "separation": rand["p50"] / max(real["p50"], 1e-9)}
    logger.info("cluster diagnostics: %s", result)

    if plot_path:
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            idx_r = np.asarray(nearest_centroid(embeddings, centroids))
            idx_n = np.asarray(nearest_centroid(noise, centroids))
            dr = np.linalg.norm(embeddings - centroids[idx_r], axis=-1)
            dn = np.linalg.norm(noise - centroids[idx_n], axis=-1)
            plt.figure(figsize=(8, 4))
            plt.hist(dr, bins=100, alpha=0.6, label="real embeddings", density=True)
            plt.hist(dn, bins=100, alpha=0.6, label="norm-matched noise", density=True)
            plt.xlabel("distance to nearest centroid")
            plt.legend()
            plt.tight_layout()
            plt.savefig(plot_path)
            logger.info("histogram saved to %s", plot_path)
        except Exception as e:  # noqa: BLE001
            logger.warning("plotting skipped: %s", e)
    return result


if __name__ == "__main__":
    from argparse import ArgumentParser

    p = ArgumentParser(description="Compare centroid distances: real embeddings vs noise")
    p.add_argument("--tokenizer", choices=["semantic_s", "semantic_m"], required=True)
    p.add_argument("--indir", required=True, help="directory of audio files")
    p.add_argument("--weights", default="artifacts")
    p.add_argument("--max_files", type=int, default=16)
    p.add_argument("--plot", default=None)
    a = p.parse_args()

    from ..configs import HubertEncoderConfig, Wav2VecBertConfig
    from ..encoders import HubertEncoder, Wav2VecBertEncoder
    from ..io.audio import find_audio_files, read_audio

    if a.tokenizer == "semantic_s":
        enc = HubertEncoder(HubertEncoderConfig(), weights=a.weights, quantize=False)
        centroids = np.asarray(enc.params["centroids"])
    else:
        enc = Wav2VecBertEncoder(Wav2VecBertConfig(), weights=a.weights, quantize=False)
        centroids = np.asarray(enc.params["codebook"])

    embs = []
    for f in find_audio_files(a.indir)[: a.max_files]:
        wav = read_audio(f, 16_000)
        if hasattr(enc, "host_transform"):
            wav = enc.host_transform(wav)
        feats = enc(wav.astype(np.float32))
        embs.append(np.asarray(feats).reshape(-1, feats.shape[-1]))
    compare_real_vs_random(np.concatenate(embs), centroids, plot_path=a.plot)
