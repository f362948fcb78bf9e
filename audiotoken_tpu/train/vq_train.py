"""Semantic quantizer training: EMA vector quantization + minibatch k-means.

Reference analog: scripts/clustering/cluster_tokens.py (streams >=64k-vector
embedding batches from an encoder with quantize=False, trains
``VectorQuantize(decay=0.8, commitment_weight=1)`` online, checkpoints every
``save_freq`` steps, resumes via a processed-file list; cluster_tokens.py:
84-141, 144-169, 217-224, 304-320). Both quantizer flavors are provided:

  * :class:`EMAVQTrainer` — the EMA codebook update used by
    vector-quantize-pytorch (semantic_m's 2048-entry codebook)
  * :func:`minibatch_kmeans_step` — minibatch k-means (semantic_s's
    1000-centroid codebook, reference trained with sklearn)

Updates are jitted; assignment reuses the fused nearest-centroid op.
"""

import json
import os
from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import KMeansClusterConfig
from ..logger import get_logger
from ..ops.lookup import nearest_centroid

logger = get_logger(__name__, level="INFO")


@dataclass(frozen=True)
class VQTrainConfig:
    codebook_size: int = 2048
    dim: int = 1024
    decay: float = 0.8
    commitment_weight: float = 1.0
    eps: float = 1e-5
    # Replace codes whose EMA cluster size falls below this with random
    # batch samples (vector-quantize-pytorch's threshold_ema_dead_code;
    # the reference trains with it disabled, so 0.0 is the default).
    threshold_ema_dead_code: float = 0.0


@partial(jax.jit, static_argnames=("cfg",))
def _ema_update(state, x, cfg: VQTrainConfig):
    """One EMA codebook update on a flat batch x [N, D].

    Returns (new_state, metrics): commit loss (mse to the quantized
    vectors, the reference's logged commit-loss proxy) and active-codebook
    fraction (cluster_tokens.py:304-313 postfix metrics).
    """
    codebook, cluster_size, embed_avg = state
    x = x.astype(jnp.float32)
    idx = nearest_centroid(x, codebook)
    onehot = jax.nn.one_hot(idx, cfg.codebook_size, dtype=jnp.float32)

    n_k = jnp.sum(onehot, axis=0)  # [C]
    embed_sum = jnp.einsum("nc,nd->cd", onehot, x)

    cluster_size = cfg.decay * cluster_size + (1 - cfg.decay) * n_k
    embed_avg = cfg.decay * embed_avg + (1 - cfg.decay) * embed_sum

    # Laplace smoothing (vector-quantize-pytorch EuclideanCodebook)
    total = jnp.sum(cluster_size)
    cs = (cluster_size + cfg.eps) / (total + cfg.codebook_size * cfg.eps) * total
    codebook = embed_avg / cs[:, None]

    quantized = codebook[idx]
    commit = jnp.mean(jnp.sum((x - quantized) ** 2, axis=-1))
    active = jnp.sum(n_k > 0) / cfg.codebook_size
    return (codebook, cluster_size, embed_avg), {
        "commit_loss": commit,
        "active_frac": active,
    }


class EMAVQTrainer:
    def __init__(self, cfg: VQTrainConfig = VQTrainConfig(), seed: int = 0):
        self.cfg = cfg
        rng = np.random.default_rng(seed)
        codebook = rng.standard_normal((cfg.codebook_size, cfg.dim)).astype(np.float32)
        self.state = (
            jnp.asarray(codebook),
            jnp.zeros((cfg.codebook_size,), jnp.float32),
            jnp.asarray(codebook.copy()),
        )
        self.steps = 0
        self._kmeans_inited = False

    def init_from_batch(self, x: np.ndarray):
        """Initialize codebook from data samples (first large batch)."""
        rng = np.random.default_rng(self.steps)
        n = x.shape[0]
        take = rng.choice(n, size=self.cfg.codebook_size, replace=n < self.cfg.codebook_size)
        cb = jnp.asarray(x[take], jnp.float32)
        self.state = (cb, self.state[1], cb)
        self._kmeans_inited = True

    def update(self, x: np.ndarray) -> dict:
        if not self._kmeans_inited:
            self.init_from_batch(np.asarray(x))
        self.state, metrics = _ema_update(self.state, jnp.asarray(x), self.cfg)
        self.steps += 1
        if self.cfg.threshold_ema_dead_code > 0:
            self._replace_dead(np.asarray(x))
        return {k: float(v) for k, v in metrics.items()}

    def _replace_dead(self, x: np.ndarray) -> None:
        codebook, cluster_size, embed_avg = (np.array(s) for s in self.state)
        dead = cluster_size < self.cfg.threshold_ema_dead_code
        n_dead = int(dead.sum())
        if n_dead == 0:
            return
        rng = np.random.default_rng(self.steps)
        take = rng.choice(x.shape[0], size=n_dead, replace=x.shape[0] < n_dead)
        codebook[dead] = x[take]
        cluster_size[dead] = self.cfg.threshold_ema_dead_code
        embed_avg[dead] = codebook[dead] * self.cfg.threshold_ema_dead_code
        self.state = (
            jnp.asarray(codebook), jnp.asarray(cluster_size), jnp.asarray(embed_avg)
        )

    @property
    def codebook(self) -> np.ndarray:
        return np.asarray(self.state[0])

    def save(self, path: str):
        np.savez(
            path,
            codebook=np.asarray(self.state[0]),
            cluster_size=np.asarray(self.state[1]),
            embed_avg=np.asarray(self.state[2]),
            steps=self.steps,
        )

    def load(self, path: str):
        z = np.load(path)
        self.state = (
            jnp.asarray(z["codebook"]),
            jnp.asarray(z["cluster_size"]),
            jnp.asarray(z["embed_avg"]),
        )
        self.steps = int(z["steps"])
        self._kmeans_inited = True


@partial(jax.jit, static_argnames=("num_clusters",))
def minibatch_kmeans_step(centroids, counts, x, num_clusters: int):
    """Sculley minibatch k-means update (per-center learning rate 1/count)."""
    x = x.astype(jnp.float32)
    idx = nearest_centroid(x, centroids)
    onehot = jax.nn.one_hot(idx, num_clusters, dtype=jnp.float32)
    n_k = jnp.sum(onehot, axis=0)
    sum_k = jnp.einsum("nc,nd->cd", onehot, x)
    new_counts = counts + n_k
    lr = jnp.where(n_k > 0, n_k / jnp.maximum(new_counts, 1.0), 0.0)
    batch_mean = sum_k / jnp.maximum(n_k, 1.0)[:, None]
    centroids = centroids + lr[:, None] * (batch_mean - centroids)
    inertia = jnp.mean(jnp.sum((x - centroids[idx]) ** 2, axis=-1))
    return centroids, new_counts, inertia


def train_quantizer(
    tokenizer: str,
    indir: str,
    outdir: str,
    batch_vectors: int = KMeansClusterConfig.batch_size,
    save_freq: int = 100,
    chunk_size: float = 10.0,
    encode_batch: int = 8,
    num_workers: int = 2,
    weights: str = "artifacts",
    max_steps: Optional[int] = None,
):
    """Stream embeddings from a corpus and train the quantizer online,
    with resume via a processed-file list (cluster_tokens.py:217-224)."""
    from ..configs import HubertEncoderConfig, Wav2VecBertConfig
    from ..encoders import HubertEncoder, Wav2VecBertEncoder
    from ..io.audio import find_audio_files
    from ..io.dataset import AudioSegmentStream, batched_segments

    os.makedirs(outdir, exist_ok=True)
    processed_path = os.path.join(outdir, "processed_files.json")
    processed = set()
    if os.path.exists(processed_path):
        processed = set(json.load(open(processed_path))["files"])

    if tokenizer == "semantic_m":
        enc = Wav2VecBertEncoder(Wav2VecBertConfig(), weights=weights, quantize=False)
        dim, codebook_size, sr, rate = 1024, 2048, 16_000, 50
    elif tokenizer == "semantic_s":
        enc = HubertEncoder(HubertEncoderConfig(), weights=weights, quantize=False)
        dim, codebook_size, sr, rate = 768, 1000, 16_000, 50
    else:
        raise ValueError(f"quantizer training targets semantic tokenizers, got {tokenizer}")

    trainer = EMAVQTrainer(VQTrainConfig(codebook_size=codebook_size, dim=dim))
    ckpt = os.path.join(outdir, "quantizer_state.npz")
    if os.path.exists(ckpt):
        trainer.load(ckpt)
        logger.info("resumed quantizer at step %d", trainer.steps)

    files = [f for f in find_audio_files(indir) if f not in processed]
    stream = AudioSegmentStream(
        files, sr, rate, chunk_size,
        transform=getattr(enc, "host_transform", None),
        on_file_complete=lambda f, n: processed.add(f),
    )

    buf = []
    buf_n = 0
    for audio, mask, cfgs in batched_segments(stream, encode_batch, num_workers):
        feats = enc(audio, mask)  # [B, T', D] embeddings (quantize=False)
        feats = np.asarray(feats)
        # keep only valid frames per item
        for i, c in enumerate(cfgs):
            if c is None:
                continue  # batch-padding row (io/dataset._stack)
            n_valid = min(feats.shape[1], c.chunk_length_tokens)
            buf.append(feats[i, :n_valid].reshape(-1, dim))
            buf_n += n_valid
        if buf_n >= batch_vectors:
            x = np.concatenate(buf, axis=0)
            metrics = trainer.update(x)
            buf, buf_n = [], 0
            logger.info(
                "step %d: commit %.4f active %.1f%%",
                trainer.steps, metrics["commit_loss"], 100 * metrics["active_frac"],
            )
            if trainer.steps % save_freq == 0:
                trainer.save(ckpt)
                json.dump({"files": sorted(processed)}, open(processed_path, "w"))
            if max_steps and trainer.steps >= max_steps:
                break

    trainer.save(ckpt)
    json.dump({"files": sorted(processed)}, open(processed_path, "w"))
    np.savez(os.path.join(outdir, f"{tokenizer}_codebook.npz"), codebook=trainer.codebook)
    logger.info("done at step %d", trainer.steps)
    return trainer


if __name__ == "__main__":
    from argparse import ArgumentParser

    p = ArgumentParser(description="Train a semantic quantizer codebook online")
    p.add_argument("--tokenizer", choices=["semantic_s", "semantic_m"], required=True)
    p.add_argument("--indir", required=True)
    p.add_argument("--outdir", required=True)
    p.add_argument("--batch_vectors", type=int, default=KMeansClusterConfig.batch_size)
    p.add_argument("--save_freq", type=int, default=100)
    p.add_argument("--weights", default="artifacts")
    p.add_argument("--max_steps", type=int, default=None)
    a = p.parse_args()
    train_quantizer(
        a.tokenizer, a.indir, a.outdir,
        batch_vectors=a.batch_vectors, save_freq=a.save_freq,
        weights=a.weights, max_steps=a.max_steps,
    )
