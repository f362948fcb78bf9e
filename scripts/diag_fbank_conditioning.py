"""Prove (or refute) the fbank-normalization conditioning hypothesis.

The TPU-vs-CPU semantic_m golden failures concentrate on STATIONARY
battery cases (silence ~0 agreement, tone ~0.6, chirp ~0.55-0.98) with
huge normed-feature divergence (max|d| ~ 6 on silence vs 2e-4 on noise).
Hypothesis: the reference's per-dim-over-time fbank normalization
(processors.py:119-135, ours nn/fbank.py) is SINGULAR on stationary
signals — mel dims that sit at the log floor (or cycle with tiny
amplitude) have time-variance ~ 0, so `(f - mean) / sqrt(var + 1e-7)`
amplifies backend summation-rounding noise by ~1/sqrt(1e-7) ~ 3e3 into
O(1) decorrelated features before the conformer even starts.

This script tests that WITHOUT any TPU: it compares two equally-valid
CPU implementations of the same math — the production f32 JAX path vs a
host numpy f64 re-normalization of the bit-identical pre-norm log-mel —
and reports, per battery case:
  * conditioning stats: #dims with exactly-zero / sub-eps time variance,
  * post-norm feature delta between the two variants,
  * end-to-end semantic_m id agreement between the two variants.
If silence/tone/chirp flip here while noise/harmonic stay exact, the
degenerate cases are ill-conditioned AT THE TASK LEVEL: no two
implementations (including the torch reference vs itself on another
backend/thread-count) can agree on them, and the parity bar must treat
them as stability probes, not exactness probes.

CPU-only:
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -u scripts/diag_fbank_conditioning.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from golden_cases import battery, prefix_mask  # noqa: E402


def prenorm_logmel(audio, mask, cfg, precision):
    """Bit-equal replica of fbank_features' pre-normalization stage."""
    import jax.numpy as jnp

    from audiotoken_tpu.nn.fbank import _folded_dft, _frame

    fold, mel = _folded_dft(cfg)
    nbins = cfg.fft_length // 2 + 1
    frames = _frame(jnp.asarray(audio, jnp.float32), cfg.frame_length, cfg.hop_length)
    spec = jnp.einsum(
        "bfl,lk->bfk", frames, fold, precision=precision,
        preferred_element_type=jnp.float32,
    )
    power = spec[..., :nbins] ** 2 + spec[..., nbins:] ** 2
    melspec = jnp.einsum(
        "bfk,km->bfm", power, mel, precision=precision,
        preferred_element_type=jnp.float32,
    )
    feats = jnp.log(jnp.maximum(melspec, cfg.mel_floor))
    fr = _frame(jnp.asarray(mask, jnp.float32), cfg.frame_length, cfg.hop_length)
    fmask = (jnp.mean(fr, axis=-1) == 1.0).astype(jnp.float32)
    F = feats.shape[1]
    return np.asarray(feats, np.float64), np.asarray(fmask[:, :F], np.float64)


def norm_host(feats, fmask, cfg, dtype):
    """Masked biased mean/var normalization in the given numpy dtype."""
    f = feats.astype(dtype)
    m3 = fmask[:, :, None].astype(dtype)
    count = np.maximum(m3.sum(1, keepdims=True), 1.0)
    mean = (f * m3).sum(1, keepdims=True) / count
    var = (((f * m3) - mean) ** 2 * m3).sum(1, keepdims=True) / count
    return ((f - mean) / np.sqrt(var + np.asarray(1e-7, dtype))).astype(np.float32)


def stack_host(features, fmask, cfg, pad_to_multiple_of=2):
    """Replica of fbank_features' stride stacking + padding_value fill."""
    s = cfg.stride
    B, F, M = features.shape
    keep = F - F % s
    feats = features[:, :keep].reshape(B, keep // s, M * s)
    fm = fmask[:, :keep].reshape(B, keep // s, s).astype(np.float32)
    full = np.repeat(fm, M, axis=-1)
    feats = np.where(full == 0, np.float32(cfg.padding_value), feats)
    F2 = feats.shape[1]
    P = (-F2) % pad_to_multiple_of
    feats = np.pad(feats, ((0, 0), (0, P), (0, 0)),
                   constant_values=np.float32(cfg.padding_value))
    amask = np.pad(fm[:, :, 0], ((0, 0), (0, P)))
    return feats.astype(np.float32), amask.astype(np.float32)


def ids_from_features(enc, feats, amask):
    """features -> semantic ids, replicating _forward's tail on host f32."""
    import jax

    from audiotoken_tpu.nn.conformer import w2vbert_features

    h = np.asarray(
        w2vbert_features(
            jax.device_get(enc.params)["model"],
            enc.policy.cast(feats),
            amask,
            enc.model_cfg,
            output_layer=enc.config.output_layer,
            precision=enc.policy.matmul_precision,
        ),
        np.float32,
    )
    mu = h.mean(-1, keepdims=True)
    var = h.var(-1, keepdims=True)
    hn = (h - mu) / np.sqrt(var + 1e-5)
    cb = np.asarray(jax.device_get(enc.params)["codebook"], np.float32)
    d = (hn**2).sum(-1, keepdims=True) - 2.0 * (hn @ cb.T) + (cb**2).sum(-1)
    return d.argmin(-1)  # [B, T']


def main():
    import jax

    from audiotoken_tpu.configs import Wav2VecBertConfig
    from audiotoken_tpu.encoders import Wav2VecBertEncoder
    from audiotoken_tpu.nn.fbank import fbank_features

    print("backend:", jax.default_backend(), flush=True)
    audio, lengths, names = battery(16_000)
    T = audio.shape[-1]
    mask = prefix_mask(lengths, T)

    enc = Wav2VecBertEncoder(
        Wav2VecBertConfig(), weights="random", precision="highest", seed=0,
        attn_impl="xla",
    )
    cfg = enc.fbank_cfg
    pre, fmask = prenorm_logmel(audio, mask, cfg, enc.policy.matmul_precision)

    # conditioning stats per case: masked per-dim variance over time (f64)
    for b, name in enumerate(names):
        v = fmask[b] > 0
        f = pre[b][v]  # [Fv, M]
        var = f.var(axis=0)
        n_exact = int((var == 0.0).sum())
        n_sub = int((var < 1e-7).sum())
        print(f"{name:12s} dims var==0: {n_exact:3d}/80  var<1e-7: {n_sub:3d}/80"
              f"  min {var.min():.3e}  median {np.median(var):.3e}", flush=True)

    # variant A: production f32 JAX normalization (end-to-end fbank)
    proc = fbank_features(
        jax.numpy.asarray(audio), jax.numpy.asarray(mask), cfg,
        precision=enc.policy.matmul_precision,
    )
    featA = np.asarray(proc["input_features"], np.float32)
    amask = np.asarray(proc["attention_mask"], np.float32)

    # variant B: host f64 normalization of the same pre-norm log-mel
    featB, amaskB = stack_host(norm_host(pre, fmask, cfg, np.float64), fmask, cfg)
    assert np.array_equal(amask, amaskB), "mask replica drifted"

    dmax = np.abs(featA - featB).max(axis=(1, 2))
    print("post-norm max|f32norm - f64norm| per case: "
          + ", ".join(f"{n}={d:.2e}" for n, d in zip(names, dmax)), flush=True)

    idsA = ids_from_features(enc, featA, amask)
    idsB = ids_from_features(enc, featB, amask)
    valid = amask > 0
    for b, name in enumerate(names):
        v = valid[b]
        agree = float((idsA[b][v] == idsB[b][v]).mean())
        print(f"{name:12s} id agreement f32norm-vs-f64norm: {agree:.6f}", flush=True)


if __name__ == "__main__":
    main()
