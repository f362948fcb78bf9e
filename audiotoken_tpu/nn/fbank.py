"""Fused log-mel (Kaldi-style fbank) front-end for wav2vec2-BERT.

Reference analog: /root/reference/audiotoken/processors.py:29-266
(Wav2VecBertProcessor) — a SeamlessM4T-compatible feature extractor whose
hot loop runs one rfft *per frame* in Python (processors.py:161-178,
SURVEY.md §3.2 "hot loop #1").

TPU-native design: every per-frame op before the power spectrum —
x2^15 Kaldi scaling, DC removal, 0.97 pre-emphasis, povey window
(hann^0.85), zero-padded 512-point rDFT — is LINEAR in the frame, so all of
them fold (in float64, at build time) into one [frame_length, 2*257] matrix.
The whole spectrogram becomes:

    frames [B, F, 400] @ fold [400, 514]  ->  (re, im)  ->  re^2 + im^2

one large MXU matmul instead of `num_frames` kernel launches, followed by
the [257 -> 80] mel matmul, log, masked mean/var normalization, stride-2
stacking, and pad-to-multiple (processors.py:180-259 semantics preserved,
including the reference's filter-construction quirk of building triangles
in mel space: processors.py:8-26 `filter_freqs = mel_freqs`).

Framing is 3 shifted reshapes + concat (hop 160 | frame 400), not a gather.
"""

from dataclasses import dataclass
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class FbankConfig:
    sampling_rate: int = 16_000
    num_mel_bins: int = 80
    frame_length: int = 400
    hop_length: int = 160
    fft_length: int = 512
    preemphasis: float = 0.97
    mel_floor: float = 1.192092955078125e-07
    remove_dc_offset: bool = True
    stride: int = 2
    padding_value: float = 1.0
    min_frequency: float = 20.0
    max_frequency: float = 8_000.0
    # The reference normalizes with BIASED variance (processors.py:131-133);
    # HF SeamlessM4TFeatureExtractor uses ddof=1. Keep False for token
    # parity with the reference pipeline.
    unbiased_variance: bool = False


def _hertz_to_mel(freq):
    return 1127.0 * np.log(1.0 + freq / 700.0)


def _mel_filter_bank(cfg: FbankConfig) -> np.ndarray:
    """[257, num_mel_bins] triangular filters, built in mel space
    (reference mel_filter_bank, processors.py:8-26 + utils.py:286-328)."""
    nbins = cfg.fft_length // 2  # 256 (last rfft bin padded with a zero row)
    mel_min = _hertz_to_mel(cfg.min_frequency)
    mel_max = _hertz_to_mel(cfg.max_frequency)
    filter_freqs = np.linspace(mel_min, mel_max, cfg.num_mel_bins + 2)
    fft_bin_width = cfg.sampling_rate / (nbins * 2)
    fft_freqs = _hertz_to_mel(fft_bin_width * np.arange(nbins))

    filter_diff = np.diff(filter_freqs)
    slopes = filter_freqs[None, :] - fft_freqs[:, None]
    down = -slopes[:, :-2] / filter_diff[:-1]
    up = slopes[:, 2:] / filter_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))  # [256, M]
    return np.concatenate([fb, np.zeros((1, cfg.num_mel_bins))])  # [257, M]


@lru_cache(maxsize=4)
def _folded_dft(cfg: FbankConfig):
    """Fold scale * DC-removal * pre-emphasis * window into the rDFT.

    Returns (fold [frame, 2*(fft//2+1)] f32, mel [257, M] f32): frame ->
    concat(real, imag) of the windowed zero-padded rFFT of the processed
    frame, in float64 then cast.
    """
    L, N = cfg.frame_length, cfg.fft_length
    nbins = N // 2 + 1

    m = np.eye(L, dtype=np.float64) * (2.0**15)  # Kaldi int16 scaling
    if cfg.remove_dc_offset:
        m = (np.eye(L) - np.full((L, L), 1.0 / L)) @ m
    if cfg.preemphasis is not None:
        pre = np.eye(L)
        pre[0, 0] = 1.0 - cfg.preemphasis
        idx = np.arange(1, L)
        pre[idx, idx - 1] = -cfg.preemphasis
        m = pre @ m
    window = np.power(_hann_periodic_false(L), 0.85)  # povey window
    m = np.diag(window) @ m

    n = np.arange(N)[:, None]  # zero-padded length
    k = np.arange(nbins)[None, :]
    ang = -2.0 * np.pi * n * k / N
    dft_re = np.cos(ang)[:L]  # frame occupies the first L samples
    dft_im = np.sin(ang)[:L]
    fold = np.concatenate([m.T @ dft_re, m.T @ dft_im], axis=1)  # [L, 2*nbins]
    # NB: return numpy, not jnp — this cache is populated inside jit traces,
    # and device arrays created there would leak as tracers (jax >= 0.9).
    return (
        fold.astype(np.float32),
        _mel_filter_bank(cfg).astype(np.float32),
    )


def _hann_periodic_false(L: int) -> np.ndarray:
    """torch.hann_window(L, periodic=False): 0.5 - 0.5*cos(2 pi n/(L-1))."""
    n = np.arange(L, dtype=np.float64)
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * n / (L - 1))


def _frame(x: jnp.ndarray, frame_length: int, hop: int) -> jnp.ndarray:
    """[B, N] -> [B, F, frame_length] frames at hop, F = 1+floor((N-fl)/hop).

    Implemented as ceil(frame/hop) shifted reshapes concatenated — no
    gather, so XLA lowers it to cheap slices.
    """
    B, N = x.shape
    num_frames = 1 + (N - frame_length) // hop
    chunks_per_frame = -(-frame_length // hop)  # ceil
    pad = (-N) % hop + chunks_per_frame * hop  # headroom for the shifts
    xp = jnp.pad(x, ((0, 0), (0, pad)))
    c = xp.reshape(B, -1, hop)
    parts = [c[:, s : s + (N + pad) // hop - chunks_per_frame] for s in range(chunks_per_frame)]
    frames = jnp.concatenate(parts, axis=-1)[:, :, :frame_length]
    return frames[:, :num_frames]


@partial(jax.jit, static_argnames=("cfg", "pad_to_multiple_of", "precision"))
def fbank_features(
    waveform: jnp.ndarray,
    mask: jnp.ndarray,
    cfg: FbankConfig = FbankConfig(),
    pad_to_multiple_of: int = 2,
    precision=jax.lax.Precision.HIGHEST,
):
    """[B, N] waveform + [B, N] mask -> dict(input_features [B, F', M*stride],
    attention_mask [B, F']) — Wav2VecBertProcessor.forward semantics
    (processors.py:209-266)."""
    fold, mel = _folded_dft(cfg)
    nbins = cfg.fft_length // 2 + 1

    frames = _frame(waveform.astype(jnp.float32), cfg.frame_length, cfg.hop_length)
    spec = jnp.einsum(
        "bfl,lk->bfk", frames, fold,
        precision=precision, preferred_element_type=jnp.float32,
    )
    power = spec[..., :nbins] ** 2 + spec[..., nbins:] ** 2
    melspec = jnp.einsum(
        "bfk,km->bfm", power, mel,
        precision=precision, preferred_element_type=jnp.float32,
    )
    features = jnp.log(jnp.maximum(melspec, cfg.mel_floor))
    num_frames = features.shape[1]

    # Frame-resolution mask: 1 iff the entire analysis window is valid
    # (avg_pool1d == 1 in the reference, processors.py:100-117).
    frame_mask = _frame(mask.astype(jnp.float32), cfg.frame_length, cfg.hop_length)
    fmask = (jnp.mean(frame_mask, axis=-1) == 1.0).astype(jnp.float32)  # [B, F]

    # Masked mean/var normalization over valid frames (processors.py:119-135),
    # computed with SHIFTED moments: subtract frame 0's value per (batch, dim)
    # before summing. Mathematically an identity, but for dims that are
    # constant over time (log-floored mel bins of stationary audio: silence,
    # pure tones) the deltas are exactly zero, so mean/var and the normalized
    # output are exact zeros on EVERY backend. The unshifted form
    # (f - mean)/sqrt(var + 1e-7) amplifies backend-dependent summation
    # rounding by ~1/sqrt(1e-7)≈3e3 when var→0: measured 0.000000 semantic id
    # agreement on the silence battery case between two equally-valid CPU
    # variants of the unshifted math (scripts/diag_fbank_conditioning.py).
    m3 = fmask[:, :, None]
    count = jnp.maximum(jnp.sum(m3, axis=1, keepdims=True), 1.0)
    shift = features[:, :1]
    fs = (features - shift) * m3
    mean_s = jnp.sum(fs, axis=1, keepdims=True) / count
    var_den = jnp.maximum(count - 1.0, 1.0) if cfg.unbiased_variance else count
    var = jnp.sum((fs - mean_s) ** 2 * m3, axis=1, keepdims=True) / var_den
    features = (features - shift - mean_s) / jnp.sqrt(var + 1e-7)

    # Stride-2 stacking 80 -> 160 (processors.py:246-257).
    s = cfg.stride
    rem = num_frames % s
    keep = num_frames - rem
    B = features.shape[0]
    features = features[:, :keep].reshape(B, keep // s, cfg.num_mel_bins * s)
    fmask = fmask[:, :keep].reshape(B, keep // s, s)

    # Replace masked frames with padding_value; pad frames to multiple
    # (processors.py:190-207). A stacked frame is valid iff its FIRST
    # sub-frame is valid (reference takes mask[:, :, 0] of the stacked mask).
    stacked_valid = fmask[:, :, :1]  # [B, F2, 1]
    full = jnp.repeat(fmask, cfg.num_mel_bins, axis=-1)
    features = jnp.where(full == 0, cfg.padding_value, features)

    F2 = features.shape[1]
    P = 0
    if pad_to_multiple_of > 0 and F2 % pad_to_multiple_of:
        P = pad_to_multiple_of - F2 % pad_to_multiple_of
    features = jnp.pad(features, ((0, 0), (0, P), (0, 0)), constant_values=cfg.padding_value)
    attention_mask = jnp.pad(stacked_valid[:, :, 0], ((0, 0), (0, P)))

    return {"input_features": features, "attention_mask": attention_mask}
