"""Audio quality metrics.

Reference analog: the archived SI-SNR harness used to validate batched
EnCodec round-trips (archive/test_encodec.py:40-65, bit-rotted there).
Scale-invariant SNR is the round-trip fidelity metric for the acoustic
codec (BASELINE.md config 2).
"""

import numpy as np


def si_snr(estimate: np.ndarray, reference: np.ndarray, eps: float = 1e-8) -> float:
    """Scale-invariant signal-to-noise ratio in dB ([..., T] over last axis)."""
    est = np.asarray(estimate, np.float64)
    ref = np.asarray(reference, np.float64)
    n = min(est.shape[-1], ref.shape[-1])
    est, ref = est[..., :n], ref[..., :n]
    est = est - est.mean(axis=-1, keepdims=True)
    ref = ref - ref.mean(axis=-1, keepdims=True)
    proj = (np.sum(est * ref, axis=-1, keepdims=True) /
            (np.sum(ref**2, axis=-1, keepdims=True) + eps)) * ref
    noise = est - proj
    ratio = np.sum(proj**2, axis=-1) / (np.sum(noise**2, axis=-1) + eps)
    return float(np.mean(10 * np.log10(ratio + eps)))


def snr(estimate: np.ndarray, reference: np.ndarray, eps: float = 1e-8) -> float:
    """Plain SNR in dB."""
    est = np.asarray(estimate, np.float64)
    ref = np.asarray(reference, np.float64)
    n = min(est.shape[-1], ref.shape[-1])
    est, ref = est[..., :n], ref[..., :n]
    noise = est - ref
    ratio = np.sum(ref**2, axis=-1) / (np.sum(noise**2, axis=-1) + eps)
    return float(np.mean(10 * np.log10(ratio + eps)))
