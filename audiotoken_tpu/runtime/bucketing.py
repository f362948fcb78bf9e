"""Static-shape bucketing: variable-length audio without recompiles.

XLA compiles one program per input shape, so raw variable-length audio would
trigger a recompile per file. Instead, inputs are right-padded (pad_token 0 +
attention mask) up to the next bucket boundary — a geometric-ish grid aligned
to the model hop — and outputs are trimmed back to the exact token count.

Because every model stage in the acoustic path is causal (SEANet left-padded
convs + forward LSTM), right-padding does not perturb the tokens of the
valid prefix, so bucketed single-file encode stays bit-identical to the
reference's exact-shape encode (SURVEY.md §5 "Long-context / sequence
scaling": bucketed static shapes per chunk length to avoid recompiles).
The reference's own batch pipeline pads to fixed segment shapes
(datasets.py:88-105); buckets generalize that contract.
"""

import math
from typing import Sequence, Tuple

import numpy as np


def default_buckets(
    sample_rate: int,
    hop: int,
    min_seconds: float = 1.0,
    max_seconds: float = 32.0,
) -> Tuple[int, ...]:
    """Geometric bucket grid (x2 per step, plus 1.5x midpoints), each aligned
    up to a multiple of ``hop`` samples."""
    out = []
    s = min_seconds
    while s < max_seconds:
        for v in (s, s * 1.5):
            if v < max_seconds:
                n = int(math.ceil(v * sample_rate / hop) * hop)
                out.append(n)
        s *= 2
    out.append(int(math.ceil(max_seconds * sample_rate / hop) * hop))
    return tuple(sorted(set(out)))


def bucket_length(n: int, buckets: Sequence[int]) -> int:
    """Smallest bucket >= n (largest bucket if n exceeds the grid —
    callers chunk long audio before this point)."""
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


def pad_to_bucket(
    audio: np.ndarray,
    buckets: Sequence[int],
    pad_value: float = 0.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """[B, T] -> ([B, bucket], mask [B, bucket]) right-padded."""
    n = audio.shape[-1]
    target = bucket_length(n, buckets)
    pad = target - n
    mask = np.ones_like(audio, dtype=np.float32)
    if pad > 0:
        audio = np.pad(audio, ((0, 0), (0, pad)), constant_values=pad_value)
        mask = np.pad(mask, ((0, 0), (0, pad)))
    return audio, mask
