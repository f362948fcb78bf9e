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
from typing import Optional, Sequence, Tuple

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
    # 30 s — the reference's default corpus chunk size (core.py:201) —
    # gets its own bucket so the standard pipeline pays zero padding.
    if min_seconds <= 30 <= max_seconds:
        out.append(int(math.ceil(30 * sample_rate / hop) * hop))
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
    return_mask: bool = True,
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """[B, T] -> ([B, bucket], mask [B, bucket]) right-padded.

    An input already sitting exactly on a bucket boundary (or beyond the
    grid) is returned as-is — callers that segment at bucket-aligned chunk
    sizes pay zero host copies here. ``return_mask=False`` skips the mask
    allocation for models that ignore it (the acoustic encoder).
    """
    n = audio.shape[-1]
    target = bucket_length(n, buckets)
    pad = max(0, target - n)
    mask = None
    if return_mask:
        mask = np.zeros((audio.shape[0], n + pad), dtype=np.float32)
        mask[:, :n] = 1.0
    if pad > 0:
        audio = np.pad(audio, ((0, 0), (0, pad)), constant_values=pad_value)
    return audio, mask
