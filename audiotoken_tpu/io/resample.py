"""Windowed-sinc polyphase resampler with torchaudio-compatible numerics.

The reference resamples with ``torchaudio.transforms.Resample``
(/root/reference/audiotoken/utils.py:42, 95-99) whose polyphase kernel
construction is specific (sinc * hann^2 window computed in float64, cast to
float32, conv1d with stride=orig_freq). Token parity — especially for the
16-codebook RVQ path (SURVEY.md §7 "hard parts") — requires reproducing that
exact kernel math, so this module re-derives the same filter bank and applies
it as an XLA convolution (MXU-friendly: one strided conv over the whole
waveform instead of a per-phase scalar loop).
"""

import math
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=64)
def sinc_resample_kernel(
    orig_freq: int,
    new_freq: int,
    lowpass_filter_width: int = 6,
    rolloff: float = 0.99,
    resampling_method: str = "sinc_interp_hann",
    beta: float = 14.769656459379492,
):
    """Build the polyphase filter bank.

    Returns ``(kernel, width, orig, new)`` where ``kernel`` is a float32
    ndarray of shape [new, 1, 2*width + orig] (one FIR per output phase) and
    ``orig``/``new`` are the gcd-reduced rates. Math mirrors torchaudio's
    ``_get_sinc_resample_kernel`` (float64 intermediate, float32 result).
    """
    if orig_freq == new_freq:
        raise ValueError("orig_freq == new_freq: no resampling needed")
    g = math.gcd(int(orig_freq), int(new_freq))
    orig = int(orig_freq) // g
    new = int(new_freq) // g

    base_freq = min(orig, new) * rolloff
    width = math.ceil(lowpass_filter_width * orig / base_freq)

    idx = np.arange(-width, width + orig, dtype=np.float64)[None, None] / orig
    t = np.arange(0, -new, -1, dtype=np.float64)[:, None, None] / new + idx
    t *= base_freq
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)

    if resampling_method == "sinc_interp_hann":
        window = np.cos(t * math.pi / lowpass_filter_width / 2) ** 2
    elif resampling_method == "sinc_interp_kaiser":
        window = np.i0(beta * np.sqrt(1 - (t / lowpass_filter_width) ** 2)) / np.i0(beta)
    else:
        raise ValueError(f"unknown resampling_method: {resampling_method}")

    t *= math.pi
    scale = base_freq / orig
    kernel = np.where(t == 0, 1.0, np.sin(t) / np.where(t == 0, 1.0, t))
    kernel *= window * scale

    return kernel.astype(np.float32), width, orig, new


@partial(jax.jit, static_argnames=("orig", "new", "width", "target_length"))
def _apply_kernel(waveform, kernel, orig: int, new: int, width: int, target_length: int):
    x = jnp.pad(waveform, ((0, 0), (width, width + orig)))
    # [B, 1, T_padded] conv [new, 1, taps] stride orig -> [B, new, frames]
    y = jax.lax.conv_general_dilated(
        x[:, None, :],
        kernel,
        window_strides=(orig,),
        padding=[(0, 0)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32,
        # Parity-critical: f32 MXU passes, not the bf16 default (tokens are
        # sensitive to resampler error at 16 codebooks, SURVEY.md §7).
        precision=jax.lax.Precision.HIGHEST,
    )
    # Interleave phases: frame f of phase p lands at output index f*new + p.
    y = jnp.swapaxes(y, 1, 2).reshape(waveform.shape[0], -1)
    return y[:, :target_length]


def resample(
    waveform,
    orig_freq: int,
    new_freq: int,
    lowpass_filter_width: int = 6,
    rolloff: float = 0.99,
) -> jnp.ndarray:
    """Resample ``waveform`` [..., T] from ``orig_freq`` to ``new_freq``.

    Matches ``torchaudio.transforms.Resample`` defaults; output length is
    ``ceil(new_freq * T / orig_freq)`` after gcd reduction.
    """
    waveform = jnp.asarray(waveform, dtype=jnp.float32)
    if orig_freq == new_freq:
        return waveform
    kernel, width, orig, new = sinc_resample_kernel(
        int(orig_freq), int(new_freq), lowpass_filter_width, rolloff
    )
    shape = waveform.shape
    flat = waveform.reshape(-1, shape[-1])
    target_length = int(math.ceil(new * shape[-1] / orig))
    out = _apply_kernel(flat, jnp.asarray(kernel), orig, new, width, target_length)
    return out.reshape(*shape[:-1], target_length)


def resample_np(waveform: np.ndarray, orig_freq: int, new_freq: int) -> np.ndarray:
    """Pure-numpy implementation (host-only decode paths and tests).

    The strided view turns the polyphase filtering into one
    [num_frames, taps] @ [taps, new] matmul — no Python loop over frames.
    """
    waveform = np.asarray(waveform, dtype=np.float32)
    if orig_freq == new_freq:
        return waveform
    kernel, width, orig, new = sinc_resample_kernel(int(orig_freq), int(new_freq))
    taps = kernel.shape[-1]
    shape = waveform.shape
    flat = waveform.reshape(-1, shape[-1])
    length = shape[-1]
    x = np.pad(flat, ((0, 0), (width, width + orig)))
    num_frames = (x.shape[-1] - taps) // orig + 1
    s0, s1 = x.strides
    frames = np.lib.stride_tricks.as_strided(
        x, shape=(flat.shape[0], num_frames, taps), strides=(s0, s1 * orig, s1)
    )
    out = frames @ kernel[:, 0, :].T  # [B, num_frames, new]
    out = out.reshape(flat.shape[0], -1)
    target_length = int(math.ceil(new * length / orig))
    return out[:, :target_length].reshape(*shape[:-1], target_length)
