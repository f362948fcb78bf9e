"""Host-side audio I/O: decode, resample, chunk, dataset pipeline, token sink."""

from .audio import read_audio, convert_audio, save_audio
from .resample import resample, sinc_resample_kernel

__all__ = [
    "read_audio",
    "convert_audio",
    "save_audio",
    "resample",
    "sinc_resample_kernel",
]
