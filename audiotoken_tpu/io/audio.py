"""Audio reading/writing and chunked streaming.

Reference analogs (all in /root/reference/audiotoken/utils.py):
  - ``convert_audio`` (utils.py:26-44): stereo->mono mean + resample
  - ``read_audio``   (utils.py:47-68)
  - ``process_audio_chunks`` (utils.py:71-101): FFmpeg StreamReader chunked
    decode, then torch resample per chunk "for consistency"
  - ``save_audio``   (utils.py:399-415): 16-bit PCM with clamp/rescale
  - ``iterate_zip`` / ``iterate_tar`` (utils.py:104-169)
  - file discovery (utils.py:172-196)

Decode runs on the host: native libav (io/_native.py) for any container,
pure-Python WAV parsing as fallback. Resampling uses the torchaudio-parity
polyphase kernel (io/resample.py) so downstream token ids match the
reference bit-for-bit.
"""

import os
import tarfile
import zipfile
from pathlib import Path
from typing import IO, Generator, Iterable, List, Tuple, Union

import numpy as np

from ..configs import AUDIO_EXTS
from ..logger import get_logger
from . import _native, wavfile
from .resample import resample_np

logger = get_logger(__name__)

PathLike = Union[str, os.PathLike]


def convert_audio(
    audio: np.ndarray, sample_rate: int, target_sample_rate: int
) -> np.ndarray:
    """[channels, T] -> mono [1, T'] at target rate (utils.py:26-44)."""
    audio = np.asarray(audio, dtype=np.float32)
    if audio.ndim != 2:
        raise RuntimeError(f"audio must be 2D [channels, time], got {audio.ndim}D")
    num_channels = audio.shape[0]
    if num_channels == 2:
        logger.warning("Provided audio is stereo, converting to mono")
        audio = audio.mean(axis=0, keepdims=True)
    elif num_channels != 1:
        raise RuntimeError("Only mono or stereo audio is supported")
    if sample_rate != target_sample_rate:
        audio = resample_np(audio, sample_rate, target_sample_rate)
    return audio


def _decode_full(path: PathLike) -> Tuple[np.ndarray, int]:
    """Decode an entire file -> (float32 [channels, T], sample_rate)."""
    p = str(path)
    if p.lower().endswith(".wav"):
        return wavfile.read_wav(p)
    if _native.native_available():
        with _native.NativeDecoder(p) as dec:
            sr = dec.sample_rate
            parts = list(dec.chunks(1 << 20))
        data = np.concatenate(parts) if parts else np.zeros(0, dtype=np.float32)
        return data[None, :], sr
    raise RuntimeError(
        f"cannot decode {p}: non-WAV formats require the native libav decoder "
        "(build with `make -C audiotoken_tpu/native`)"
    )


def read_audio(x: PathLike, model_sample_rate: int) -> np.ndarray:
    """Read an audio file -> mono float32 [1, T] at ``model_sample_rate``
    (reference utils.py:47-68)."""
    audio, sr = _decode_full(x)
    if audio.ndim != 2:
        raise RuntimeError(f"Audio needs to be 2D, got {audio.ndim}D for {x}")
    audio = convert_audio(audio, sr, model_sample_rate)
    logger.debug(
        "Read %s: shape %s, %.2fs", x, audio.shape, audio.shape[1] / model_sample_rate
    )
    return audio


def process_audio_chunks(
    file_name: str,
    file_stream: Union[IO[bytes], PathLike, None],
    target_sample_rate: int,
    chunk_size: float,
    prefer_int16: bool = False,
) -> Generator[Tuple[np.ndarray, str], None, None]:
    """Stream ``chunk_size``-second chunks of a file as mono [1, T'] float32
    at ``target_sample_rate`` (reference utils.py:71-101).

    Chunk boundaries are at multiples of ``chunk_size * native_rate`` source
    samples; each chunk is resampled independently, matching the reference's
    per-chunk torch resample (utils.py:95-99).

    ``prefer_int16``: PCM16 mono WAV already at the target rate is yielded
    as raw int16 (exact /2^15 happens on device) — half the transfer bytes
    on the corpus path, bit-identical tokens.
    """
    source = file_stream if file_stream is not None else str(file_name)
    name = str(file_name)

    # WAV takes the numpy bulk parser (faster than demuxing through
    # libav); everything else streams through the native decoder.
    if _native.native_available() and not name.lower().endswith(".wav"):
        hint = ""
        dec = _native.NativeDecoder(source, format_hint=hint)
        native_sr = dec.sample_rate
        frames = int(chunk_size * native_sr)
        with dec:
            for chunk in dec.chunks(frames):
                out = chunk[None, :]
                if native_sr != target_sample_rate:
                    out = resample_np(out, native_sr, target_sample_rate)
                yield out, name
        return

    if not name.lower().endswith(".wav"):
        raise RuntimeError(
            f"cannot stream {name}: non-WAV formats require the native decoder"
        )
    close = False
    if not hasattr(source, "read"):
        source = open(source, "rb")
        close = True
    try:
        info = wavfile.parse_header(source)
        native_sr = info.sample_rate
        frames = int(chunk_size * native_sr)
        keep16 = (
            prefer_int16
            and info.num_channels == 1
            and native_sr == target_sample_rate
        )
        for raw in wavfile.stream_wav_chunks(source, info, frames, keep_int16=keep16):
            if raw.dtype == np.int16:
                yield raw, name
                continue
            mono = raw.mean(axis=0, keepdims=True) if raw.shape[0] > 1 else raw
            if native_sr != target_sample_rate:
                mono = resample_np(mono, native_sr, target_sample_rate)
            yield mono.astype(np.float32), name
    finally:
        if close:
            source.close()


def iterate_zip(
    x: PathLike, model_sample_rate: int, chunk_size: float = 30
) -> Generator[Tuple[np.ndarray, str], None, None]:
    """Stream chunks from every audio member of a zip (utils.py:104-135)."""
    with zipfile.ZipFile(x, "r") as zf:
        for info in zf.infolist():
            if info.is_dir():
                continue
            with zf.open(info.filename) as member:
                yield from process_audio_chunks(
                    info.filename, member, model_sample_rate, chunk_size
                )


def iterate_tar(
    x: PathLike, model_sample_rate: int, chunk_size: float = 30
) -> Generator[Tuple[np.ndarray, str], None, None]:
    """Stream chunks from every audio member of a tar (utils.py:138-169)."""
    with tarfile.open(x, "r") as tf:
        for member in tf.getmembers():
            if not member.isfile():
                continue
            f = tf.extractfile(member)
            if f is None:
                logger.error("Error extracting %s from %s", member.name, x)
                continue
            yield from process_audio_chunks(
                member.name, f, model_sample_rate, chunk_size
            )


def find_audio_files(folder: PathLike) -> List[str]:
    """Recursively list audio files (reference utils.py:172-182)."""
    return find_files(folder, AUDIO_EXTS)


def find_files(folder: PathLike, extensions: Iterable[str]) -> List[str]:
    exts = tuple(e.lower() for e in extensions)
    out: List[str] = []
    for root, _dirs, files in os.walk(folder):
        for f in files:
            if f.lower().endswith(exts):
                out.append(os.path.join(root, f))
    out.sort()
    logger.info("Found %d files in %s", len(out), folder)
    return out


def save_audio(
    wav: np.ndarray,
    path: PathLike,
    sample_rate: int,
    rescale: bool = False,
) -> None:
    """16-bit PCM writer with clamp/rescale (reference utils.py:399-415).

    int16 input (the device-quantized decode path, which already applied
    this exact clamp+quantize) is written verbatim unless ``rescale``.
    """
    wav = np.asarray(wav)
    if wav.dtype == np.int16 and not rescale:
        wavfile.write_wav(str(path), wav, sample_rate)
        return
    if wav.dtype == np.int16:
        wav = wav.astype(np.float32) / 32768.0
    wav = np.asarray(wav, dtype=np.float32)
    limit = 0.99
    if rescale:
        mx = float(np.abs(wav).max()) or 1.0
        wav = wav * min(limit / mx, 1.0)
    else:
        wav = np.clip(wav, -limit, limit)
    wavfile.write_wav(str(path), wav, sample_rate)


def sanitize_path(path: PathLike) -> str:
    """Absolute-ify, expand ``~``, mkdir -p (reference utils.py:342-353)."""
    p = Path(path).expanduser().absolute().resolve()
    p.mkdir(parents=True, exist_ok=True)
    return str(p)
