"""ctypes bindings for the native libav streaming decoder (native/audioio.cc).

Loads ``libaudioio.so`` if already built, else tries a one-shot ``make``.
All entry points degrade gracefully: callers should check
:func:`native_available` and fall back to the pure-Python WAV path.
"""

import ctypes
import os
import subprocess
import threading
from typing import Iterator, Optional

import numpy as np

from ..logger import get_logger

logger = get_logger(__name__)

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libaudioio.so"))

_lib = None
_lib_lock = threading.Lock()
_build_attempted = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_attempted
    if _lib is not None:
        return _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH) and not _build_attempted:
            _build_attempted = True
            try:
                subprocess.run(
                    ["make", "-C", os.path.abspath(_NATIVE_DIR)],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except Exception as e:  # noqa: BLE001
                logger.info("native audioio build failed: %s", e)
                return None
        if not os.path.exists(_LIB_PATH):
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as e:
            logger.info("native audioio load failed: %s", e)
            return None
        lib.ati_open.restype = ctypes.c_void_p
        lib.ati_open.argtypes = [ctypes.c_char_p]
        lib.ati_open_bytes.restype = ctypes.c_void_p
        lib.ati_open_bytes.argtypes = [ctypes.c_char_p, ctypes.c_int64, ctypes.c_char_p]
        lib.ati_sample_rate.restype = ctypes.c_int
        lib.ati_sample_rate.argtypes = [ctypes.c_void_p]
        lib.ati_channels.restype = ctypes.c_int
        lib.ati_channels.argtypes = [ctypes.c_void_p]
        lib.ati_duration_frames.restype = ctypes.c_int64
        lib.ati_duration_frames.argtypes = [ctypes.c_void_p]
        lib.ati_read.restype = ctypes.c_int64
        lib.ati_read.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
        ]
        lib.ati_error.restype = ctypes.c_char_p
        lib.ati_error.argtypes = [ctypes.c_void_p]
        lib.ati_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


class NativeDecoder:
    """Streaming decode to mono float32 at the source's native sample rate."""

    def __init__(self, source, format_hint: str = ""):
        lib = _load()
        if lib is None:
            raise RuntimeError("native audioio library unavailable")
        self._lib = lib
        if isinstance(source, (str, os.PathLike)):
            self._h = lib.ati_open(str(source).encode())
        else:
            data = source if isinstance(source, (bytes, bytearray)) else source.read()
            self._h = lib.ati_open_bytes(bytes(data), len(data), format_hint.encode())
        if not self._h:
            raise ValueError(f"could not open audio source: {source!r}")

    @property
    def sample_rate(self) -> int:
        return self._lib.ati_sample_rate(self._h)

    @property
    def channels(self) -> int:
        return self._lib.ati_channels(self._h)

    @property
    def duration_frames(self) -> int:
        return self._lib.ati_duration_frames(self._h)

    def read(self, max_frames: int) -> np.ndarray:
        out = np.empty(max_frames, dtype=np.float32)
        n = self._lib.ati_read(
            self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), max_frames
        )
        if n < 0:
            raise RuntimeError(
                f"decode error: {self._lib.ati_error(self._h).decode()}"
            )
        return out[:n]

    def chunks(self, frames_per_chunk: int) -> Iterator[np.ndarray]:
        while True:
            chunk = self.read(frames_per_chunk)
            if chunk.size == 0:
                return
            yield chunk

    def close(self) -> None:
        if self._h:
            self._lib.ati_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:  # noqa: BLE001
            pass
