"""Idempotent token sink with a restart manifest.

Fixes the reference's two persistence defects (SURVEY.md §3.3 "known
defects"):

  * re-running appended duplicate tokens to existing .npy files
    (utils.py:214-217) -> here each file is written once, atomically
    (tmp + rename), only after all its chunks arrived, and a manifest
    records completed files so re-runs skip them;
  * the whole-file ``length_tokens`` was applied to every chunk
    (utils.py:209-210 vs datasets.py:81-86) -> chunks are trimmed with
    their own ``chunk_length_tokens`` and concatenated in start-index
    order.
"""

import json
import os
import threading
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..configs import AudioConfig
from ..logger import get_logger

logger = get_logger(__name__)


class TokenSink:
    """Collects per-chunk tokens and writes one .npy per audio file."""

    def __init__(
        self,
        outdir: str,
        rel_dir: Optional[str] = None,
        manifest_name: str = "manifest.json",
    ):
        self.outdir = str(outdir)
        self.rel_dir = str(rel_dir) if rel_dir else None
        os.makedirs(self.outdir, exist_ok=True)
        self._pending: Dict[str, Dict[int, np.ndarray]] = {}
        self._expected: Dict[str, int] = {}
        self._lock = threading.Lock()
        self._manifest_path = os.path.join(self.outdir, manifest_name)
        self._done = self._load_manifest()

    def _load_manifest(self) -> set:
        if os.path.exists(self._manifest_path):
            try:
                with open(self._manifest_path) as f:
                    return set(json.load(f)["completed"])
            except Exception:  # noqa: BLE001
                logger.warning("corrupt manifest at %s; starting fresh", self._manifest_path)
        return set()

    def _save_manifest(self) -> None:
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"completed": sorted(self._done)}, f)
        os.replace(tmp, self._manifest_path)

    def is_done(self, file_name: str) -> bool:
        return file_name in self._done

    def _out_path(self, file_name: str) -> str:
        base = os.path.splitext(os.path.basename(file_name))[0]
        if self.rel_dir:
            rel = os.path.dirname(os.path.relpath(file_name, start=self.rel_dir))
            d = os.path.join(self.outdir, rel)
            os.makedirs(d, exist_ok=True)
            return os.path.join(d, f"{base}.npy")
        return os.path.join(self.outdir, f"{base}.npy")

    def add(self, tokens: np.ndarray, cfg: AudioConfig) -> None:
        """tokens [K, T_chunk] for the chunk starting at cfg.start_idx."""
        trimmed = np.asarray(tokens)[:, : cfg.chunk_length_tokens]
        with self._lock:
            self._pending.setdefault(cfg.file_name, {})[cfg.start_idx or 0] = trimmed
            self._maybe_flush(cfg.file_name)

    def finish_file(self, file_name: str, num_chunks: int) -> None:
        """Producer signals how many chunks the file has in total."""
        with self._lock:
            self._expected[file_name] = num_chunks
            self._maybe_flush(file_name)

    def _maybe_flush(self, file_name: str) -> None:
        exp = self._expected.get(file_name)
        chunks = self._pending.get(file_name, {})
        if exp is None or len(chunks) < exp:
            return
        ordered = [chunks[k] for k in sorted(chunks)]
        tokens = np.concatenate(ordered, axis=1) if ordered else np.zeros((0, 0), np.int16)
        path = self._out_path(file_name)
        tmp = path + ".tmp.npy"
        np.save(tmp, tokens)
        os.replace(tmp, path)
        self._done.add(file_name)
        self._save_manifest()
        del self._pending[file_name]
        del self._expected[file_name]
        logger.debug("wrote %s: %s", path, tokens.shape)

    def pending_files(self) -> List[Tuple[str, int]]:
        with self._lock:
            return [(f, len(c)) for f, c in self._pending.items()]
