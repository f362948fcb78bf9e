"""Host-side utilities (process affinity, dataset listings, token helpers).

Reference analogs in /root/reference/audiotoken/utils.py:
``set_process_affinity`` (:267-283), ``get_dataset_files`` (:237-264),
``save_audio_tokens``/``collate_audio_tokens`` (:199-225, 355-366 — the
batch pipeline itself uses the idempotent io/sink.py instead; these
utilities serve one-off scripting).
"""

import os
from typing import List, Optional, Sequence

import numpy as np

from .configs import AudioConfig
from .logger import get_logger

logger = get_logger(__name__)


def set_process_affinity(process_id: int, cores: Sequence[int]) -> None:
    """Pin a process to CPU cores (reference utils.py:267-283)."""
    try:
        os.sched_setaffinity(process_id, set(cores))
    except (AttributeError, OSError) as e:
        logger.warning("could not set affinity: %s", e)


def get_dataset_files(indir: Optional[str], hf_dataset: Optional[str]) -> List[str]:
    """Local directory listing, single file, or HF-datasets audio paths
    (reference utils.py:237-264)."""
    assert indir or hf_dataset, "Either hf_dataset or indir must be provided"
    from .io.audio import find_audio_files

    if indir and os.path.isdir(indir):
        return find_audio_files(indir)
    if indir:
        return [indir]
    assert os.environ.get("HF_TOKEN"), "set HF_TOKEN to list a hub dataset"
    from datasets import load_dataset  # type: ignore

    ds = load_dataset(hf_dataset, "s", trust_remote_code=True,
                      token=os.environ["HF_TOKEN"])["train"]
    return [ds[i]["audio"]["path"] for i in range(len(ds))]


def save_audio_tokens(tokens: np.ndarray, audio_pointer: AudioConfig, root_dir: str) -> None:
    """One-off token save: <basename>.npy truncated to length_tokens.

    Unlike the reference (utils.py:214-217), an existing file is
    OVERWRITTEN, never appended — re-runs are idempotent. Batch pipelines
    should use io/sink.py.
    """
    base = os.path.splitext(os.path.basename(audio_pointer.file_name))[0]
    os.makedirs(root_dir, exist_ok=True)
    path = os.path.join(root_dir, f"{base}.npy")
    out = np.asarray(tokens)[:, : audio_pointer.length_tokens]
    np.save(path, out)
    logger.debug("saved %s %s", path, out.shape)


def collate_audio_tokens(
    prev_tokens: np.ndarray, new_tokens: np.ndarray, audio_pointer: AudioConfig
) -> np.ndarray:
    """Append a chunk's tokens and truncate to the file's total length
    (reference utils.py:355-366)."""
    tokens = np.hstack([prev_tokens, np.asarray(new_tokens)])
    return tokens[:, : audio_pointer.length_tokens]
