"""Streaming segment producer for corpus tokenization.

Reference analog: /root/reference/audiotoken/datasets.py:23-142
(AudioBatchDataset: mp.Queue feeder + DataLoader workers + fixed-shape
segmenting). Here the pipeline is thread-based (the decode hot path is
native C++ / numpy, which releases the GIL) with a bounded queue, and the
shutdown race the reference has (single ``None`` sentinel for N workers +
``qsize()`` polling, datasets.py:73, 112-117) is fixed with one sentinel per
consumer and no qsize polling.

Segmentation contract preserved exactly (datasets.py:88-105): fixed
``chunk_size * sample_rate`` segments, right-padded with ``pad_token`` +
attention mask, segments shorter than 0.2 s dropped.
"""

import queue
import threading
from dataclasses import dataclass
from typing import Callable, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from ..configs import AUDIO_EXTS, TAR_EXTS, ZIP_EXTS, AudioConfig
from ..logger import get_logger
from .audio import iterate_tar, iterate_zip, process_audio_chunks

logger = get_logger(__name__)

MIN_SEGMENT_SECONDS = 0.2


@dataclass
class Segment:
    audio: np.ndarray  # [segment_length] f32 or int16, padded
    n_valid: int  # valid samples (the prefix; the rest is pad_token)
    config: AudioConfig


class AudioSegmentStream:
    """Iterates (segment, n_valid, AudioConfig) triples over a file corpus.

    ``on_file_complete(file_name, n_segments)`` fires after a file's last
    segment is emitted — the sink uses it to know when to flush.
    """

    def __init__(
        self,
        audio_files: Sequence[str],
        sample_rate: int,
        model_token_rate: int,
        chunk_size: float,
        pad_token: int = 0,
        transform: Optional[Callable] = None,
        on_file_complete: Optional[Callable[[str, int], None]] = None,
        prefer_int16: bool = False,
        transform_int16_passthrough: bool = False,
    ):
        self.audio_files = list(audio_files)
        self.sample_rate = sample_rate
        self.model_token_rate = model_token_rate
        self.chunk_size = chunk_size
        self.segment_length = int(chunk_size * sample_rate)
        self.pad_token = pad_token
        self.transform = transform
        self.on_file_complete = on_file_complete
        # int16 passthrough only helps encoders that scale on device
        # (AcousticEncoder), or — with transform_int16_passthrough — ones
        # that apply the host transform ON DEVICE for int16 input
        # (HubertEncoder's masked normalization); other transforms need
        # floats, so int16 is disabled
        # keep the raw flag too: batched_segments' worker threads rebuild
        # sub-streams and must forward it, or the resolved prefer_int16
        # would be recomputed to False whenever a transform exists — i.e.
        # exactly the HubertEncoder device-transform case it exists for
        self.transform_int16_passthrough = transform_int16_passthrough
        self.prefer_int16 = prefer_int16 and (
            transform is None or transform_int16_passthrough
        )

    def _segments_of_chunk(
        self, waveform: np.ndarray, file_name: str, chunk_start: int
    ) -> Iterator[Segment]:
        """Split one decoded chunk into fixed-shape segments.

        int16 chunks (PCM16 sources at the model rate) stay int16 — the
        encoders apply the exact /2^15 on device, halving H2D bytes.
        """
        length = waveform.shape[-1]
        if self.transform and waveform.dtype != np.int16:
            # int16 chunks skip the host transform: the encoder applies
            # its device-side equivalent (see transform_int16_passthrough)
            waveform = self.transform(np.asarray(waveform, np.float32))
        dtype = waveform.dtype if waveform.dtype == np.int16 else np.float32
        min_samples = int(MIN_SEGMENT_SECONDS * self.sample_rate)
        for i in range(0, length, self.segment_length):
            seg = np.asarray(waveform[0, i : i + self.segment_length], dtype)
            if seg.shape[-1] < min_samples:
                logger.warning("segment at %ds of %s too short; skipping",
                               (chunk_start + i) // self.sample_rate, file_name)
                continue
            n = seg.shape[0]
            if n < self.segment_length:
                seg = np.pad(seg, (0, self.segment_length - n),
                             constant_values=self.pad_token)
            cfg = AudioConfig(
                file_name=file_name,
                start_idx=chunk_start + i,
                end_idx=chunk_start + i + n,
                length_seconds=n / self.sample_rate,
                length_samples=n,
                model_token_rate=self.model_token_rate,
            )
            yield Segment(seg, n, cfg)

    def _iter_file(self, path: str) -> Iterator[Segment]:
        prefer_int16 = self.prefer_int16
        if path.endswith(TAR_EXTS):
            gen = iterate_tar(path, self.sample_rate, self.chunk_size)
        elif path.endswith(ZIP_EXTS):
            gen = iterate_zip(path, self.sample_rate, self.chunk_size)
        elif path.endswith(AUDIO_EXTS):
            gen = process_audio_chunks(
                path, None, self.sample_rate, self.chunk_size,
                prefer_int16=prefer_int16,
            )
        else:
            logger.error("unsupported file type: %s", path)
            return
        counts: dict = {}
        offsets: dict = {}
        prev_name = None
        for waveform, name in gen:
            if prev_name is not None and name != prev_name:
                self._complete(prev_name, counts)
            prev_name = name
            start = offsets.get(name, 0)
            offsets[name] = start + waveform.shape[-1]
            for seg in self._segments_of_chunk(waveform, name, start):
                counts[name] = counts.get(name, 0) + 1
                yield seg
        if prev_name is not None:
            self._complete(prev_name, counts)

    def _complete(self, name: str, counts: dict) -> None:
        if self.on_file_complete:
            self.on_file_complete(name, counts.get(name, 0))

    def __iter__(self) -> Iterator[Segment]:
        for path in self.audio_files:
            try:
                yield from self._iter_file(str(path))
            except Exception as e:  # noqa: BLE001
                logger.error("error processing %s: %s", path, e)


def batched_segments(
    stream: AudioSegmentStream,
    batch_size: int,
    num_workers: int = 2,
    prefetch: int = 8,
    drop_last: bool = False,
) -> Iterator[Tuple[np.ndarray, np.ndarray, List[AudioConfig]]]:
    """Assemble fixed-shape batches with background producer threads.

    Files are sharded across ``num_workers`` producer threads; a bounded
    queue applies backpressure. Every yielded batch has exactly
    ``batch_size`` rows: the last partial batch is padded by repeating its
    final segment, with ``None`` in the AudioConfig list for the pad rows
    (consumers skip them), so a corpus with a non-multiple segment count
    still triggers exactly one encoder compile. ``drop_last`` drops the
    partial batch instead.
    """
    q: "queue.Queue" = queue.Queue(maxsize=max(2, prefetch) * batch_size)
    n_workers = max(1, min(num_workers, len(stream.audio_files) or 1))
    files_per_worker = [stream.audio_files[i::n_workers] for i in range(n_workers)]

    def worker(files):
        sub = AudioSegmentStream(
            files, stream.sample_rate, stream.model_token_rate, stream.chunk_size,
            stream.pad_token, stream.transform, stream.on_file_complete,
            prefer_int16=stream.prefer_int16,
            transform_int16_passthrough=stream.transform_int16_passthrough,
        )
        try:
            for seg in sub:
                q.put(seg)
        finally:
            q.put(None)  # one sentinel per producer

    threads = [
        threading.Thread(target=worker, args=(f,), daemon=True)
        for f in files_per_worker
    ]
    for t in threads:
        t.start()

    finished = 0
    batch: List[Segment] = []
    while finished < n_workers:
        item = q.get()
        if item is None:
            finished += 1
            continue
        batch.append(item)
        if len(batch) == batch_size:
            yield _stack(batch)
            batch = []
    if batch and not drop_last:
        yield _stack(batch, pad_to=batch_size)
    for t in threads:
        t.join()


def _stack(batch: List[Segment], pad_to: int = 0):
    n_pad = max(0, pad_to - len(batch))
    dtypes = {s.audio.dtype for s in batch}
    if len(dtypes) > 1:
        # mixed int16 (exact-rate PCM) and float32 (resampled) segments:
        # normalize the int16 ones so np.stack's upcast can't smuggle
        # unscaled +-32768 values into the model
        arrs = [
            s.audio.astype(np.float32) / 32768.0
            if s.audio.dtype == np.int16
            else s.audio
            for s in batch
        ]
    else:
        arrs = [s.audio for s in batch]
    # fixed-shape contract: pad the final partial batch by repeating its
    # last segment so the jitted encoder sees ONE batch shape for the whole
    # corpus; pad rows carry config=None and are skipped by consumers
    arrs = arrs + [arrs[-1]] * n_pad
    audio = np.stack(arrs)
    # [B] int32 valid-prefix lengths instead of a [B, T] f32 mask: the
    # encoders expand lengths to the identical mask ON DEVICE. The f32 mask
    # was 15.4 MB per 8 x 30 s batch over the ~60 MB/s relay — 2x the int16
    # audio payload the passthrough was built to halve (VERDICT r3 #2).
    lengths = np.asarray(
        [s.n_valid for s in batch] + [batch[-1].n_valid] * n_pad, np.int32
    )
    return audio, lengths, [s.config for s in batch] + [None] * n_pad
