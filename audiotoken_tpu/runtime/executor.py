"""Corpus tokenization executor: host prefetch -> device encode -> async sink.

Reference analog: AudioToken.encode_batch_files' DataLoader loop
(/root/reference/audiotoken/core.py:198-289), where token saving ran
synchronously on the main loop. Here the device pipeline overlaps with the
host: producer threads decode/segment, the main loop feeds fixed-shape
batches to the jitted encoder (one compile, since segments share one
shape), and a writer thread drains finished tokens into the idempotent
TokenSink. Per-batch throughput counters (audio-seconds/s) are the
BASELINE.md RTFx metric.
"""

import os
import queue
import threading
import time
from typing import List, Optional

import numpy as np

from ..configs import AUDIO_EXTS, TAR_EXTS, ZIP_EXTS
from ..io.audio import find_files, sanitize_path
from ..io.dataset import AudioSegmentStream, batched_segments
from ..io.sink import TokenSink
from ..logger import get_logger
from .profiling import StageTimers

logger = get_logger(__name__)


class ThroughputMeter:
    """Structured audio-seconds/s counters (SURVEY.md §5 observability)."""

    def __init__(self):
        self.audio_seconds = 0.0
        self.batches = 0
        self.start = time.perf_counter()

    def update(self, seconds: float):
        self.audio_seconds += seconds
        self.batches += 1

    @property
    def wall(self) -> float:
        return time.perf_counter() - self.start

    @property
    def rtfx(self) -> float:
        return self.audio_seconds / max(self.wall, 1e-9)

    def summary(self) -> dict:
        return {
            "audio_seconds": round(self.audio_seconds, 3),
            "wall_seconds": round(self.wall, 3),
            "rtfx": round(self.rtfx, 2),
            "batches": self.batches,
        }


def encode_batch_files(
    encoder,
    model_config,
    batch_size: int,
    outdir,
    chunk_size: float = 30,
    num_workers: int = 4,
    audio_files: Optional[List] = None,
    audio_dir=None,
    **kwargs,
) -> dict:
    """Returns the throughput summary dict."""
    assert audio_files or audio_dir, "Either audio_files or audio_dir must be provided"
    assert not (audio_files and audio_dir), "Provide either audio_files or audio_dir, not both"

    outdir = sanitize_path(outdir)
    if audio_dir is not None:
        files = find_files(audio_dir, AUDIO_EXTS + TAR_EXTS + ZIP_EXTS)
    else:
        files = [str(f) for f in audio_files]

    # multi-host corpus jobs: each host takes a deterministic file shard
    # (DCN carries only this assignment; SURVEY.md §2.3)
    import jax

    manifest_name = "manifest.json"
    if jax.process_count() > 1:
        from ..parallel.mesh import shard_files_for_host

        files = shard_files_for_host(files)
        # per-host manifest: hosts share the outdir filesystem, so each
        # writes its own completion record (TokenSink reads the union)
        manifest_name = f"manifest.p{jax.process_index()}.json"
        logger.info(
            "host %d/%d processing %d files",
            jax.process_index(), jax.process_count(), len(files),
        )

    sink = TokenSink(
        outdir,
        rel_dir=str(audio_dir) if audio_dir else None,
        manifest_name=manifest_name,
    )
    files = [f for f in files if not sink.is_done(f)]
    if not files:
        logger.warning("all files already tokenized (manifest); nothing to do")
        return ThroughputMeter().summary()

    stream = AudioSegmentStream(
        audio_files=files,
        sample_rate=model_config.model_sample_rate,
        model_token_rate=model_config.model_token_rate,
        chunk_size=chunk_size,
        pad_token=model_config.pad_token or 0,
        transform=getattr(encoder, "host_transform", None),
        on_file_complete=sink.finish_file,
        prefer_int16=getattr(encoder, "accepts_int16", False),
        transform_int16_passthrough=getattr(
            encoder, "int16_device_transform", False
        ),
    )

    meter = ThroughputMeter()
    # per-stage wall-time attribution (VERDICT r3 #2: the corpus
    # semantic_s path ran 7x below its device capability with nothing in
    # the artifact saying where the time went). Main thread: segment_wait
    # (blocked on the producer threads), dispatch (H2D enqueue + python),
    # writeq_put (backpressure from the writer). Writer thread: d2h_fetch
    # (the device drain — compute + D2H serialize here on the relay),
    # sink_write (disk). Spans overlap across threads; they attribute the
    # *critical path* of each thread, not a partition of wall time.
    timers = StageTimers()
    # bounded queue = pipeline depth: dispatch runs ahead of the writer by
    # at most this many batches, overlapping H2D, device compute, D2H, and
    # disk writes across threads
    depth = int(kwargs.get("pipeline_depth", 4))
    write_q: "queue.Queue" = queue.Queue(maxsize=depth)

    writer_error: List[BaseException] = []

    def writer():
        while True:
            item = write_q.get()
            if item is None:
                return
            if writer_error:
                continue  # drain mode after a fatal error: keep producer unblocked
            try:
                codes, cfgs_done = item
                with timers.span("d2h_fetch"):
                    arr = np.asarray(codes)  # D2H here, off the main thread
                if arr.ndim == 2:
                    arr = arr[:, None, :]  # semantic ids [B, T] -> [B, 1, T]
                with timers.span("sink_write"):
                    for tok, cfg in zip(arr, cfgs_done):
                        if cfg is None:
                            continue  # batch-padding row (io/dataset._stack)
                        try:
                            sink.add(tok, cfg)
                        except Exception as e:  # noqa: BLE001
                            logger.error(
                                "error saving tokens for %s: %s", cfg.file_name, e
                            )
                meter.update(sum(c.length_seconds or 0.0 for c in cfgs_done if c))
                if meter.batches % 50 == 0:
                    logger.info("batch %d: %.1fx real-time", meter.batches, meter.rtfx)
            except BaseException as e:  # noqa: BLE001
                # A device/runtime failure in the D2H fetch must not kill the
                # writer silently: that would leave the main loop blocked
                # forever on the bounded write_q. Record it, switch to drain
                # mode, and let the main loop raise.
                writer_error.append(e)
                logger.error("writer thread failed: %s", e)

    wt = threading.Thread(target=writer, daemon=True)
    wt.start()

    dispatch = getattr(encoder, "dispatch", None)
    batches = iter(batched_segments(
        stream, batch_size, num_workers=num_workers,
        prefetch=kwargs.get("prefetch_factor", 4),
    ))
    while True:
        with timers.span("segment_wait"):
            item = next(batches, None)
        if item is None or writer_error:
            break
        audio, mask, cfgs = item
        with timers.span("dispatch"):
            if dispatch is not None:
                codes, _ = dispatch(audio, mask)
            else:
                codes = encoder(audio, mask)
        with timers.span("writeq_put"):
            write_q.put((codes, cfgs))

    write_q.put(None)
    wt.join()
    if writer_error:
        raise RuntimeError("token writer failed; corpus job aborted") from writer_error[0]

    leftovers = sink.pending_files()
    summary = meter.summary()
    summary["stages"] = timers.summary()
    timers.log()
    if leftovers:
        # failed chunks leave whole files unwritten — surface them as errors
        # (full list), and report them in the summary for the caller
        logger.error(
            "%d file(s) with missing/failed chunks were NOT written: %s",
            len(leftovers), leftovers,
        )
        summary["failed_files"] = list(leftovers)
    logger.info("encode_batch_files done: %s", summary)
    return summary
