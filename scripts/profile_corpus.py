"""Corpus-path stage attribution (VERDICT r3 #2): run encode_batch_files
on a synthetic 32 x 60 s corpus and print the executor's per-stage wall
times next to the RTFx, so the gap between device capability and corpus
throughput is attributed, not guessed.

Usage (TPU, one process at a time):
    JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache \
        python -u scripts/profile_corpus.py --tokenizer semantic_s

Stages (runtime/executor.py):
    segment_wait  main thread blocked on the producer threads (host decode
                  + segmentation; 1 CPU core on this box)
    dispatch      H2D enqueue + host-side padding per batch
    writeq_put    backpressure (writer thread behind)
    d2h_fetch     writer blocked draining the device (compute + D2H
                  serialize here on the axon relay)
    sink_write    token .npy writes
"""

import argparse
import json
import os
import shutil
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tokenizer", default="semantic_s",
                    choices=["acoustic", "semantic_s", "semantic_m"])
    ap.add_argument("--files", type=int, default=32)
    ap.add_argument("--file_seconds", type=int, default=60)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--passes", type=int, default=2,
                    help="first pass includes compile; report the rest")
    args = ap.parse_args()

    from audiotoken_tpu import AudioToken, Tokenizers
    from audiotoken_tpu.io.wavfile import write_wav

    sr = 24_000 if args.tokenizer == "acoustic" else 16_000
    rng = np.random.default_rng(0)
    corpus = tempfile.mkdtemp(prefix="profile_corpus_")
    for i in range(args.files):
        wav = np.clip(
            rng.standard_normal((1, args.file_seconds * sr)) * 6000,
            -32768, 32767,
        ).astype(np.int16)
        write_wav(os.path.join(corpus, f"c{i:03d}.wav"), wav, sr)

    if args.tokenizer == "acoustic":
        tok = AudioToken(Tokenizers.acoustic, weights="random", num_codebooks=16)
    else:
        tok = AudioToken(Tokenizers[args.tokenizer], weights="random")

    try:
        for p in range(args.passes):
            out = tempfile.mkdtemp(prefix="profile_tokens_")
            try:
                summary = tok.encode_batch_files(
                    batch_size=args.batch_size, outdir=out,
                    chunk_size=30.0, num_workers=args.workers,
                    audio_dir=corpus,
                )
            finally:
                shutil.rmtree(out, ignore_errors=True)
            label = "warm" if p else "cold(compile)"
            print(f"--- pass {p} ({label}) ---")
            print(json.dumps({k: v for k, v in summary.items() if k != "stages"}))
            for k, v in summary.get("stages", {}).items():
                print(f"  {k:<14} total {v['total_s']:8.3f} s  "
                      f"x{v['count']:<4} mean {v['mean_ms']:8.3f} ms")
    finally:
        shutil.rmtree(corpus, ignore_errors=True)


if __name__ == "__main__":
    main()
