"""Command-line entry points.

Reference analogs: the ``__main__`` blocks in core.py:361-404,
encoder.py:189-281, plus scripts/tokenize_audio.py and
scripts/detokenize_audio.py. One consolidated CLI:

    python -m audiotoken_tpu.cli tokenize   --tokenizer acoustic --indir ... --outdir ...
    python -m audiotoken_tpu.cli detokenize --tokenizer acoustic --indir ... --outdir ...
    python -m audiotoken_tpu.cli convert    --model acoustic --src ... --out ...
    python -m audiotoken_tpu.cli bench      --tokenizer acoustic
"""

import argparse
import json
import os
import sys
import time

import numpy as np

from .configs import Tokenizers
from .logger import get_logger

logger = get_logger(__name__, level="INFO")


def _add_common(p):
    p.add_argument("--tokenizer", choices=[t.value for t in Tokenizers], required=True)
    p.add_argument("--weights", default="artifacts",
                   help="'artifacts', 'random', or a converted-weights dir")
    p.add_argument("--precision", default="highest",
                   choices=["highest", "mixed", "high", "default", "bfloat16"],
                   help="'highest' = token-parity grade; 'high' (bf16x3) is "
                        "the measured fast mode (~1.3-1.6x): exact for "
                        "semantic_s over the full golden matrix, approximate "
                        "for semantic_m (>=0.997/case — ARCHITECTURE.md); "
                        "'mixed' (semantic_m only) = bf16x3 with HIGHEST on "
                        "the two flip-originating stages — battery outcomes "
                        "identical to 'highest' at ~1.4x throughput")


def cmd_tokenize(args):
    from . import AudioToken
    from .io.audio import find_audio_files

    tok = AudioToken(Tokenizers(args.tokenizer), weights=args.weights,
                     precision=args.precision, num_codebooks=args.num_codebooks)
    if args.batch_size > 1 or args.indir:
        tok.encode_batch_files(
            batch_size=args.batch_size,
            outdir=args.outdir,
            chunk_size=args.chunk_size,
            num_workers=args.workers,
            audio_dir=args.indir if not args.files else None,
            audio_files=args.files or None,
        )
        return
    files = args.files or find_audio_files(args.indir)
    os.makedirs(args.outdir, exist_ok=True)
    for f in files:
        toks = tok.encode(f, chunk_size=args.chunk_size)
        base = os.path.splitext(os.path.basename(f))[0]
        np.save(os.path.join(args.outdir, f"{base}.npy"), toks[0])
        logger.info("%s -> %s tokens", f, toks.shape)


def cmd_detokenize(args):
    from . import AudioToken
    from .io.audio import find_files, save_audio

    tok = AudioToken(Tokenizers(args.tokenizer), weights=args.weights,
                     precision=args.precision, num_codebooks=args.num_codebooks)
    files = args.files or find_files(args.indir, (".npy",))
    os.makedirs(args.outdir, exist_ok=True)
    sr = tok.model_sample_rate if args.tokenizer == "acoustic" else 24_000

    def write(f, wav):
        base = os.path.splitext(os.path.basename(f))[0]
        out = os.path.join(args.outdir, f"{base}.wav")
        save_audio(wav, out, sr)
        logger.info("%s -> %s (%.2fs)", f, out, wav.shape[-1] / 24_000)

    if args.tokenizer != "acoustic":
        # batched 3-stage semantic decode: 8 files per device batch
        # (measured 14.3x vs 3.6x real-time one-at-a-time); device-side
        # PCM16 output — identical WAV bytes, half the D2H
        tok.load_decoder(output_dtype="int16")
        B = args.batch_size or 8
        for i in range(0, len(files), B):
            grp = files[i : i + B]
            for f, wav in zip(grp, tok.decode_batch(grp)):
                write(f, wav)
        return
    # device-side PCM16 quantization: identical WAV bytes, half the D2H
    tok.load_decoder(output_dtype="int16")
    for f in files:
        tokens = np.load(f)
        if tokens.ndim == 2:
            tokens = tokens[None]
        write(f, tok.decode(tokens))


def cmd_convert(args):
    """Convert reference torch checkpoints to the canonical .npz store."""
    from .convert.store import save_params
    from .weights import _load_torch_sd

    os.makedirs(args.out, exist_ok=True)
    if args.model == "acoustic":
        from .convert.encodec import convert_encodec

        params = convert_encodec(_load_torch_sd(args.src))
        save_params(os.path.join(args.out, "acoustic.npz"), params)
    elif args.model == "hubert":
        from .convert.hubert import convert_hubert

        save_params(os.path.join(args.out, "hubert.npz"), convert_hubert(_load_torch_sd(args.src)))
    elif args.model == "hubert_kmeans":
        from .convert.quantizers import convert_kmeans

        save_params(
            os.path.join(args.out, "hubert_kmeans.npz"),
            {"centroids": convert_kmeans(args.src)},
        )
    elif args.model == "w2vbert":
        from .convert.w2vbert import convert_w2vbert

        save_params(os.path.join(args.out, "w2vbert.npz"), convert_w2vbert(_load_torch_sd(args.src)))
    elif args.model == "w2vbert_vq":
        from .convert.quantizers import convert_vq

        save_params(
            os.path.join(args.out, "w2vbert_vq.npz"),
            {"codebook": convert_vq(_load_torch_sd(args.src))},
        )
    elif args.model in ("gpt_semantic_s_en", "gpt_semantic_m_hi"):
        from .convert.gpt import convert_gpt
        from .nn.gpt import GPTConfig

        params = convert_gpt(_load_torch_sd(args.src), GPTConfig())
        save_params(os.path.join(args.out, f"{args.model}.npz"), params)
    elif args.model == "bark_fine":
        from .convert.bark import convert_bark_fine

        save_params(os.path.join(args.out, "bark_fine.npz"), convert_bark_fine(_load_torch_sd(args.src)))
    else:
        raise SystemExit(f"unknown model {args.model}")
    logger.info("converted %s -> %s", args.src, args.out)


def cmd_bench(args):
    from . import AudioToken

    tok = AudioToken(Tokenizers(args.tokenizer), weights=args.weights,
                     precision=args.precision, num_codebooks=args.num_codebooks)
    sr = tok.model_sample_rate
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal((args.batch_size, 30 * sr)) * 0.2).astype(np.float32)
    mask = np.ones_like(audio)
    tok.load_encoder()
    tok.encoder(audio, mask)  # compile
    t0 = time.perf_counter()
    for _ in range(args.iters):
        tok.encoder(audio, mask)
    dt = time.perf_counter() - t0
    rtfx = args.iters * args.batch_size * 30 / dt
    print(json.dumps({"tokenizer": args.tokenizer, "rtfx": round(rtfx, 2)}))


def main(argv=None):
    p = argparse.ArgumentParser(prog="audiotoken_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("tokenize", help="encode audio files to token .npy files")
    _add_common(t)
    t.add_argument("--indir", type=str)
    t.add_argument("--files", nargs="*")
    t.add_argument("--outdir", type=str, required=True)
    t.add_argument("--chunk_size", type=float, default=30)
    t.add_argument("--batch_size", type=int, default=8)
    t.add_argument("--workers", type=int, default=4)
    t.add_argument("--num_codebooks", type=int, default=16)
    t.set_defaults(func=cmd_tokenize)

    d = sub.add_parser("detokenize", help="decode token .npy files to wavs")
    _add_common(d)
    d.add_argument("--indir", type=str)
    d.add_argument("--files", nargs="*")
    d.add_argument("--outdir", type=str, required=True)
    d.add_argument("--num_codebooks", type=int, default=8)
    d.add_argument("--batch_size", type=int, default=8,
                   help="semantic decode: files per batched device decode")
    d.set_defaults(func=cmd_detokenize)

    c = sub.add_parser("convert", help="convert torch checkpoints to .npz store")
    c.add_argument("--model", required=True,
                   choices=["acoustic", "hubert", "hubert_kmeans", "w2vbert",
                            "w2vbert_vq", "gpt_semantic_s_en", "gpt_semantic_m_hi",
                            "bark_fine"])
    c.add_argument("--src", required=True)
    c.add_argument("--out", required=True)
    c.set_defaults(func=cmd_convert)

    b = sub.add_parser("bench", help="quick RTFx benchmark")
    _add_common(b)
    b.add_argument("--batch_size", type=int, default=8)
    b.add_argument("--iters", type=int, default=8)
    b.add_argument("--num_codebooks", type=int, default=16)
    b.set_defaults(func=cmd_bench)

    args = p.parse_args(argv)
    return args.func(args)


if __name__ == "__main__":
    sys.exit(main())
