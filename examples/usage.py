"""End-to-end usage walkthrough (analog of the reference's
examples/usage.ipynb).

Run with random weights (no network):
    python examples/usage.py --weights random
or against a converted-weight store:
    python examples/usage.py --weights /path/to/weights
"""

import argparse
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from audiotoken_tpu import AudioToken, Tokenizers
from audiotoken_tpu.io.audio import save_audio
from audiotoken_tpu.io.wavfile import write_wav
from audiotoken_tpu.metrics import si_snr


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--weights", default="random")
    args = p.parse_args()

    workdir = tempfile.mkdtemp(prefix="audiotoken_demo_")
    sr = 24_000
    t = np.arange(3 * sr) / sr
    wav = (0.4 * np.sin(2 * np.pi * 220 * t) * np.exp(-t / 2)).astype(np.float32)
    wav_path = os.path.join(workdir, "tone.wav")
    write_wav(wav_path, wav[None], sr)
    print(f"demo audio: {wav_path} ({len(wav)/sr:.1f}s)")

    # --- acoustic tokens: encode / decode -------------------------------
    tok = AudioToken(Tokenizers.acoustic, weights=args.weights, num_codebooks=8)
    codes = tok.encode(wav_path)
    print(f"acoustic codes: {codes.shape} {codes.dtype} (75 tok/s x 8 codebooks)")

    recon = tok.decode(codes)
    out_path = os.path.join(workdir, "recon.wav")
    save_audio(recon, out_path, sr)
    print(f"round-trip: {out_path}  SI-SNR {si_snr(recon[0], wav):.1f} dB")

    # --- chunked encode of a long file ----------------------------------
    codes_chunked = tok.encode(wav_path, chunk_size=1.0)
    print(f"chunked encode: {codes_chunked.shape}")

    # --- corpus tokenization --------------------------------------------
    outdir = os.path.join(workdir, "tokens")
    tok.encode_batch_files(
        batch_size=4, outdir=outdir, chunk_size=1.0, num_workers=2,
        audio_files=[wav_path],
    )
    print(f"batch tokens: {np.load(os.path.join(outdir, 'tone.npy')).shape}")

    # --- semantic tokens -------------------------------------------------
    sem = AudioToken(Tokenizers.semantic_m, weights=args.weights)
    ids = sem.encode(wav_path)
    print(f"semantic_m ids: {ids.shape} (50 tok/s, codebook 2048)")


if __name__ == "__main__":
    main()
