"""Generate the CPU-f32 golden token files used by the TPU parity checks.

Run on CPU:
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -u scripts/make_goldens.py

Golden matrix (VERDICT r3 #3 — parity claims must survive more than two
noise clips): 12 audio cases (scripts/golden_cases.py: silence, near-
silence, DC offset, tone, chirp, clipped, harmonic speech-like, noise,
plus the four int16-roundtripped probes of VERDICT r4 #1) with ragged
per-row lengths x 4 weight seeds (0, 7, 13, 42) x 3 tokenizers, plus
API-level goldens per tokenizer (bucket-boundary-straddling clips + one
90 s multi-chunk file through AudioToken.encode).

Audio is NOT stored: the npz files carry only ids/codes + lengths, and
every consumer regenerates the audio bit-exactly from golden_cases.py
(seeded numpy). Files written:
    tests/goldens/battery_{acoustic,semantic_m,semantic_s}.npz
        lengths [8] int32; ids_s{seed} per weight seed
    tests/goldens/api_{acoustic,semantic_m,semantic_s}.npz
        tokens_{bucket_under,bucket_over,multichunk_90s} (seed 0)
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from golden_cases import WEIGHT_SEEDS, api_clips, battery  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")


def hubert_host_norm(audio, lengths):
    """Reference host normalization over each row's VALID prefix only
    (the corpus pipeline normalizes per utterance before padding)."""
    from audiotoken_tpu.encoders import HubertEncoder

    out = np.zeros_like(audio, np.float32)
    for i, n in enumerate(lengths):
        out[i, :n] = HubertEncoder.host_transform(audio[i, :n][None])[0]
    return out


def battery_goldens(tok, make_enc, sr):
    audio, lengths, names = battery(sr)
    if tok == "semantic_s":
        audio = hubert_host_norm(audio, lengths)
    arrays = {"lengths": lengths, "case_names": np.array(names)}
    for seed in WEIGHT_SEEDS:
        enc = make_enc(seed)
        if tok == "acoustic":
            ids = enc(audio)  # causal stack: mask-free, trailing zeros inert
        else:
            ids = enc(audio, attention_mask=lengths)
        arrays[f"ids_s{seed}"] = np.asarray(ids)
        print(f"  {tok} seed {seed}: ids {arrays[f'ids_s{seed}'].shape}", flush=True)
    np.savez(os.path.join(OUT, f"battery_{tok}.npz"), **arrays)
    print(f"battery_{tok} written", flush=True)


def api_goldens(tok, at=None):
    """Bucket-straddling clips as [1, T] arrays; the 90 s clip through the
    file path so the 30 s chunker actually splits + stitches it."""
    import tempfile

    from audiotoken_tpu import AudioToken, Tokenizers
    from audiotoken_tpu.io.wavfile import write_wav

    if at is None:
        at = AudioToken(Tokenizers[tok], weights="random", precision="highest",
                        seed=0, num_codebooks=16)
    at.load_encoder()
    sr = at.model_sample_rate
    clips = api_clips(sr, at.encoder.buckets)
    arrays = {}
    for name, wav in clips.items():
        if name == "multichunk_90s":
            pcm = (np.clip(wav, -1, 1) * 32767.0).astype(np.int16)[None]
            with tempfile.TemporaryDirectory() as d:
                path = os.path.join(d, "clip.wav")
                write_wav(path, pcm, sr)
                toks = at.encode(path, chunk_size=30.0)
        else:
            toks = at.encode(wav[None].astype(np.float32))
        arrays[f"tokens_{name}"] = np.asarray(toks)
        print(f"  {tok} api {name}: tokens {arrays[f'tokens_{name}'].shape}",
              flush=True)
    np.savez(os.path.join(OUT, f"api_{tok}.npz"), **arrays)
    print(f"api_{tok} written", flush=True)


def main():
    os.makedirs(OUT, exist_ok=True)

    from audiotoken_tpu.configs import (
        AcousticEncoderConfig,
        HubertEncoderConfig,
        Wav2VecBertConfig,
    )
    from audiotoken_tpu.encoders import AcousticEncoder, HubertEncoder, Wav2VecBertEncoder

    battery_goldens(
        "acoustic",
        lambda seed: AcousticEncoder(
            AcousticEncoderConfig(bandwidth=12.0), weights="random",
            precision="highest", seed=seed,
        ),
        24_000,
    )
    battery_goldens(
        "semantic_s",
        lambda seed: HubertEncoder(
            HubertEncoderConfig(), weights="random", precision="highest", seed=seed
        ),
        16_000,
    )
    battery_goldens(
        "semantic_m",
        lambda seed: Wav2VecBertEncoder(
            Wav2VecBertConfig(), weights="random", precision="highest", seed=seed
        ),
        16_000,
    )
    for tok in ("acoustic", "semantic_s", "semantic_m"):
        api_goldens(tok)


if __name__ == "__main__":
    main()
