"""One-shot TPU token-parity verification against the committed CPU goldens.

    JAX_COMPILATION_CACHE_DIR=.jax_cache python -u scripts/verify_tpu_parity.py

Runs the FULL production encoder paths (bucketing, platform-default
kernels) for all three tokenizers over the golden MATRIX (VERDICT r3 #3):
12 audio cases (golden_cases.py) with ragged lengths x 4 weight seeds at
parity-grade 'highest', PLUS the documented fast mode 'high' for the
semantic tokenizers over the same matrix, PLUS the API-level goldens
(bucket-boundary clips + the 90 s multi-chunk file).

Parity contract (measured, per-case — ARCHITECTURE.md "Numerics"):
on CPU the framework is BITWISE equal to the torch reference (test
suite). Across devices (TPU vs CPU f32):

  * EXACTNESS cases — >= 0.9999 agreement per (tokenizer, seed, case).
    Semantic paths measure 1.000000 on every well-posed signal; the
    acoustic path's floor is 0.998 (late-codebook RVQ near-ties: 0-18
    flips / 76,800 ids per seed, all in codebooks >= 12 where the
    residual scale is tiny, relative top-2 margins ~1e-2 —
    scripts/diag_acoustic_flips.py).
  * STABILITY probes — semantic_m tone, chirp, dc_offset. Signals whose
    fbank energy is dominated by rounding-scale components are
    ill-conditioned AT THE TASK LEVEL: for tone/chirp the f32 DFT's
    rounding error at digitally-quiet bins (eps x the dominant bin's
    magnitude) exceeds the true sidelobe energy, so log-mel there is
    noise-valued on EVERY implementation — including the torch
    reference vs itself across BLAS builds (scripts/
    diag_tone_melspec.py: backend sign flips in spec, noise mel
    energies 4 orders above the clamp floor); for dc_offset the 1e-4
    dither is the ONLY in-band energy and per-dim normalization
    amplifies it to O(1), leaving every frame near-tie-prone (measured
    0.995-0.998 at HIGHEST across seeds — 1-2 boundary-margin frames
    per ~400). These cases assert only a catastrophe floor (>= 0.35)
    and are reported, not exactness-gated.

    The round-4 contract claimed "real audio is immune: int16-sourced
    signals carry quantization-noise mel energy >= O(1) everywhere".
    The *_i16 battery rows (VERDICT r4 #1 — the probe signals after
    the production int16 write/read roundtrip,
    golden_cases.int16_roundtrip) TESTED that claim and FALSIFIED its
    boundary (tests/goldens/PARITY_MATRIX_r5_pre.log): going through
    int16 is NOT the immunity criterion. Undithered quantization of a
    (locally) periodic signal is deterministic harmonic distortion,
    not broadband noise — scripts/diag_i16_quant_mechanism.py measures
    quiet-mel-cell amplitude in units of the f32-DFT rounding scale
    (the conditioning statistic): tone 0.56 -> tone_i16 only ~40-60x
    (error spectral concentration 17x, vs 1.1x for TPDF-dithered
    quantization), chirp 0.11 -> chirp_i16 0.088 (a sweep is periodic
    WITHIN each 25 ms analysis frame, so the per-frame error stays
    harmonic). The per-dim normalization then divides by a temporal
    std of that same noise scale, so the normalized cross-backend
    delta stays O(1) per quiet dim — measured tone_i16 flips 3-21% at
    HIGHEST, chirp_i16 ~1 frame/400 (s0). Aperiodic broadband content
    >= 1 LSB IS immune, by 1-4 orders in the same statistic: quiet_i16
    (1e-3 gaussian, ~33 LSB RMS) 9.0e2, dc_offset_i16 1.4e3, noise
    8.8e2, speech-like harmonic 5.0e3 — and dc_offset_i16 measures
    1.000000 at HIGHEST on all 4 seeds while its undithered f32 parent
    flips. Real recordings carry aperiodic mic/room noise >= 1 LSB in
    every frame (that noise is exactly what dithers the quantizer), so
    they sit in the immune class; only digitally-pure periodic
    synthetics do not. Classification is therefore BY MEASURED
    CONDITIONING, not by provenance: semantic_m tone_i16/chirp_i16
    join their parents as stability probes; dc_offset_i16 and
    quiet_i16 stay EXACTNESS-gated for every tokenizer. quiet_i16's
    gate carries a 0.995 near-tie band (CASE_THRESH_OVERRIDES): at
    ~33 LSB the encoder-output scale is tiny, so VQ/RVQ top-2 margins
    compress — measured 1 flip/399 frames (semantic_m s7, runner-up id
    with the smallest margin of the row: scripts/diag_i16_flips.py)
    and 0.9953 (acoustic s42, late-codebook near-ties:
    scripts/diag_acoustic_flips.py) — the same class as the acoustic
    0.998 floor.
  * DEGENERATE probe — semantic_m silence. Normalized silence is the
    all-zero feature sequence; centroid margins are uniformly tiny and
    position-smooth, so a last-ulp cross-device forward difference
    flips ALL frames coherently to the runner-up centroid — the
    outcome is a coin flip per weight seed, binary by construction
    (measured over 4 seeds at HIGHEST: 1.000000, 1.000000, 0.000000,
    1.000000). No agreement floor can separate bug from near-tie here;
    instead the gate asserts BINARINESS (agreement >= 0.9 or <= 0.1):
    a real numerics bug scatters flips across frames, a degenerate
    near-tie flips wholesale. (semantic_s and acoustic silence stay
    exactness-gated — measured exact / above-floor on all seeds.)

Policy gating: 'highest' is the parity grade and is gated for every
tokenizer. 'high' (bf16x3) is gated for semantic_s, where it measures
1.000000 over the full matrix, and REPORT-ONLY for semantic_m: on the
expanded matrix it flips ~1 frame/400 even on well-posed cases (noise
0.997494 s7/s13, harmonic 0.997494 s0), which demotes it from the
documented exactness modes per the round-3 contract ("any sub-1.000000
'high' case demotes"). It remains a measured approximate fast mode.
semantic_m additionally gates 'mixed' (round-5): the per-stage bisect
(scripts/bisect_precision.py, tests/goldens/BISECT_r5.log) localized
every 'high' flip to the fbank front + the in-flash-kernel attention
dots; 'mixed' runs ONLY those at HIGHEST (bf16x3 elsewhere —
runtime/precision.py:W2VBERT_MIXED_OVERRIDES) and restored 1.000000
exactness on all 4 seeds at 525x device RTFx in the bisect harness.
Gating it here extends that evidence to the quiet_i16 near-tie band,
the stability probes and the silence binariness check.

Any gated case below its threshold is printed by name and fails the run.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from golden_cases import WEIGHT_SEEDS, api_clips, battery  # noqa: E402

GOLD = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")
THRESH = 0.9999
ACOUSTIC_THRESH = 0.998  # late-codebook RVQ near-ties (docstring above)
STABILITY_THRESH = 0.35  # catastrophe floor for the stability probes
#: (tokenizer, case) pairs that are stability probes, not exactness cases.
#: The *_i16 members are classified by the measured conditioning statistic
#: (module docstring; diag_i16_quant_mechanism.py), NOT inherited from
#: their f32 parents: dc_offset_i16/quiet_i16 have well-posed conditioning
#: (>= 9e2 x rounding scale) and stay exactness-gated.
STABILITY_CASES = {
    ("semantic_m", "tone"),
    ("semantic_m", "chirp"),
    ("semantic_m", "dc_offset"),
    ("semantic_m", "tone_i16"),
    ("semantic_m", "chirp_i16"),
}
#: (tokenizer, case) pairs with binary wholesale-flip outcomes (docstring)
DEGENERATE_CASES = {("semantic_m", "silence")}
#: (tokenizer, policy) pairs measured and printed but not gated
REPORT_ONLY_POLICIES = {("semantic_m", "high")}
#: per-(tokenizer, case) exactness-gate relaxations with measured,
#: forensically-backed rationale (docstring: quiet-signal near-tie band)
CASE_THRESH_OVERRIDES = {
    ("semantic_m", "quiet_i16"): 0.995,
    ("acoustic", "quiet_i16"): 0.995,
}


def case_thresh(tok: str, case: str) -> float:
    if (tok, case) in STABILITY_CASES:
        return STABILITY_THRESH
    if (tok, case) in CASE_THRESH_OVERRIDES:
        return CASE_THRESH_OVERRIDES[(tok, case)]
    return ACOUSTIC_THRESH if tok == "acoustic" else THRESH


def degenerate_ok(agreement: float) -> bool:
    """Binariness gate: wholesale near-tie flips land at ~0 or ~1;
    scattered partial agreement indicates a real numerics problem."""
    return agreement >= 0.9 or agreement <= 0.1


def check_battery(tok, make_enc, sr, policies):
    """-> ok over seeds x cases for each policy (gated per the contract)."""
    import jax

    from make_goldens import hubert_host_norm  # same norm path

    g = np.load(os.path.join(GOLD, f"battery_{tok}.npz"))
    audio, lengths, names = battery(sr)
    if tok == "semantic_s":
        audio = hubert_host_norm(audio, lengths)
    ok = True
    for pol in policies:
        gated = (tok, pol) not in REPORT_ONLY_POLICIES
        worst = 1.0
        for seed in WEIGHT_SEEDS:
            enc = make_enc(pol, seed)
            if tok == "acoustic":
                ids = np.asarray(enc(audio))
            else:
                ids = np.asarray(enc(audio, attention_mask=lengths))
            # each seed builds fresh params captured as jit constants;
            # drop the executables or HBM fills up by ~seed 17
            # (measured RESOURCE_EXHAUSTED on the full matrix)
            del enc
            jax.clear_caches()
            ref = g[f"ids_s{seed}"]
            flat = ids.reshape(ids.shape[0], -1) == ref.reshape(ref.shape[0], -1)
            per_case = flat.mean(axis=1)
            exact_idx = [i for i in range(len(names))
                         if (tok, names[i]) not in STABILITY_CASES
                         and (tok, names[i]) not in DEGENERATE_CASES]
            worst = min(worst, float(per_case[exact_idx].min()))
            agree = float(flat.mean())
            probes = [
                f"{names[i]}={per_case[i]:.6f}"
                for i in range(len(names))
                if (tok, names[i]) in STABILITY_CASES
                or (tok, names[i]) in DEGENERATE_CASES
            ]
            bad = []
            for i in range(len(names)):
                case = (tok, names[i])
                if case in DEGENERATE_CASES:
                    if not degenerate_ok(float(per_case[i])):
                        bad.append(f"{names[i]}={per_case[i]:.6f} (non-binary)")
                elif per_case[i] < case_thresh(tok, names[i]):
                    bad.append(f"{names[i]}={per_case[i]:.6f}")
            line = f"{tok:10s} [{pol:7s} s{seed:<2d}] agreement {agree:.6f}"
            if probes:
                line += "  probes: " + ", ".join(probes)
            if bad:
                tag = "FAIL cases" if gated else "report-only below-thresh"
                line += f"  {tag}: " + ", ".join(bad)
                if gated:
                    ok = False
            print(line, flush=True)
        tag = "" if gated else "  (report-only)"
        print(
            f"{tok:10s} [{pol:7s}] worst-case exactness agreement "
            f"{worst:.6f}{tag}",
            flush=True,
        )
    return ok


def check_api(tok):
    import jax

    from audiotoken_tpu import AudioToken, Tokenizers

    jax.clear_caches()  # drop the battery's captured-param executables

    g = np.load(os.path.join(GOLD, f"api_{tok}.npz"))
    at = AudioToken(Tokenizers[tok], weights="random", precision="highest",
                    seed=0, num_codebooks=16)
    at.load_encoder()
    sr = at.model_sample_rate
    clips = api_clips(sr, at.encoder.buckets)
    ok = True
    for name, wav in clips.items():
        if name == "multichunk_90s":
            import tempfile

            from audiotoken_tpu.io.wavfile import write_wav

            pcm = (np.clip(wav, -1, 1) * 32767.0).astype(np.int16)[None]
            with tempfile.TemporaryDirectory() as d:
                path = os.path.join(d, "clip.wav")
                write_wav(path, pcm, sr)
                toks = np.asarray(at.encode(path, chunk_size=30.0))
        else:
            toks = np.asarray(at.encode(wav[None].astype(np.float32)))
        ref = g[f"tokens_{name}"]
        agree = float((toks == ref).mean()) if toks.shape == ref.shape else 0.0
        line = f"{tok:10s} [api {name:14s}] agreement {agree:.6f}"
        if toks.shape != ref.shape:
            line += f"  SHAPE {toks.shape} != {ref.shape}"
        if agree < (ACOUSTIC_THRESH if tok == "acoustic" else THRESH):
            ok = False
            line += "  FAIL"
        print(line, flush=True)
    return ok


def main():
    import argparse

    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--only", default=None,
                    choices=["acoustic", "semantic_s", "semantic_m"],
                    help="restrict to one tokenizer (battery + api)")
    args = ap.parse_args()

    import jax

    from audiotoken_tpu.configs import (
        AcousticEncoderConfig,
        HubertEncoderConfig,
        Wav2VecBertConfig,
    )
    from audiotoken_tpu.encoders import AcousticEncoder, HubertEncoder, Wav2VecBertEncoder

    print("backend:", jax.default_backend(), flush=True)
    ok = True

    def want(tok):
        return args.only is None or args.only == tok

    if want("acoustic"):
        ok &= check_battery(
            "acoustic",
            lambda pol, seed: AcousticEncoder(
                AcousticEncoderConfig(bandwidth=12.0), weights="random",
                precision=pol, seed=seed,
            ),
            24_000,
            policies=("highest",),
        )
    # 'high' (bf16x3): gated at exactness for semantic_s (holds 1.000000
    # over the full matrix); measured report-only for semantic_m, where
    # the expanded matrix demoted it (module docstring / VERDICT r3 #3)
    if want("semantic_s"):
        ok &= check_battery(
            "semantic_s",
            lambda pol, seed: HubertEncoder(
                HubertEncoderConfig(), weights="random", precision=pol, seed=seed
            ),
            16_000,
            policies=("highest", "high"),
        )
    if want("semantic_m"):
        ok &= check_battery(
            "semantic_m",
            lambda pol, seed: Wav2VecBertEncoder(
                Wav2VecBertConfig(), weights="random", precision=pol, seed=seed
            ),
            16_000,
            policies=("highest", "mixed", "high"),
        )
    for tok in ("acoustic", "semantic_s", "semantic_m"):
        if want(tok):
            ok &= check_api(tok)

    print("PARITY OK" if ok else "PARITY FAILURE", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
