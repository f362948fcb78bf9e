"""Deterministic audio case battery for the parity goldens (VERDICT r3 #3).

The golden npz files in tests/goldens/ store only token ids — the audio is
regenerated bit-exactly from these helpers (seeded numpy, no device math),
so the committed artifacts stay small while the case matrix grows.

Cases (why each is in the battery):
    silence        all-exact-zeros — degenerate norm/log paths
    near_silence   1e-6-scale noise — denormal-adjacent fbank energies
    dc_offset      constant 0.35 + tiny dither — mean-removal paths
    tone           440 Hz sine — single spectral line, long correlations
    chirp          100 Hz -> 0.45*sr sweep — every fbank bin visited
    clipped        hard-clipped noise at +/-1 — saturated codec input
    harmonic       F0-contoured harmonic stack + syllabic envelope —
                   speech-like spectra (correlated, near-tie-prone)
    noise          0.2 * gaussian — the original golden signal
    tone_i16       tone after an int16 write/read roundtrip
    chirp_i16      chirp after an int16 roundtrip
    dc_offset_i16  dc_offset after an int16 roundtrip
    quiet_i16      1e-3 gaussian (quiet-room floor, ~33 LSB RMS) after
                   an int16 roundtrip

The *_i16 rows (VERDICT r4 #1) test the parity contract's central
"real audio is immune" claim ON signals of the kind it is about: every
file-sourced input the framework ever sees went through int16
quantization (io/wavfile.py reads /32768). Round-5 resolution: the test
FALSIFIED the claim's provenance boundary — quantization error of a
(locally) periodic signal is harmonic distortion, not broadband noise,
so tone_i16/chirp_i16 keep rounding-scale quiet mel cells and remain
stability probes on semantic_m, while the aperiodic rows
(dc_offset_i16, quiet_i16 — the class real recordings belong to, since
mic/room noise >= 1 LSB dithers the quantizer) measure 9e2-1e3x above
rounding scale and are EXACTNESS-gated for every tokenizer. Mechanism
numbers: scripts/diag_i16_quant_mechanism.py; classification:
scripts/verify_tpu_parity.py docstring.

Per-row lengths are RAGGED (valid-prefix masks) to exercise mask-edge and
lengths-collapse behavior; API-level clips straddle a bucket boundary and
include one 90 s multi-chunk file (runtime/bucketing.py, api.py chunking).
"""

import numpy as np

CASE_NAMES = (
    "silence",
    "near_silence",
    "dc_offset",
    "tone",
    "chirp",
    "clipped",
    "harmonic",
    "noise",
    "tone_i16",
    "chirp_i16",
    "dc_offset_i16",
    "quiet_i16",
)

#: weight seeds the golden matrix covers (make_goldens / verify_tpu_parity)
WEIGHT_SEEDS = (0, 7, 13, 42)


def _harmonic(t, sr, rng, f0_base=120.0, f0_swing=60.0, n_harm=12):
    """Speech-like signal: pitch-contoured harmonic stack, syllabic
    amplitude envelope, light noise floor."""
    f0 = f0_base + f0_swing * np.sin(2 * np.pi * 0.7 * t)
    phase = 2 * np.pi * np.cumsum(f0) / sr
    sig = np.zeros_like(t)
    for h in range(1, n_harm + 1):
        sig += np.sin(h * phase) / h
    env = 0.5 + 0.5 * np.sin(2 * np.pi * 3.1 * t - 0.5)
    sig = sig / np.max(np.abs(sig))
    return (0.3 * env * sig + 0.01 * rng.standard_normal(t.shape)).astype(np.float32)


def int16_roundtrip(x: np.ndarray) -> np.ndarray:
    """Bit-exact model of the production file path: write_wav's
    round(x*32768) clamp (io/wavfile.py:157) then the reader's /32768
    (io/wavfile.py:77) — what any f32 signal looks like after living in a
    16-bit WAV."""
    q = np.clip(np.round(x.astype(np.float64) * 32768.0), -32768, 32767)
    return (q.astype(np.int16).astype(np.float32) / 32768.0).astype(np.float32)


def battery(sr: int, seconds: float = 8.0):
    """(audio [12, T] f32, lengths [12] int32, names) — deterministic."""
    T = int(round(seconds * sr))
    t = np.arange(T, dtype=np.float64) / sr
    rng = np.random.default_rng(1234)

    rows = []
    rows.append(np.zeros(T, np.float32))                                # silence
    rows.append((1e-6 * rng.standard_normal(T)).astype(np.float32))    # near_silence
    rows.append((0.35 + 1e-4 * rng.standard_normal(T)).astype(np.float32))  # dc
    rows.append((0.5 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32))   # tone
    f1 = 0.45 * sr
    chirp_phase = 2 * np.pi * (100.0 * t + (f1 - 100.0) / (2 * seconds) * t * t)
    rows.append((0.4 * np.sin(chirp_phase)).astype(np.float32))         # chirp
    rows.append(np.clip(3.0 * rng.standard_normal(T), -1, 1).astype(np.float32))  # clipped
    rows.append(_harmonic(t, sr, rng))                                  # harmonic
    rows.append((0.2 * rng.standard_normal(T)).astype(np.float32))      # noise
    # int16-roundtripped probes (module docstring) — derived from the rows
    # above plus ONE fresh draw at the END of the rng stream, so rows 0-7
    # stay bit-identical to the pre-round-5 battery
    rows.append(int16_roundtrip(rows[3]))                               # tone_i16
    rows.append(int16_roundtrip(rows[4]))                               # chirp_i16
    rows.append(int16_roundtrip(rows[2]))                               # dc_offset_i16
    rows.append(int16_roundtrip(
        (1e-3 * rng.standard_normal(T)).astype(np.float32)))            # quiet_i16

    audio = np.stack(rows)
    # ragged valid-prefix lengths: full rows, off-by-one, a deep cut, an
    # odd mid-length — every mask-edge class in one batch (the i16 rows get
    # their own ragged mix so the new cases also cross mask edges)
    lengths = np.array(
        [T, T - 1, T, T - sr // 3, T // 2 + 17, T, T - 2400, T,
         T, T - sr // 5, T // 2 + 41, T - 3],
        np.int32,
    )
    audio = audio * (np.arange(T)[None, :] < lengths[:, None])
    return audio.astype(np.float32), lengths, CASE_NAMES


def prefix_mask(lengths: np.ndarray, T: int) -> np.ndarray:
    """[B] lengths -> [B, T] f32 valid-prefix attention mask."""
    return (np.arange(T)[None, :] < np.asarray(lengths)[:, None]).astype(np.float32)


def api_clips(sr: int, buckets):
    """Single-file clips for the API-level (bucketing + chunking) goldens.

    Returns dict name -> 1-D f32 audio: two lengths straddling a mid-grid
    bucket boundary (just under / just over), plus one 90 s clip that the
    30 s chunker must split and stitch.
    """
    rng = np.random.default_rng(987)
    # pick a boundary in the middle of the grid (avoid first/last)
    edge = buckets[len(buckets) // 2]
    under = int(edge - 7)
    over = int(edge + 13)
    long_T = 90 * sr

    def speechy(n):
        t = np.arange(n, dtype=np.float64) / sr
        return _harmonic(t, sr, rng) * 0.8 + (
            0.05 * rng.standard_normal(n)
        ).astype(np.float32)

    return {
        "bucket_under": speechy(under),
        "bucket_over": speechy(over),
        "multichunk_90s": speechy(long_T),
    }
