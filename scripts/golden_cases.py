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


def battery(sr: int, seconds: float = 8.0):
    """(audio [8, T] f32, lengths [8] int32, names) — deterministic."""
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

    audio = np.stack(rows)
    # ragged valid-prefix lengths: full rows, off-by-one, a deep cut, an
    # odd mid-length — every mask-edge class in one batch
    lengths = np.array(
        [T, T - 1, T, T - sr // 3, T // 2 + 17, T, T - 2400, T],
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
