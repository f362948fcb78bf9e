"""Why int16 quantization does NOT rescue pure periodic probes (round 5).

The round-4 parity contract claimed "real audio is immune: int16-sourced
signals carry quantization-noise mel energy >= O(1) everywhere". The
round-5 pre matrix (tests/goldens/PARITY_MATRIX_r5_pre.log) falsified
that for tone_i16: the undithered quantization error of a PERIODIC
signal is deterministic harmonic distortion — spectral lines at
harmonics of the tone — not broadband noise, so mel bins between
harmonics stay at the f32-DFT rounding scale and remain noise-valued
across backends exactly like the float32 parent.

This script measures, on CPU with plain numpy at f64 (no JAX), for each
battery row plus a dithered-quantization candidate row:

  1. cond_p01 / cond_min: the 1st-percentile / min over (frame, mel
     cell) of   sqrt(melspec) / (eps_f32 * dominant_bin_amplitude)
     — the quiet-cell amplitude in units of the f32 DFT rounding scale.
     Cells O(1) in this unit flip sign between backends (the round-4
     diag_tone_melspec finding); rows whose min is >> 1e2 are immune.
  2. harmonic concentration of the quantization error e = q(x) - x:
     max/median PSD bin ratio. Lines (periodic error) give 1e3-1e6;
     broadband (dithered / aperiodic) gives O(10).

Prediction (which the numbers below the run confirm or kill):
  tone_i16 cond ~ tone cond (both rounding-valued)  -> stability probe
  tone_dith_i16 (tone + 1-LSB TPDF dither, the correct model of any
  real recording chain: mic/preamp noise >= LSB always dithers the
  quantizer) cond >> 1e2                            -> exactness-gated

Run:  python -u scripts/diag_i16_quant_mechanism.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from golden_cases import battery, int16_roundtrip  # noqa: E402

SR = 16_000
EPS = np.finfo(np.float32).eps


def frames_of(x, frame_length=400, hop=160):
    n = 1 + (len(x) - frame_length) // hop
    idx = np.arange(frame_length)[None, :] + hop * np.arange(n)[:, None]
    return x[idx]


def fbank_f64(x):
    """Kaldi-style power-spec + mel, all f64 (the 'true' values the f32
    pipeline approximates). Mirrors nn/fbank.py constants."""
    fr = frames_of(np.asarray(x, np.float64))
    fr = fr - fr.mean(axis=1, keepdims=True)  # remove_dc_offset
    fr = np.concatenate([fr[:, :1], fr[:, 1:] - 0.97 * fr[:, :-1]], axis=1)
    win = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(400) / 399)  # periodic=False
    fr = fr * win
    spec = np.fft.rfft(fr, n=512, axis=1)
    amp = np.abs(spec)
    power = amp**2
    from audiotoken_tpu.nn.fbank import FbankConfig, _mel_filter_bank

    mel = _mel_filter_bank(FbankConfig())  # [257, 80]
    melspec = power @ mel
    return amp, melspec


def conditioning(x):
    amp, melspec = fbank_f64(x)
    dom = amp.max(axis=1, keepdims=True)  # dominant bin per frame
    # quiet-cell amplitude in rounding-scale units (guard exact zeros)
    cell_amp = np.sqrt(np.maximum(melspec, 0.0))
    unit = cell_amp / np.maximum(EPS * dom, 1e-300)
    return float(np.percentile(unit, 1)), float(unit.min())


def err_concentration(x, q):
    e = np.asarray(q, np.float64) - np.asarray(x, np.float64)
    if not e.any():
        return float("nan")
    fr = frames_of(e)
    win = np.hanning(400)
    psd = (np.abs(np.fft.rfft(fr * win, n=512, axis=1)) ** 2).mean(axis=0)
    return float(psd.max() / np.median(psd))


def tpdf_dither_roundtrip(x, rng):
    """Quantize with 1-LSB triangular (TPDF) dither — what any physical
    recording chain does implicitly (analog noise floor >= 1 LSB)."""
    lsb = 1.0 / 32768.0
    d = (rng.random(x.shape) - rng.random(x.shape)) * lsb
    return int16_roundtrip(np.asarray(x, np.float64) + d)


def main():
    audio, lengths, names = battery(SR)
    rows = {n: audio[i][: lengths[i]] for i, n in enumerate(names)}
    t = np.arange(8 * SR, dtype=np.float64) / SR
    tone = (0.5 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
    rng = np.random.default_rng(555)
    rows["tone_dith_i16"] = tpdf_dither_roundtrip(tone, rng)

    print(f"{'case':16s} {'cond_p01':>12s} {'cond_min':>12s}   (flip-prone if O(1))")
    for n in ("tone", "tone_i16", "tone_dith_i16", "chirp", "chirp_i16",
              "dc_offset", "dc_offset_i16", "quiet_i16", "noise", "harmonic"):
        p01, mn = conditioning(rows[n])
        print(f"{n:16s} {p01:12.3e} {mn:12.3e}", flush=True)

    print("\nquantization-error spectral concentration (max/median PSD):")
    for n, (x, q) in {
        "tone_i16": (tone, rows["tone_i16"]),
        "tone_dith_i16": (tone, rows["tone_dith_i16"]),
        "chirp_i16": (rows["chirp"], rows["chirp_i16"][: len(rows["chirp"])]),
    }.items():
        print(f"  {n:16s} {err_concentration(x[: len(q)], q):12.3e}", flush=True)


if __name__ == "__main__":
    main()
