"""Bisect which semantic_m stage's 'high' (bf16x3) rounding flips tokens.

VERDICT r4 #3: 'high' applies bf16x3 to EVERY matmul and flips ~1 frame/400
on the expanded battery (worst 0.997494), which demoted it from the exact
modes; HIGHEST is exact but roofline-capped at ~490x. Nobody measured WHICH
stage's rounding causes the flips. This script sweeps per-stage precision
maps (runtime.precision.StagePrecision through the production
Wav2VecBertEncoder) against the committed CPU-f32 HIGHEST goldens:

  demote sweep   HIGHEST default + ONE stage group at 'high'
                 -> groups whose solo demotion flips tokens ORIGINATE flips
  promote sweep  'high' default + ONE stage group at HIGHEST
                 -> groups whose solo promotion restores 1.000000 are the
                    ONLY origins (if a single group does)
  --mix          measure a named override map (the candidate exact mode)
                 for agreement and, with --rtfx, device RTFx at the 30 s
                 contract (bench.device_rtfx, B=8)

Stage groups (flash-attention TPU path; see StagePrecision.STAGES):
  front = fbank, proj          attn = attn_qkv, attn_kernel, attn_out
  ffn   = ffn_in, ffn_out             (+ attn_scores/pos/pv on the XLA path)
  conv  = conv                 vq   = vq

Agreement is the exactness-row protocol of verify_tpu_parity.py: stability
probes (tone/chirp/dc_offset) and the degenerate silence row are excluded
from the worst-case number (they are noise-valued on every backend).

    JAX_COMPILATION_CACHE_DIR=.jax_cache python -u scripts/bisect_precision.py \
        [--seeds 0,7,13,42] [--sweep demote,promote] [--rtfx] \
        [--mix ffn_in=highest,ffn_out=highest]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
GOLD = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")

from golden_cases import battery  # noqa: E402
from verify_tpu_parity import (  # noqa: E402
    CASE_THRESH_OVERRIDES,
    DEGENERATE_CASES,
    STABILITY_CASES,
)

GROUPS = {
    "front": ("fbank", "proj"),
    "ffn": ("ffn_in", "ffn_out"),
    "attn": ("attn_qkv", "attn_kernel", "attn_scores", "attn_pos",
             "attn_pv", "attn_out"),
    "conv": ("conv",),
    "vq": ("vq",),
}


def run_config(label, default, overrides, seeds, audio, lengths, names,
               golden, rtfx=False):
    """One (default policy, override map) config over the battery x seeds;
    prints per-seed agreement + any sub-1.0 exactness case, returns the
    worst exactness-row agreement."""
    import jax

    from audiotoken_tpu.configs import Wav2VecBertConfig
    from audiotoken_tpu.encoders import Wav2VecBertEncoder

    # exclude stability probes, the degenerate silence row, AND the
    # near-tie-band cases (quiet_i16 flips ~1 frame/399 even at HIGHEST —
    # a VQ near-tie, not a precision signal; it would contaminate every
    # config's flip attribution identically)
    exact_idx = [i for i, n in enumerate(names)
                 if ("semantic_m", n) not in STABILITY_CASES
                 and ("semantic_m", n) not in DEGENERATE_CASES
                 and ("semantic_m", n) not in CASE_THRESH_OVERRIDES]
    worst = 1.0
    rt = None
    for seed in seeds:
        t0 = time.time()
        enc = Wav2VecBertEncoder(
            Wav2VecBertConfig(), weights="random", precision=default,
            seed=seed, stage_overrides=overrides,
        )
        ids = np.asarray(enc(audio, attention_mask=lengths))
        if rtfx and rt is None:
            from bench import device_rtfx

            rt = device_rtfx(enc, 8, 30, enc.config.model_sample_rate)
        del enc
        jax.clear_caches()
        ref = golden[f"ids_s{seed}"]
        flat = ids.reshape(ids.shape[0], -1) == ref.reshape(ref.shape[0], -1)
        per_case = flat.mean(axis=1)
        w = float(per_case[exact_idx].min())
        worst = min(worst, w)
        flipped = [f"{names[i]}={per_case[i]:.6f}"
                   for i in exact_idx if per_case[i] < 1.0]
        line = (f"{label:24s} s{seed:<2d} exactness-worst {w:.6f}"
                f" ({time.time()-t0:.0f}s)")
        if flipped:
            line += "  flips: " + ", ".join(flipped)
        print(line, flush=True)
    tail = f"  device RTFx {rt:.1f}" if rt is not None else ""
    print(f"{label:24s} WORST {worst:.6f}{tail}", flush=True)
    return worst


def parse_mix(s):
    out = {}
    for kv in s.split(","):
        k, v = kv.split("=")
        out[k.strip()] = v.strip()
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--seeds", default="0,7,13,42")
    ap.add_argument("--sweep", default="demote,promote",
                    help="comma subset of {demote,promote,baselines}; "
                         "empty string skips sweeps")
    ap.add_argument("--groups", default=None,
                    help="restrict sweeps to these groups (comma list); "
                         "single stage names also accepted")
    ap.add_argument("--mix", action="append", default=[],
                    help="stage=policy,... override map to evaluate "
                         "('high' default); repeatable")
    ap.add_argument("--rtfx", action="store_true",
                    help="also measure device RTFx (B=8 x 30 s) per config")
    args = ap.parse_args()

    import jax

    print("backend:", jax.default_backend(), flush=True)
    seeds = [int(s) for s in args.seeds.split(",") if s]
    golden = np.load(os.path.join(GOLD, "battery_semantic_m.npz"))
    audio, lengths, names = battery(16_000)
    sweeps = {s for s in args.sweep.split(",") if s}

    if args.groups:
        groups = {}
        for g in args.groups.split(","):
            groups[g] = GROUPS.get(g, (g,))
    else:
        groups = GROUPS

    if "baselines" in sweeps or sweeps & {"demote", "promote"}:
        run_config("baseline highest", "highest", None, seeds,
                   audio, lengths, names, golden, rtfx=args.rtfx)
        run_config("baseline high", "high", None, seeds,
                   audio, lengths, names, golden, rtfx=args.rtfx)

    if "demote" in sweeps:
        print("-- demote sweep: HIGHEST + one group at 'high'", flush=True)
        for gname, stages in groups.items():
            run_config(
                f"demote {gname}", "highest", {s: "high" for s in stages},
                seeds, audio, lengths, names, golden,
            )

    if "promote" in sweeps:
        print("-- promote sweep: 'high' + one group at HIGHEST", flush=True)
        for gname, stages in groups.items():
            run_config(
                f"promote {gname}", "high", {s: "highest" for s in stages},
                seeds, audio, lengths, names, golden, rtfx=args.rtfx,
            )

    for mix in args.mix:
        overrides = parse_mix(mix)
        run_config(f"mix {mix}"[:24], "high", overrides, seeds,
                   audio, lengths, names, golden, rtfx=args.rtfx)


if __name__ == "__main__":
    main()
