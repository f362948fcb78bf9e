"""Per-flip margin forensics for the int16 battery rows (round 5).

diag_semantic_flips.py pools flip margins per seed, and on the seeds
where tone/tone_i16 flip dozens of frames the pooled stats say nothing
about the SINGLE flips observed on the well/better-conditioned i16 rows
(chirp_i16 s0, quiet_i16 s7 — each exactly 1 frame / 399 in the round-5
pre matrix). This script reports, for chosen (seed, case) pairs, every
TPU-vs-golden flip individually: the CPU-side top-2 relative margin at
that frame, whether the TPU id is the CPU runner-up (the pure-near-tie
signature), and the frame's cross-device normed-feature delta — the
evidence needed to classify these rows in the parity contract.

Run on TPU:
    JAX_COMPILATION_CACHE_DIR=.jax_cache python -u scripts/diag_i16_flips.py \
        [--pairs 0:chirp_i16,7:quiet_i16,0:tone_i16]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from golden_cases import battery  # noqa: E402
from diag_semantic_flips import normed_feats_f64  # noqa: E402

GOLD = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--pairs", default="0:chirp_i16,7:quiet_i16",
                    help="comma list of seed:case to forensically dump")
    args = ap.parse_args()

    import jax

    from audiotoken_tpu.configs import Wav2VecBertConfig
    from audiotoken_tpu.encoders import Wav2VecBertEncoder

    print("backend:", jax.default_backend(), flush=True)
    g = np.load(os.path.join(GOLD, "battery_semantic_m.npz"))
    audio, lengths, names = battery(16_000)
    cpu = jax.devices("cpu")[0]
    name_idx = {n: i for i, n in enumerate(names)}

    pairs = []
    for p in args.pairs.split(","):
        s, c = p.split(":")
        pairs.append((int(s), c.strip()))
    seeds = sorted({s for s, _ in pairs})

    for seed in seeds:
        cases = [c for s, c in pairs if s == seed]
        rows = np.array([name_idx[c] for c in cases])
        sub_audio = audio[rows]
        sub_len = lengths[rows]

        enc = Wav2VecBertEncoder(
            Wav2VecBertConfig(), weights="random", precision="highest",
            seed=seed,
        )
        ids = np.asarray(enc(sub_audio, attention_mask=sub_len))[:, 0, :]
        feats_tpu = np.asarray(enc.__class__(
            Wav2VecBertConfig(), weights="random", precision="highest",
            seed=seed, quantize=False,
        )(sub_audio, attention_mask=sub_len))
        with jax.default_device(cpu):
            enc_cpu = Wav2VecBertEncoder(
                Wav2VecBertConfig(), weights="random", precision="highest",
                seed=seed, device=cpu, quantize=False, attn_impl="xla",
            )
            feats_cpu = np.asarray(enc_cpu(sub_audio, attention_mask=sub_len))
        cb = np.asarray(enc.params["codebook"], np.float64)
        c2 = (cb**2).sum(-1)
        fn_t = normed_feats_f64(feats_tpu)
        fn_c = normed_feats_f64(feats_cpu)

        for k, case in enumerate(cases):
            ref = g[f"ids_s{seed}"][name_idx[case], 0, :]
            flips = np.nonzero(ids[k] != ref)[0]
            dmax = float(np.abs(fn_t[k] - fn_c[k]).max())
            print(f"s{seed} {case:14s} flips {len(flips)}/{ids.shape[1]}  "
                  f"feat max|TPU-CPU| {dmax:.2e}", flush=True)
            for t in flips:
                x = fn_c[k, t]
                d = (x**2).sum() - 2.0 * (cb @ x) + c2
                order = np.argsort(d)
                gap = (d[order[1]] - d[order[0]]) / max(abs(d[order[0]]), 1e-12)
                frame_delta = float(np.abs(fn_t[k, t] - fn_c[k, t]).max())
                print(f"    t={t:3d} cpu_margin {gap:.2e}  "
                      f"tpu_id==cpu_rank2: {ids[k, t] == order[1]}  "
                      f"frame max|dfeat| {frame_delta:.2e}", flush=True)
        del enc, enc_cpu, feats_tpu, feats_cpu
        jax.clear_caches()


if __name__ == "__main__":
    main()
