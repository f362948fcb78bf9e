"""Diagnose TPU-vs-CPU id flips on the semantic_m golden battery.

For every flipped id in battery_semantic_m.npz, report the CPU-side
near-tie margin: recompute the conformer features on the CPU backend
(the golden-generation configuration, bit-equal to the goldens by
construction), then at each flipped (case, frame) measure
gap = (d2 - d1) / d1 between the two nearest VQ centroids in f64.
Near-ties (gap ~ 1e-6) mean the TPU id is an equally-valid nearest
neighbor; large gaps would mean real numeric error in the features.

Also reports, per case, the TPU-vs-CPU feature delta (max |Δ| over the
normalized [B, T', 1024] features) and whether each TPU-flipped id is the
CPU-side #2 centroid (the signature of a pure near-tie flip).

Run on TPU (TPU ids + features; margin math on host numpy):
    JAX_COMPILATION_CACHE_DIR=.jax_cache python -u scripts/diag_semantic_flips.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from golden_cases import WEIGHT_SEEDS, battery  # noqa: E402

GOLD = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")


def normed_feats_f64(feats):
    """The encoder's affine-free LayerNorm (encoders.py _forward) in f64."""
    f = np.asarray(feats, np.float64)
    mu = f.mean(-1, keepdims=True)
    var = f.var(-1, keepdims=True)
    return (f - mu) / np.sqrt(var + 1e-5)


def main():
    import jax

    from audiotoken_tpu.configs import Wav2VecBertConfig
    from audiotoken_tpu.encoders import Wav2VecBertEncoder

    print("backend:", jax.default_backend(), flush=True)
    g = np.load(os.path.join(GOLD, "battery_semantic_m.npz"))
    audio, lengths, names = battery(16_000)
    cpu = jax.devices("cpu")[0]

    for seed in WEIGHT_SEEDS:
        enc = Wav2VecBertEncoder(
            Wav2VecBertConfig(), weights="random", precision="highest",
            seed=seed,
        )
        ids = np.asarray(enc(audio, attention_mask=lengths))  # [8, 1, T']
        ref = g[f"ids_s{seed}"]
        flips = np.argwhere(ids[:, 0, :] != ref[:, 0, :])  # [n, 2] (case, t)
        per_case = np.bincount(flips[:, 0], minlength=len(names))
        print(f"seed {seed}: {len(flips)} flips / {ids.size} ids; per-case "
              + ", ".join(f"{n}={c}" for n, c in zip(names, per_case)),
              flush=True)

        # device features (pre-norm) for the feature-delta report
        feats_tpu = Wav2VecBertEncoder(
            Wav2VecBertConfig(), weights="random", precision="highest",
            seed=seed, quantize=False,
        )(audio, attention_mask=lengths)

        # CPU features: golden-generation configuration (XLA attention).
        # default_device so the quantize=False path's jnp.asarray inputs
        # land on CPU next to the params.
        with jax.default_device(cpu):
            enc_cpu = Wav2VecBertEncoder(
                Wav2VecBertConfig(), weights="random", precision="highest",
                seed=seed, device=cpu, quantize=False, attn_impl="xla",
            )
            feats_cpu = enc_cpu(audio, attention_mask=lengths)

        fn_t = normed_feats_f64(feats_tpu)
        fn_c = normed_feats_f64(feats_cpu)
        dmax = np.abs(fn_t - fn_c).max(axis=(1, 2))
        print("  normed-feature max|TPU-CPU| per case: "
              + ", ".join(f"{n}={d:.2e}" for n, d in zip(names, dmax)),
              flush=True)

        if len(flips) == 0:
            continue
        cb = np.asarray(enc.params["codebook"], np.float64)  # [C, D]
        c2 = (cb**2).sum(-1)
        gaps, is_rank2 = [], 0
        for b, t in flips:
            x = fn_c[b, t]
            d = (x**2).sum() - 2.0 * (cb @ x) + c2
            order = np.argsort(d)
            d1, d2 = d[order[0]], d[order[1]]
            gaps.append((d2 - d1) / max(abs(d1), 1e-12))
            if ids[b, 0, t] == order[1] or ids[b, 0, t] == order[0]:
                is_rank2 += 1
        gaps = np.array(gaps)
        print(f"  CPU top-2 margins at flips: median {np.median(gaps):.2e}  "
              f"p90 {np.quantile(gaps, .9):.2e}  max {gaps.max():.2e}; "
              f"TPU id in CPU top-2 at {is_rank2}/{len(flips)} flips",
              flush=True)

        # context: how near-tie-dense is each case overall? (p10 margin
        # over ALL frames, not just flips)
        for b, name in enumerate(names):
            x = fn_c[b]  # [T', D]
            d = (x**2).sum(-1, keepdims=True) - 2.0 * (x @ cb.T) + c2[None]
            part = np.partition(d, 1, axis=-1)
            g2 = (part[:, 1] - part[:, 0]) / np.maximum(np.abs(part[:, 0]), 1e-12)
            print(f"    {name:12s} all-frame margin p10 {np.quantile(g2, .1):.2e}"
                  f"  median {np.median(g2):.2e}", flush=True)


if __name__ == "__main__":
    main()
