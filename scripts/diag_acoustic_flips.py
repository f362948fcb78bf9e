"""Diagnose TPU-vs-CPU id flips on the acoustic golden battery.

For every flipped id in battery_acoustic.npz, report the codebook LEVEL
and the CPU-side near-tie margin: on CPU (bit-equal to the goldens by
construction) re-run the RVQ per level, and at each flipped (case, cb,
frame) measure gap = (d2 - d1) / d1 between the two nearest centroids of
that level's residual. Near-ties (gap ~ 1e-6) mean the TPU id is an
equally-valid nearest neighbor; large gaps would mean real numeric error.

Run on TPU (it computes TPU ids, then does the margin math on host numpy):
    JAX_COMPILATION_CACHE_DIR=.jax_cache python -u scripts/diag_acoustic_flips.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from golden_cases import WEIGHT_SEEDS, battery  # noqa: E402

GOLD = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")


def main():
    import jax

    from audiotoken_tpu.configs import AcousticEncoderConfig
    from audiotoken_tpu.encoders import AcousticEncoder

    print("backend:", jax.default_backend(), flush=True)
    g = np.load(os.path.join(GOLD, "battery_acoustic.npz"))
    audio, lengths, names = battery(24_000)

    for seed in WEIGHT_SEEDS:
        enc = AcousticEncoder(AcousticEncoderConfig(bandwidth=12.0),
                              weights="random", precision="highest", seed=seed)
        ids = np.asarray(enc(audio))          # device ids
        ref = g[f"ids_s{seed}"]               # CPU golden ids
        flips = np.argwhere(ids != ref)       # [n, 3] (case, cb, frame)
        per_cb = np.bincount(flips[:, 1], minlength=ids.shape[1])
        print(f"seed {seed}: {len(flips)} flips / {ids.size} ids; "
              f"per-codebook {per_cb.tolist()}", flush=True)
        per_case = np.bincount(flips[:, 0], minlength=len(names))
        print("  per-case: " + ", ".join(
            f"{names[i]}={per_case[i]}" for i in range(len(names))
            if per_case[i]), flush=True)
        if len(flips) == 0:
            continue

        # CPU margin analysis: recompute the latents on the CPU backend
        # (scan LSTM + XLA front — the golden-generation configuration),
        # then measure per-flip top-2 distance margins in f64 numpy.
        cbs = np.asarray(enc.params["codebooks"], np.float64)  # [Q, K, D]
        cpu = jax.devices("cpu")[0]
        from audiotoken_tpu.nn.seanet import SeanetConfig, seanet_encode

        cpu_cfg = SeanetConfig(lstm_impl="scan", front_impl="xla")
        with jax.default_device(cpu):
            fwd = jax.jit(lambda p, a: seanet_encode(
                p, a, cpu_cfg, precision=jax.lax.Precision.HIGHEST))
            lat = np.asarray(
                fwd(jax.device_put(enc.params["encoder"], cpu),
                    jax.device_put(audio, cpu))
            ).astype(np.float64)  # [B, T', D]

        res = lat.copy()
        Q = ids.shape[1]
        gaps = []
        for q in range(Q):
            d = (
                (res**2).sum(-1, keepdims=True)
                - 2.0 * res @ cbs[q].T
                + (cbs[q] ** 2).sum(-1)[None, None, :]
            )  # [B, T, K]
            sel = flips[flips[:, 1] == q]
            for b, _, t in sel:
                row = np.sort(d[b, t])
                d1, d2 = row[0], row[1]
                gaps.append((d2 - d1) / max(abs(d1), 1e-12))
            take = ref[:, q, :]  # follow the GOLDEN path for residuals
            res = res - cbs[q][take]
        gaps = np.array(gaps)
        if len(gaps):
            print(f"  near-tie margins (d2-d1)/d1 at flips: "
                  f"median {np.median(gaps):.2e}  p90 {np.quantile(gaps, .9):.2e}"
                  f"  max {gaps.max():.2e}", flush=True)


if __name__ == "__main__":
    main()
