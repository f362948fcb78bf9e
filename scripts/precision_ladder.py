"""Measured precision ladder: token agreement + device throughput per
precision policy, through the PRODUCTION encoder paths.

For each tokenizer and each policy in {highest, high, default, bfloat16},
reports (a) id agreement vs the committed CPU-f32 goldens, (b) device
RTFx at the 30 s chunk contract. This is the evidence behind offering
"high"/"default" as documented fast modes (runtime/precision.py).

Measurement integrity (ARCHITECTURE.md): distinct random buffers per
iteration; timing syncs by fetching a scalar reduced from the result.

    JAX_COMPILATION_CACHE_DIR=.jax_cache python -u scripts/precision_ladder.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
GOLD = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")

POLICIES = ["highest", "high", "default", "bfloat16"]


from bench import device_rtfx  # noqa: E402 — the ONE device-RTFx helper


def run(name, make_enc, golden, key):
    g = np.load(os.path.join(GOLD, golden))
    for pol in POLICIES:
        t0 = time.time()
        enc = make_enc(pol)
        agree = float((enc(g["audio"]) == g[key]).mean())
        rtfx = device_rtfx(enc, 8, 30, enc.config.model_sample_rate)
        print(
            f"{name:11s} {pol:9s}: agreement {agree:.6f}  device RTFx {rtfx:8.1f}"
            f"  ({time.time()-t0:.0f}s)",
            flush=True,
        )


def main():
    import jax

    from audiotoken_tpu.configs import (
        AcousticEncoderConfig,
        HubertEncoderConfig,
        Wav2VecBertConfig,
    )
    from audiotoken_tpu.encoders import (
        AcousticEncoder,
        HubertEncoder,
        Wav2VecBertEncoder,
    )

    print("backend:", jax.default_backend(), flush=True)
    run(
        "semantic_m",
        lambda pol: Wav2VecBertEncoder(Wav2VecBertConfig(), weights="random",
                                       precision=pol, seed=0),
        "semantic_m.npz", "ids",
    )
    run(
        "semantic_s",
        lambda pol: HubertEncoder(HubertEncoderConfig(), weights="random",
                                  precision=pol, seed=0),
        "semantic_s.npz", "ids",
    )
    run(
        "acoustic",
        lambda pol: AcousticEncoder(AcousticEncoderConfig(bandwidth=12.0),
                                    weights="random", precision=pol, seed=0),
        "acoustic.npz", "codes",
    )


if __name__ == "__main__":
    main()
