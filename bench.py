"""Benchmark: acoustic tokenization throughput (RTFx) on one chip.

Measures the BASELINE.md primary metric — RTFx = audio-seconds tokenized
per wall-second per chip — for the acoustic (EnCodec SEANet + 16-codebook
RVQ) encode path on synthetic 30 s segments, the `encode_batch_files`
device hot loop (reference core.py:271-276). Weights are random (RTFx is
weight-independent); token parity is covered by the test suite.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is relative to the BASELINE.md north star of 500x real-time
per chip.
"""

import json
import time

import numpy as np


def main():
    import jax

    from audiotoken_tpu.configs import AcousticEncoderConfig
    from audiotoken_tpu.encoders import AcousticEncoder

    batch = 8
    seconds = 30
    sr = 24_000
    n = batch * [seconds * sr]

    enc = AcousticEncoder(
        config=AcousticEncoderConfig(bandwidth=12.0),  # 16 codebooks
        weights="random",
        precision="default",
    )
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal((batch, seconds * sr)) * 0.2).astype(np.float32)
    mask = np.ones_like(audio)

    # warmup (compile)
    enc(audio, mask)

    iters = 8
    t0 = time.perf_counter()
    for _ in range(iters):
        out = enc(audio, mask)
    dt = time.perf_counter() - t0

    audio_seconds = iters * batch * seconds
    rtfx = audio_seconds / dt
    print(
        json.dumps(
            {
                "metric": "acoustic_encode_rtfx_per_chip",
                "value": round(rtfx, 2),
                "unit": "audio_seconds/wall_second/chip",
                "vs_baseline": round(rtfx / 500.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
