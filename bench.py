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
    import os

    import jax

    # persistent compile cache: repeated bench runs skip the ~1 min compile
    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
    except Exception:  # noqa: BLE001
        pass

    from audiotoken_tpu.configs import AcousticEncoderConfig
    from audiotoken_tpu.encoders import AcousticEncoder

    batch = 8
    seconds = 30
    sr = 24_000
    n = batch * [seconds * sr]

    enc = AcousticEncoder(
        config=AcousticEncoderConfig(bandwidth=12.0),  # 16 codebooks
        weights="random",
        precision="highest",  # parity-grade numerics (BASELINE.md)
    )
    rng = np.random.default_rng(0)
    # int16 PCM input (native wav sample format): exact /2^15 scaling on
    # device, half the host->device bytes
    audio = (rng.standard_normal((batch, seconds * sr)) * 6000).astype(np.int16)
    mask = np.ones(audio.shape, np.float32)

    # warmup (compile)
    enc(audio, mask)

    # pipelined throughput: dispatch on the main thread, fetch results on a
    # worker thread — H2D, device compute, and D2H overlap, mirroring
    # runtime/executor.py's corpus pipeline
    import queue
    import threading

    iters = 16

    def run_pass() -> float:
        fetch_q: "queue.Queue" = queue.Queue(maxsize=6)

        def fetcher():
            while True:
                item = fetch_q.get()
                if item is None:
                    return
                np.asarray(item)

        ft = threading.Thread(target=fetcher)
        ft.start()
        t0 = time.perf_counter()
        for _ in range(iters):
            codes, _n = enc.dispatch(audio, mask)
            fetch_q.put(codes)
        fetch_q.put(None)
        ft.join()
        return time.perf_counter() - t0

    # best of two passes: throughput here is bounded by a shared
    # host<->device tunnel whose effective bandwidth varies with ambient
    # load; min-time is the standard de-noising for throughput benches
    dt = min(run_pass(), run_pass())

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
