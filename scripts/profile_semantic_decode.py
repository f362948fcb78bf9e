"""End-to-end semantic decode at real model sizes (random weights).

Exercises the full 3-stage pipeline (decoder.py:210-243 analog): 12L GPT
KV-cache sampling -> 24L Bark-fine windowed inpainting -> SEANet decode,
and reports per-stage wall time + overall decode real-time factor.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax

    from audiotoken_tpu.decoders import HubertDecoder

    print("backend:", jax.default_backend(), flush=True)
    t0 = time.time()
    dec = HubertDecoder(weights="random", max_new_tokens=256)
    print(f"decoder built {time.time()-t0:.0f}s", flush=True)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 1000, size=100)

    t0 = time.time()
    wav = dec(ids)
    print(f"first decode (incl. compiles): {time.time()-t0:.0f}s, "
          f"wav {wav.shape} = {wav.shape[1]/24000:.2f}s audio", flush=True)

    t0 = time.perf_counter()
    wav = dec(ids, seed=1)
    dt = time.perf_counter() - t0
    secs = wav.shape[1] / 24_000
    print(f"steady decode: {dt:.2f}s for {secs:.2f}s audio "
          f"= {secs/dt:.2f}x real-time", flush=True)


if __name__ == "__main__":
    main()
