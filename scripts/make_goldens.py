"""Generate the CPU-f32 golden token files used by the TPU parity checks.

Run on CPU:
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/make_goldens.py

Writes tests/goldens/{acoustic,semantic_m,semantic_s}.npz — deterministic
(seeded random weights + seeded audio), so the files in git can always be
regenerated. TPU checks compare against them via
scripts/profile_acoustic.py --encoder_check / ad-hoc compare scripts.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")


def main():
    os.makedirs(OUT, exist_ok=True)
    rng = np.random.default_rng(0)

    from audiotoken_tpu.configs import (
        AcousticEncoderConfig,
        HubertEncoderConfig,
        Wav2VecBertConfig,
    )
    from audiotoken_tpu.encoders import AcousticEncoder, HubertEncoder, Wav2VecBertEncoder

    audio24 = (rng.standard_normal((2, 240_000)) * 0.2).astype(np.float32)
    enc = AcousticEncoder(
        AcousticEncoderConfig(bandwidth=12.0), weights="random",
        precision="highest", seed=0,
    )
    np.savez(
        os.path.join(OUT, "acoustic.npz"),
        audio=audio24, codes=enc(audio24),
    )
    print("acoustic golden written")

    audio16 = (rng.standard_normal((2, 160_000)) * 0.2).astype(np.float32)
    enc_m = Wav2VecBertEncoder(
        Wav2VecBertConfig(), weights="random", precision="highest", seed=0
    )
    np.savez(os.path.join(OUT, "semantic_m.npz"), audio=audio16, ids=enc_m(audio16))
    print("semantic_m golden written")

    enc_s = HubertEncoder(
        HubertEncoderConfig(), weights="random", precision="highest", seed=0
    )
    norm = enc_s.host_transform(audio16)
    np.savez(os.path.join(OUT, "semantic_s.npz"), audio=norm, ids=enc_s(norm))
    print("semantic_s golden written")


if __name__ == "__main__":
    main()
