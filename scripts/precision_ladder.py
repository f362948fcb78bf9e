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

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
GOLD = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")

POLICIES = ["highest", "high", "default", "bfloat16"]
#: semantic_m also measures the round-5 'mixed' exact mode (bf16x3 with
#: only the flip-originating fbank/attn-kernel stages at HIGHEST —
#: runtime/precision.py:W2VBERT_MIXED_OVERRIDES)
SEMANTIC_M_POLICIES = ["highest", "mixed", "high", "default", "bfloat16"]


from bench import device_rtfx  # noqa: E402 — the ONE device-RTFx helper
from golden_cases import battery  # noqa: E402


def run(name, make_enc, sr, policies=POLICIES):
    """Agreement over the 8-case golden battery (seed-0 weights; the full
    seeds x cases matrix is verify_tpu_parity.py's job) + device RTFx."""
    import jax

    from make_goldens import hubert_host_norm

    from verify_tpu_parity import DEGENERATE_CASES, STABILITY_CASES

    g = np.load(os.path.join(GOLD, f"battery_{name}.npz"))
    audio, lengths, names = battery(sr)
    if name == "semantic_s":
        audio = hubert_host_norm(audio, lengths)
    ref = g["ids_s0"]
    # exactness vs probe split mirrors verify_tpu_parity.py's contract
    # (stability + degenerate cases are reported, not exactness-averaged)
    probe_cases = STABILITY_CASES | DEGENERATE_CASES
    exact_rows = [i for i, n in enumerate(names)
                  if (name, n) not in probe_cases]
    stab_rows = [i for i, n in enumerate(names)
                 if (name, n) in probe_cases]
    for pol in policies:
        t0 = time.time()
        enc = make_enc(pol)
        if name == "acoustic":
            ids = np.asarray(enc(audio))
        else:
            ids = np.asarray(enc(audio, attention_mask=lengths))
        flat = (ids.reshape(ids.shape[0], -1) == ref.reshape(ref.shape[0], -1))
        agree = float(flat[exact_rows].mean())
        stab = f"  probes {float(flat[stab_rows].mean()):.6f}" if stab_rows else ""
        rtfx = device_rtfx(enc, 8, 30, enc.config.model_sample_rate)
        del enc
        jax.clear_caches()  # 12 encoders/run: drop captured-param executables
        print(
            f"{name:11s} {pol:9s}: agreement {agree:.6f}{stab}"
            f"  device RTFx {rtfx:8.1f}  ({time.time()-t0:.0f}s)",
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
        16_000,
        policies=SEMANTIC_M_POLICIES,
    )
    run(
        "semantic_s",
        lambda pol: HubertEncoder(HubertEncoderConfig(), weights="random",
                                  precision=pol, seed=0),
        16_000,
    )
    run(
        "acoustic",
        lambda pol: AcousticEncoder(AcousticEncoderConfig(bandwidth=12.0),
                                    weights="random", precision=pol, seed=0),
        24_000,
    )


if __name__ == "__main__":
    main()
