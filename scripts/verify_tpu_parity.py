"""One-shot TPU token-parity verification against the committed CPU goldens.

    JAX_COMPILATION_CACHE_DIR=.jax_cache python scripts/verify_tpu_parity.py

Runs the FULL production encoder paths (bucketing, platform-default
kernels) for all three tokenizers and reports agreement vs
tests/goldens/*.npz.

Parity contract: on CPU the framework is BITWISE equal to the torch
reference (test suite). Across devices (TPU vs CPU f32), ids agree except
at exact distance near-ties, where either nearest neighbor is equally
valid — measured >= 99.99% (typically 100.000%) per tokenizer. The check
passes at >= 0.9999 agreement and prints the exact numbers.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
GOLD = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")


def main():
    import jax

    from audiotoken_tpu.configs import (
        AcousticEncoderConfig,
        HubertEncoderConfig,
        Wav2VecBertConfig,
    )
    from audiotoken_tpu.encoders import AcousticEncoder, HubertEncoder, Wav2VecBertEncoder

    print("backend:", jax.default_backend(), flush=True)
    ok = True

    g = np.load(os.path.join(GOLD, "acoustic.npz"))
    enc = AcousticEncoder(AcousticEncoderConfig(bandwidth=12.0), weights="random",
                          precision="highest", seed=0)
    agree = float((enc(g["audio"]) == g["codes"]).mean())
    print(f"acoustic   agreement: {agree:.6f}", flush=True)
    ok &= agree >= 0.9999

    g = np.load(os.path.join(GOLD, "semantic_m.npz"))
    enc = Wav2VecBertEncoder(Wav2VecBertConfig(), weights="random",
                             precision="highest", seed=0)
    agree = float((enc(g["audio"]) == g["ids"]).mean())
    print(f"semantic_m agreement: {agree:.6f}", flush=True)
    ok &= agree >= 0.9999

    g = np.load(os.path.join(GOLD, "semantic_s.npz"))
    enc = HubertEncoder(HubertEncoderConfig(), weights="random",
                        precision="highest", seed=0)
    agree = float((enc(g["audio"]) == g["ids"]).mean())
    print(f"semantic_s agreement: {agree:.6f}", flush=True)
    ok &= agree >= 0.9999

    # second weight seed (same shapes -> cached compiles): parity must not
    # be an artifact of one particular random draw
    g = np.load(os.path.join(GOLD, "acoustic_s7.npz"))
    enc = AcousticEncoder(AcousticEncoderConfig(bandwidth=12.0), weights="random",
                          precision="highest", seed=7)
    agree = float((enc(g["audio"]) == g["codes"]).mean())
    print(f"acoustic[s7] agreement: {agree:.6f}", flush=True)
    ok &= agree >= 0.9999

    g = np.load(os.path.join(GOLD, "semantic_m_s7.npz"))
    enc = Wav2VecBertEncoder(Wav2VecBertConfig(), weights="random",
                             precision="highest", seed=7)
    agree = float((enc(g["audio"]) == g["ids"]).mean())
    print(f"semantic_m[s7] agreement: {agree:.6f}", flush=True)
    ok &= agree >= 0.9999

    # the 'high' (bf16x3) fast mode's advertised claim for the semantic
    # tokenizers (ARCHITECTURE.md precision ladder): full golden agreement
    g = np.load(os.path.join(GOLD, "semantic_m.npz"))
    enc = Wav2VecBertEncoder(Wav2VecBertConfig(), weights="random",
                             precision="high", seed=0)
    agree = float((enc(g["audio"]) == g["ids"]).mean())
    print(f"semantic_m[high] agreement: {agree:.6f}", flush=True)
    ok &= agree >= 0.9999

    g = np.load(os.path.join(GOLD, "semantic_s.npz"))
    enc = HubertEncoder(HubertEncoderConfig(), weights="random",
                        precision="high", seed=0)
    agree = float((enc(g["audio"]) == g["ids"]).mean())
    print(f"semantic_s[high] agreement: {agree:.6f}", flush=True)
    ok &= agree >= 0.9999

    # 'high' on the second weight seed too: the >=500x fast-mode claim
    # must not be an artifact of one random draw
    g = np.load(os.path.join(GOLD, "semantic_m_s7.npz"))
    enc = Wav2VecBertEncoder(Wav2VecBertConfig(), weights="random",
                             precision="high", seed=7)
    agree = float((enc(g["audio"]) == g["ids"]).mean())
    print(f"semantic_m[high,s7] agreement: {agree:.6f}", flush=True)
    ok &= agree >= 0.9999

    print("PARITY OK" if ok else "PARITY FAILURE", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
