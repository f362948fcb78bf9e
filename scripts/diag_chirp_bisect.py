"""Localize the TPU-vs-CPU semantic_m divergence on the chirp battery case.

scripts/diag_fbank_conditioning.py proved chirp is NOT a normalization
conditioning problem (1.000000 id agreement between f32 and f64 variants
of the normalization on identical pre-norm input), yet chirp flips 12-181
ids TPU-vs-CPU with conformer-output divergence ~0.27. This script
bisects by stage, per battery case:

  1. fbank PRE-norm log-mel: max|TPU-CPU| and the count of (frame, dim)
     entries within a relative band of the mel_floor clamp (log is
     Lipschitz-unbounded at the floor boundary: melspec entries within
     backend-noise of the floor produce O(delta/floor) log differences).
  2. fbank POST-norm stacked features: max|TPU-CPU|.
  3. conformer output (pre-VQ, f64-LN normalized): max|TPU-CPU|.

If (1)/(2) are already large on chirp, the noise enters at the log-floor
boundary and the conformer merely amplifies; if they are noise-level
(~1e-6) the divergence is conformer-internal.

Run on TPU:
    JAX_COMPILATION_CACHE_DIR=.jax_cache python -u scripts/diag_chirp_bisect.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from golden_cases import battery, prefix_mask  # noqa: E402


def fbank_stages(audio, mask, cfg, precision, device):
    """(pre-norm log-mel [B,F,M], post-norm stacked [B,F',M*s], fmask) on
    the given device — replicates nn/fbank.py fbank_features stages."""
    import jax
    import jax.numpy as jnp

    from audiotoken_tpu.nn.fbank import _folded_dft, _frame, fbank_features

    with jax.default_device(device):
        fold, mel = _folded_dft(cfg)
        nbins = cfg.fft_length // 2 + 1
        frames = _frame(jnp.asarray(audio, jnp.float32), cfg.frame_length, cfg.hop_length)
        spec = jnp.einsum("bfl,lk->bfk", frames, jnp.asarray(fold),
                          precision=precision, preferred_element_type=jnp.float32)
        power = spec[..., :nbins] ** 2 + spec[..., nbins:] ** 2
        melspec = jnp.einsum("bfk,km->bfm", power, jnp.asarray(mel),
                             precision=precision, preferred_element_type=jnp.float32)
        pre = jnp.log(jnp.maximum(melspec, cfg.mel_floor))
        out = fbank_features(jnp.asarray(audio), jnp.asarray(mask), cfg,
                             precision=precision)
        return (np.asarray(melspec), np.asarray(pre),
                np.asarray(out["input_features"]),
                np.asarray(out["attention_mask"]))


def main():
    import jax

    from audiotoken_tpu.configs import Wav2VecBertConfig
    from audiotoken_tpu.encoders import Wav2VecBertEncoder

    print("backend:", jax.default_backend(), flush=True)
    audio, lengths, names = battery(16_000)
    T = audio.shape[-1]
    mask = prefix_mask(lengths, T)
    cpu = jax.devices("cpu")[0]
    dev = jax.devices()[0]

    enc = Wav2VecBertEncoder(Wav2VecBertConfig(), weights="random",
                             precision="highest", seed=0, quantize=False)
    cfg = enc.fbank_cfg
    prec = enc.policy.matmul_precision

    mel_t, pre_t, post_t, am = fbank_stages(audio, mask, cfg, prec, dev)
    mel_c, pre_c, post_c, am_c = fbank_stages(audio, mask, cfg, prec, cpu)
    assert np.array_equal(am, am_c)

    floor = cfg.mel_floor
    print(f"mel_floor {floor:.4e}", flush=True)
    for b, name in enumerate(names):
        dpre = np.abs(pre_t[b] - pre_c[b]).max()
        dpost = np.abs(post_t[b] - post_c[b]).max()
        # entries whose CPU melspec sits within 0.1% of the clamp floor
        # (either side) — the log-boundary-sensitive population
        m = mel_c[b]
        nboundary = int(((m > floor * 0.999) & (m < floor * 1.001)).sum())
        nfloored = int((m <= floor).sum())
        print(f"{name:12s} pre-norm max|d| {dpre:.3e}  post-norm max|d| {dpost:.3e}"
              f"  floored {nfloored}/{m.size}  boundary(+-0.1%) {nboundary}",
              flush=True)

    # stage 3: conformer output under f64 LN (the VQ input)
    feats_t = np.asarray(enc(audio, attention_mask=lengths), np.float64)
    with jax.default_device(cpu):
        enc_c = Wav2VecBertEncoder(Wav2VecBertConfig(), weights="random",
                                   precision="highest", seed=0, device=cpu,
                                   quantize=False, attn_impl="xla")
        feats_c = np.asarray(enc_c(audio, attention_mask=lengths), np.float64)

    def ln(f):
        mu = f.mean(-1, keepdims=True)
        v = f.var(-1, keepdims=True)
        return (f - mu) / np.sqrt(v + 1e-5)

    dn = np.abs(ln(feats_t) - ln(feats_c)).max(axis=(1, 2))
    print("conformer-out normed max|TPU-CPU| per case: "
          + ", ".join(f"{n}={d:.2e}" for n, d in zip(names, dn)), flush=True)


if __name__ == "__main__":
    main()
