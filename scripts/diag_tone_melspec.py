"""Drill into the tone/chirp fbank divergence: which stage, what magnitudes.

diag_chirp_bisect.py showed pre-norm log-mel TPU-vs-CPU max|d| of 3.6-4.8
on tone/chirp (vs 1e-4 on noise), with NO entries near the clamp floor.
Print, for the top-|dlog| cells: the melspec magnitudes on each backend,
the contributing spec (re/im) values at the dominant mel bins, and summary
percentiles of |melspec_t - melspec_c| conditioned on melspec magnitude.

Run on TPU:
    JAX_COMPILATION_CACHE_DIR=.jax_cache python -u scripts/diag_tone_melspec.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from golden_cases import battery, prefix_mask  # noqa: E402


def stages(audio, cfg, precision, device):
    import jax
    import jax.numpy as jnp

    from audiotoken_tpu.nn.fbank import _folded_dft, _frame

    with jax.default_device(device):
        fold, mel = _folded_dft(cfg)
        nbins = cfg.fft_length // 2 + 1
        frames = _frame(jnp.asarray(audio, jnp.float32), cfg.frame_length, cfg.hop_length)
        spec = jnp.einsum("bfl,lk->bfk", frames, jnp.asarray(fold),
                          precision=precision, preferred_element_type=jnp.float32)
        power = spec[..., :nbins] ** 2 + spec[..., nbins:] ** 2
        melspec = jnp.einsum("bfk,km->bfm", power, jnp.asarray(mel),
                             precision=precision, preferred_element_type=jnp.float32)
        return (np.asarray(frames), np.asarray(spec), np.asarray(power),
                np.asarray(melspec), np.asarray(mel))


def main():
    import jax

    from audiotoken_tpu.configs import Wav2VecBertConfig
    from audiotoken_tpu.encoders import Wav2VecBertEncoder

    print("backend:", jax.default_backend(), flush=True)
    audio, lengths, names = battery(16_000)
    cpu = jax.devices("cpu")[0]
    dev = jax.devices()[0]

    enc = Wav2VecBertEncoder(Wav2VecBertConfig(), weights="random",
                             precision="highest", seed=0, quantize=False)
    cfg = enc.fbank_cfg
    prec = enc.policy.matmul_precision
    floor = cfg.mel_floor

    fr_t, sp_t, pw_t, ms_t, mel = stages(audio, cfg, prec, dev)
    fr_c, sp_c, pw_c, ms_c, _ = stages(audio, cfg, prec, cpu)
    print("frames bit-equal:", np.array_equal(fr_t, fr_c), flush=True)

    for b, name in enumerate(names):
        if name not in ("tone", "chirp", "dc_offset", "noise"):
            continue
        lt = np.log(np.maximum(ms_t[b], floor))
        lc = np.log(np.maximum(ms_c[b], floor))
        d = np.abs(lt - lc)
        idx = np.argsort(d.ravel())[::-1][:6]
        print(f"--- {name}: max dlog {d.max():.3f}  "
              f"cells dlog>0.1: {(d > 0.1).sum()}/{d.size}", flush=True)
        for flat in idx:
            f, m = np.unravel_index(flat, d.shape)
            # dominant mel bins for this dim
            w = mel[:, m]
            bins = np.argsort(w)[::-1][:3]
            binstr = ", ".join(
                f"k={k} w={w[k]:.3f} pw_t={pw_t[b, f, k]:.3e} pw_c={pw_c[b, f, k]:.3e}"
                f" re_t={sp_t[b, f, k]:.3e} re_c={sp_c[b, f, k]:.3e}"
                for k in bins if w[k] > 0)
            print(f"  f={f:3d} m={m:2d} ms_t={ms_t[b, f, m]:.3e} "
                  f"ms_c={ms_c[b, f, m]:.3e} dlog={d[f, m]:.3f} | {binstr}",
                  flush=True)
        # spec absolute-difference profile for this case
        ds = np.abs(sp_t[b] - sp_c[b])
        print(f"  spec |t-c|: median {np.median(ds):.2e}  p99 {np.quantile(ds, .99):.2e}"
              f"  max {ds.max():.2e};  |spec_c|: median {np.median(np.abs(sp_c[b])):.2e}"
              f"  max {np.abs(sp_c[b]).max():.2e}", flush=True)


if __name__ == "__main__":
    main()
