"""Acoustic-path profiling on the current JAX backend.

Usage:
    python scripts/profile_acoustic.py --golden out.npz   # write CPU golden
    python scripts/profile_acoustic.py --compare out.npz  # TPU run + compare

Reports per-stage times (SEANet conv stack / LSTM / RVQ), RTFx across
precision policies and batch sizes, and token agreement vs the golden.
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def make_inputs(batch, seconds=30, sr=24_000, seed=0):
    rng = np.random.default_rng(seed)
    audio = (rng.standard_normal((batch, seconds * sr)) * 0.2).astype(np.float32)
    return audio


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--golden", default=None, help="write golden tokens (CPU)")
    p.add_argument("--compare", default=None, help="compare against golden")
    p.add_argument("--stages", action="store_true")
    p.add_argument("--sweep", action="store_true")
    p.add_argument("--encoder_check", default=None,
                   help="golden npz; run the full AcousticEncoder path")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from audiotoken_tpu.nn.rvq import RVQConfig, rvq_encode
    from audiotoken_tpu.nn.seanet import SeanetConfig, seanet_encode
    from audiotoken_tpu.weights import get_acoustic_params

    print("backend:", jax.default_backend(), jax.devices())
    params = get_acoustic_params("random", seed=0)
    params = {"encoder": params["encoder"], "codebooks": params["codebooks"]}
    cfg = SeanetConfig()

    if args.golden:
        audio = make_inputs(2, seconds=10)
        z = seanet_encode(params["encoder"], jnp.asarray(audio), cfg)
        codes = rvq_encode(params["codebooks"], z, 16)
        np.savez(args.golden, codes=np.asarray(codes), audio=audio)
        print("golden written:", np.asarray(codes).shape)
        return

    if args.compare:
        g = np.load(args.compare)
        audio, ref = g["audio"], g["codes"]
        for prec_name, prec in [
            ("HIGHEST", jax.lax.Precision.HIGHEST),
            ("DEFAULT", jax.lax.Precision.DEFAULT),
        ]:
            z = seanet_encode(params["encoder"], jnp.asarray(audio), cfg, precision=prec)
            codes = np.asarray(rvq_encode(params["codebooks"], z, 16, precision=prec))
            agree = (codes == ref).mean()
            per_cb = (codes == ref).mean(axis=(0, 2))
            print(f"{prec_name}: agreement {agree:.6f}  per-codebook {np.round(per_cb, 4)}")
        # bf16 end-to-end
        z = seanet_encode(
            params["encoder"], jnp.asarray(audio, jnp.bfloat16), cfg,
            precision=jax.lax.Precision.DEFAULT,
        )
        codes = np.asarray(rvq_encode(params["codebooks"], z, 16))
        print(f"bf16:    agreement {(codes == ref).mean():.6f}")

    if args.stages:
        audio = jnp.asarray(make_inputs(8))
        enc_fn = jax.jit(lambda p, a: seanet_encode(p, a, cfg))
        z = jax.block_until_ready(enc_fn(params["encoder"], audio))
        rvq_fn = jax.jit(lambda c, z: rvq_encode(c, z, 16))
        jax.block_until_ready(rvq_fn(params["codebooks"], z))

        def t(fn, *a, iters=5):
            jax.block_until_ready(fn(*a))
            t0 = time.perf_counter()
            for _ in range(iters):
                jax.block_until_ready(fn(*a))
            return (time.perf_counter() - t0) / iters

        t_enc = t(enc_fn, params["encoder"], audio)
        t_rvq = t(rvq_fn, params["codebooks"], z)

        # LSTM in isolation (input shaped like the bottleneck)
        from audiotoken_tpu.nn.seanet import lstm_skip

        h = jnp.asarray(np.random.default_rng(0).standard_normal(
            (8, z.shape[1], 512)).astype(np.float32) * 0.1)
        lstm_fn = jax.jit(lambda p, x: lstm_skip(p, x, jax.lax.Precision.HIGHEST))
        t_lstm = t(lstm_fn, params["encoder"]["lstm"], h)
        print(f"stages (batch 8 x 30 s): seanet_encode {t_enc*1e3:.1f} ms "
              f"(lstm alone {t_lstm*1e3:.1f} ms), rvq {t_rvq*1e3:.1f} ms")

    if args.encoder_check:
        # Full AcousticEncoder path with platform defaults (pallas RVQ +
        # pallas LSTM on TPU, bucketing, int16) vs the CPU golden.
        from audiotoken_tpu.configs import AcousticEncoderConfig
        from audiotoken_tpu.encoders import AcousticEncoder

        g = np.load(args.encoder_check)
        audio, ref = g["audio"], g["codes"]
        enc = AcousticEncoder(AcousticEncoderConfig(bandwidth=12.0),
                              weights="random", precision="highest")
        print("pallas rvq:", enc.use_pallas, "lstm:", enc.seanet_cfg.lstm_impl,
              flush=True)
        codes = enc(audio)
        print(f"encoder path agreement: {(codes == ref).mean():.6f}", flush=True)
        pcm = np.clip(audio * 32768.0, -32768, 32767).astype(np.int16)
        # int16 golden equivalence only holds if audio was int16-exact; here
        # it's synthetic f32, so just check shapes run
        codes16 = enc(pcm)
        print("int16 path ran:", codes16.shape, flush=True)

        t0 = time.perf_counter()
        iters = 6
        big = np.tile(audio, (4, 3))[:, : 30 * 24_000]
        mask = np.ones_like(big)
        enc(big, mask)
        t0 = time.perf_counter()
        for _ in range(iters):
            enc(big, mask)
        dt = (time.perf_counter() - t0) / iters
        print(f"batch8x30s sync RTFx: {8*30/dt:.1f}", flush=True)

    if args.sweep:
        from audiotoken_tpu.configs import AcousticEncoderConfig
        from audiotoken_tpu.encoders import AcousticEncoder

        for precision in ["highest", "default", "bfloat16"]:
            for batch in [8, 32]:
                enc = AcousticEncoder(
                    AcousticEncoderConfig(bandwidth=12.0),
                    weights="random", precision=precision,
                )
                audio = make_inputs(batch)
                mask = np.ones_like(audio)
                enc(audio, mask)
                t0 = time.perf_counter()
                iters = 6
                for _ in range(iters):
                    enc(audio, mask)
                dt = (time.perf_counter() - t0) / iters
                rtfx = batch * 30 / dt
                print(f"precision={precision:9s} batch={batch:3d}: "
                      f"{dt*1e3:7.1f} ms/batch  RTFx {rtfx:8.1f}")


if __name__ == "__main__":
    main()
