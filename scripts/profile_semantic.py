"""Semantic-path profiling: precision agreement + batched throughput.

Params are generated once and shared across precision modes (they're the
same weights; precision only changes the compiled computation).

Usage:
    python scripts/profile_semantic.py --golden g.npz           (CPU)
    python scripts/profile_semantic.py --compare g.npz --sweep  (TPU)
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--golden", default=None)
    p.add_argument("--compare", default=None)
    p.add_argument("--sweep", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from audiotoken_tpu.nn.conformer import W2VBertConfig, init_w2vbert_params, w2vbert_features
    from audiotoken_tpu.nn.fbank import FbankConfig, fbank_features
    from audiotoken_tpu.ops.lookup import nearest_centroid

    print("backend:", jax.default_backend(), flush=True)
    t0 = time.time()
    rng = np.random.default_rng(0)
    model_cfg = W2VBertConfig()
    fbank_cfg = FbankConfig()
    params = init_w2vbert_params(rng, model_cfg)
    codebook = rng.standard_normal((2048, 1024)).astype(np.float32)
    print(f"params built in {time.time()-t0:.0f}s", flush=True)

    def make_fn(precision, dtype):
        prec = {"highest": jax.lax.Precision.HIGHEST,
                "high": jax.lax.Precision.HIGH,
                "default": jax.lax.Precision.DEFAULT}[precision]

        def fn(params, codebook, audio, mask):
            proc = fbank_features(audio, mask, fbank_cfg, pad_to_multiple_of=2,
                                  precision=prec)
            feats = w2vbert_features(
                params, proc["input_features"].astype(dtype),
                proc["attention_mask"], model_cfg, output_layer=19, precision=prec,
            )
            mu = jnp.mean(feats, axis=-1, keepdims=True)
            var = jnp.var(feats, axis=-1, keepdims=True)
            feats = (feats - mu) * jax.lax.rsqrt(var + 1e-5)
            return nearest_centroid(feats.astype(jnp.float32), codebook).astype(jnp.int16)

        return jax.jit(fn)

    params_d = jax.device_put(params)
    codebook_d = jax.device_put(codebook)
    print(f"params on device at {time.time()-t0:.0f}s", flush=True)

    if args.golden:
        audio = (rng.standard_normal((2, 160_000)) * 0.2).astype(np.float32)
        fn = make_fn("highest", jnp.float32)
        ids = np.asarray(fn(params_d, codebook_d, audio, np.ones_like(audio)))
        np.savez(args.golden, ids=ids, audio=audio)
        print("golden written:", ids.shape, flush=True)
        return

    if args.compare:
        g = np.load(args.compare)
        audio, ref = g["audio"], g["ids"]
        mask = np.ones_like(audio)
        for name, dtype in [("highest", jnp.float32), ("high", jnp.float32),
                            ("default", jnp.float32), ("bf16", jnp.bfloat16)]:
            fn = make_fn("default" if name == "bf16" else name, dtype)
            ids = np.asarray(fn(params_d, codebook_d, audio, mask))
            print(f"{name:9s}: agreement {(ids == ref).mean():.6f} "
                  f"({time.time()-t0:.0f}s)", flush=True)

    if args.sweep:
        # measurement integrity (ARCHITECTURE.md): distinct random buffers
        # per iteration (relay dedup) + scalar-fetch completion sync
        # (block_until_ready can return early on the axon backend).
        for name, dtype in [("highest", jnp.float32), ("high", jnp.float32),
                            ("bf16", jnp.bfloat16)]:
            fn = make_fn("default" if name == "bf16" else name, dtype)
            for batch in [8]:
                g = jax.jit(lambda p, c, a, m: jnp.sum(
                    fn(p, c, a, m).astype(jnp.float32)))
                variants = [
                    (rng.standard_normal((batch, 30 * 16_000)) * 0.2).astype(np.float32)
                    for _ in range(3)
                ]
                mask = np.ones_like(variants[0])
                float(g(params_d, codebook_d, variants[0], mask))  # compile
                samples = []
                for i in range(4):
                    a = variants[(i + 1) % len(variants)]
                    tt = time.perf_counter()
                    float(g(params_d, codebook_d, a, mask))
                    samples.append(time.perf_counter() - tt)
                # discard sub-2 ms (relay-dedup) samples per the bench
                # honesty rule (CLAUDE.md)
                honest = [s for s in samples if s >= 2e-3]
                best = min(honest) if honest else max(samples)
                print(f"semantic_m {name:9s} batch={batch:3d}: {best*1e3:7.1f} ms  "
                      f"RTFx {batch*30/best:8.1f}", flush=True)


if __name__ == "__main__":
    main()
