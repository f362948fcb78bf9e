"""Stage breakdown of the semantic_s (HuBERT) encoder on device.

Times each stage with the scalar-fetch sync (ARCHITECTURE.md measurement
integrity: on the axon backend block_until_ready can return early, so
every timing fetches a scalar reduced from the result), cycling distinct
random inputs per iteration (relay dedup).

Usage:
    python -u scripts/profile_hubert_stages.py [--batch 8] [--seconds 30]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timed(fn, variants, iters=4, label=""):
    from bench import timed_best  # the one hardened device timer

    t0 = time.time()
    best = timed_best(fn, variants, iters=iters)
    total_s = time.time() - t0
    print(f"{label:28s} {best*1e3:9.2f} ms   (incl. compile {total_s:.1f}s)", flush=True)
    return best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--seconds", type=int, default=30)
    p.add_argument("--full-only", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from audiotoken_tpu.nn.hubert import (
        HubertConfig,
        _conv_extractor,
        _pos_conv,
        _encoder_layer,
        feature_lengths,
        hubert_features,
        init_hubert_params,
    )
    from audiotoken_tpu.ops.lookup import nearest_centroid

    print("backend:", jax.default_backend(), flush=True)
    prec = jax.lax.Precision.HIGHEST
    cfg = HubertConfig()
    rng = np.random.default_rng(0)
    params = jax.device_put(init_hubert_params(rng, cfg))
    codebook = jax.device_put(
        rng.standard_normal((500, cfg.hidden_size)).astype(np.float32)
    )

    B, T = args.batch, args.seconds * 16_000
    Tf = feature_lengths(T, cfg)
    print(f"B={B} T={T} frames={Tf}", flush=True)

    audio_vars = [
        (jax.device_put(rng.standard_normal((B, T)).astype(np.float32)),)
        for _ in range(2)
    ]
    feat_vars = [
        (jax.device_put(rng.standard_normal((B, Tf, 512)).astype(np.float32)),)
        for _ in range(2)
    ]
    hid_vars = [
        (jax.device_put(rng.standard_normal((B, Tf, cfg.hidden_size)).astype(np.float32)),)
        for _ in range(2)
    ]
    jax.block_until_ready([audio_vars, feat_vars, hid_vars])

    if args.full_only:
        _run_full(args, params, codebook, cfg, prec, audio_vars)
        return

    t_conv = timed(
        lambda a: _conv_extractor(params["feature_extractor"], a, cfg, prec),
        audio_vars, label="conv_extractor (7 layers)",
    )

    # per-layer conv costs
    def conv_layer(i, cin):
        def f(x):
            h = jax.lax.conv_general_dilated(
                x, params["feature_extractor"]["convs"][i]["kernel"].astype(x.dtype),
                window_strides=(cfg.conv_stride[i],), padding="VALID",
                dimension_numbers=("NHC", "HIO", "NHC"),
                preferred_element_type=jnp.float32, precision=prec,
            )
            return jax.nn.gelu(h, approximate=False)
        return f

    t_in = T
    for i in range(len(cfg.conv_kernel)):
        cin = 1 if i == 0 else 512
        xs = [
            (jax.device_put(rng.standard_normal((B, t_in, cin)).astype(np.float32)),)
            for _ in range(2)
        ]
        jax.block_until_ready(xs)
        timed(conv_layer(i, cin), xs, label=f"  conv{i} k={cfg.conv_kernel[i]} s={cfg.conv_stride[i]} cin={cin} T={t_in}")
        t_in = (t_in - cfg.conv_kernel[i]) // cfg.conv_stride[i] + 1

    timed(
        lambda h: _pos_conv(params["pos_conv"], h, cfg, prec),
        hid_vars, label="pos_conv (k=128 g=16)",
    )

    def one_layer(h):
        return _encoder_layer(params["layers"][0], h, None, None, cfg, prec)

    timed(one_layer, hid_vars, label="transformer layer x1 (xla)")

    cfg_f = HubertConfig(attn_impl="flash")

    def one_layer_flash(h):
        return _encoder_layer(params["layers"][0], h, None, None, cfg_f, prec)

    timed(one_layer_flash, hid_vars, label="transformer layer x1 (flash)")

    timed(
        lambda h: nearest_centroid(h, codebook),
        hid_vars, label="kmeans lookup (500)",
    )
    _run_full(args, params, codebook, cfg, prec, audio_vars)


def _run_full(args, params, codebook, cfg, prec, audio_vars):
    import jax.numpy as jnp

    from audiotoken_tpu.nn.hubert import HubertConfig, hubert_features
    from audiotoken_tpu.ops.lookup import nearest_centroid

    cfg_f = HubertConfig(attn_impl="flash")

    # params must be a jit ARGUMENT: closing over them inlines 380 MB of
    # constants into the HLO and the remote compiler rejects the request
    # (HTTP 413).
    def full(params, a):
        h = hubert_features(params, a, None, cfg, output_layer=11, precision=prec)
        return nearest_centroid(h, codebook).astype(jnp.int16)

    full_vars = [(params,) + v for v in audio_vars]
    t_full = timed(full, full_vars, label="FULL (xla attn)")

    def full_flash(params, a):
        h = hubert_features(params, a, None, cfg_f, output_layer=11, precision=prec)
        return nearest_centroid(h, codebook).astype(jnp.int16)

    t_ff = timed(full_flash, full_vars, label="FULL (flash attn)")
    audio_s = args.batch * args.seconds
    print(f"device RTFx: xla {audio_s/t_full:.0f}x  flash {audio_s/t_ff:.0f}x", flush=True)


if __name__ == "__main__":
    main()
