"""Per-component device timings of the w2v-BERT conformer block.

Finds where semantic_m's gap to the matmul roofline lives: FLOP math says
19 blocks at B=8 x 30 s are ~12.5 TFLOP — ~200 ms at the HIGH (bf16x3)
matmul rate — but the full encoder measures ~650 ms. Each component is
timed with the scalar-fetch sync over distinct input buffers
(ARCHITECTURE.md measurement integrity).

    JAX_COMPILATION_CACHE_DIR=.jax_cache python -u scripts/profile_conformer_stages.py
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timed(fn, variants, label, iters=4):
    from bench import timed_best  # the one hardened device timer

    t0 = time.time()
    best = timed_best(fn, variants, iters=iters)
    total_s = time.time() - t0
    print(f"{label:36s} {best*1e3:9.2f} ms   (incl. compile {total_s:.1f}s)", flush=True)
    return best


def timed_chain(fn, variants, label, chain=16, iters=3):
    """Amortized per-application time of a shape-preserving ``fn``.

    Chains ``chain`` dependent applications inside ONE jitted call and
    fetches a single scalar, so the tunnel-RTT sync cost (tens of ms
    under ambient relay load) is paid once per ``chain`` applications
    instead of once per application.  The iterations form a data-
    dependent chain (each consumes the previous output), so XLA cannot
    CSE them and the relay cannot dedupe them."""
    import jax
    import jax.numpy as jnp

    def chained(h):
        def body(_, x):
            return fn(x) * 0.999  # keep magnitudes bounded over the chain
        return jnp.sum(jax.lax.fori_loop(0, chain, body, h).astype(jnp.float32))

    g = jax.jit(chained)
    t0 = time.time()
    float(g(*variants[0]))  # compile
    compile_s = time.time() - t0
    samples = []
    for i in range(iters):
        args = variants[(i + 1) % len(variants)]
        t0 = time.perf_counter()
        float(g(*args))
        samples.append(time.perf_counter() - t0)
    best = min(samples) / chain
    print(f"{label:36s} {best*1e3:9.2f} ms/app  (chain {chain}, compile {compile_s:.1f}s)",
          flush=True)
    return best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--frames", type=int, default=1500)
    p.add_argument("--precision", default="high", choices=["high", "highest"])
    p.add_argument("--chain", type=int, default=0,
                   help="amortize sync cost over N chained applications")
    args = p.parse_args()

    import jax

    from audiotoken_tpu.nn.conformer import (
        W2VBertConfig,
        _conformer_block,
        _conv_module,
        _ffn,
        _layer_norm,
        _rel_key_attention,
        init_w2vbert_params,
    )

    print("backend:", jax.default_backend(), "precision:", args.precision, flush=True)
    prec = {"high": jax.lax.Precision.HIGH,
            "highest": jax.lax.Precision.HIGHEST}[args.precision]
    cfg = W2VBertConfig(attn_impl="flash" if jax.default_backend() == "tpu" else "xla")
    cfg_x = W2VBertConfig(attn_impl="xla")
    rng = np.random.default_rng(0)
    params = jax.device_put(init_w2vbert_params(rng, cfg))
    layer = params["layers"][0]

    B, T, H = args.batch, args.frames, cfg.hidden_size
    hid_vars = [
        (jax.device_put((rng.standard_normal((B, T, H)) * 0.3).astype(np.float32)),)
        for _ in range(2)
    ]
    jax.block_until_ready(hid_vars)
    fmask = jax.device_put(np.ones((B, T), np.float32))

    tm = ((lambda fn, v, label: timed_chain(fn, v, label, chain=args.chain))
          if args.chain else timed)
    tm(lambda h: _layer_norm(layer["ffn1_layer_norm"], h, cfg.layer_norm_eps),
       hid_vars, "layer_norm x1")
    tm(lambda h: _ffn(layer["ffn1"], h, cfg, prec), hid_vars, "ffn (1024->4096->1024)")
    tm(lambda h: _rel_key_attention(layer["attn"], h, None, fmask, cfg, prec),
       hid_vars, f"attention ({cfg.attn_impl})")
    tm(lambda h: _rel_key_attention(layer["attn"], h, None, fmask, cfg_x, prec),
       hid_vars, "attention (xla)")
    tm(lambda h: _conv_module(layer["conv"], h, fmask, cfg, prec),
       hid_vars, "conv module (GLU+dw31+pw)")
    tm(lambda h: _conformer_block(layer, h, None, fmask, cfg, prec),
       hid_vars, "full block")


if __name__ == "__main__":
    main()
