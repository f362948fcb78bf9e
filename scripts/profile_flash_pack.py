"""A/B the 2-head-packed flash kernel vs the unpacked one on TPU.

The semantic_m attention shape is [B=8, H=16, T=1500, dh=64]: dh=64
half-fills the 128-deep MXU contraction (qk^T, pos) and the 128 output
lanes (pv). The packed path (ops/flash_attention.py pack2) runs every
dot at full width via block-diagonal head pairs; this script measures
both variants with the chained-iteration timer (tunnel-sync amortized,
relay-dedupe-proof: each link consumes the previous output).

    JAX_COMPILATION_CACHE_DIR=.jax_cache python -u scripts/profile_flash_pack.py
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--frames", type=int, default=1500)
    p.add_argument("--heads", type=int, default=16)
    p.add_argument("--dh", type=int, default=64)
    p.add_argument("--precision", default="highest",
                   choices=["default", "high", "highest"])
    p.add_argument("--chain", type=int, default=16)
    p.add_argument("--iters", type=int, default=3)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from audiotoken_tpu.ops.flash_attention import flash_attention_relkey

    prec = {"default": jax.lax.Precision.DEFAULT,
            "high": jax.lax.Precision.HIGH,
            "highest": jax.lax.Precision.HIGHEST}[args.precision]
    print("backend:", jax.default_backend(), "precision:", args.precision,
          flush=True)

    B, H, T, dh = args.batch, args.heads, args.frames, args.dh
    left, right = 64, 8
    rng = np.random.default_rng(0)
    E = jax.device_put(
        (rng.standard_normal((left + right + 1, dh)) * 0.05).astype(np.float32))
    fmask = jax.device_put(np.ones((B, T), np.float32))
    kv_vars = [
        tuple(jax.device_put(
            (rng.standard_normal((B, H, T, dh)) * 0.3).astype(np.float32))
            for _ in range(2))
        for _ in range(2)
    ]
    h0 = jax.device_put(
        (rng.standard_normal((B, H, T, dh)) * 0.3).astype(np.float32))
    jax.block_until_ready((kv_vars, h0))

    outs = {}
    for pack2 in (False, True):
        def chained(q, k, v, pack2=pack2):
            def body(_, x):
                o = flash_attention_relkey(
                    x, k, v, E, fmask, left=left, right=right,
                    precision=prec, pack2=pack2)
                return o * 0.999 + x * 0.001  # bounded, data-dependent
            return jnp.sum(
                jax.lax.fori_loop(0, args.chain, body, q).astype(jnp.float32))

        g = jax.jit(chained)
        t0 = time.time()
        float(g(h0, *kv_vars[0]))
        compile_s = time.time() - t0
        samples = []
        for i in range(args.iters):
            k, v = kv_vars[(i + 1) % len(kv_vars)]
            t0 = time.perf_counter()
            float(g(h0, k, v))
            samples.append(time.perf_counter() - t0)
        best = min(samples) / args.chain
        print(f"pack2={pack2!s:5s} {best*1e3:9.3f} ms/attn  "
              f"(chain {args.chain}, compile {compile_s:.1f}s)", flush=True)
        # one un-chained call for the parity check
        outs[pack2] = np.asarray(flash_attention_relkey(
            h0, *kv_vars[0], E, fmask, left=left, right=right,
            precision=prec, pack2=pack2))

    bitexact = np.array_equal(outs[False], outs[True])
    print("packed == unpacked (bitwise):", bitexact, flush=True)
    if not bitexact:
        d = np.abs(outs[False] - outs[True])
        print("  max abs diff:", d.max(), " frac differing:",
              (d > 0).mean(), flush=True)


if __name__ == "__main__":
    main()
