"""Semantic decode (AR GPT) throughput: KV-cache sampler vs full-recompute.

The reference's generate re-runs the full prefix per token
(gpt2_model.py:251-280). This measures our prefill+KV-cache while_loop
sampler at the real model size (12L/12H/768d, vocab 53,376) and, for
comparison, the cost of the reference's O(T^2) scheme estimated from
full-forward timings.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from audiotoken_tpu.configs import SemanticDecoderConfig
    from audiotoken_tpu.nn.gpt import GPTConfig, GPTSampler, gpt_logits, init_gpt_params

    print("backend:", jax.default_backend(), flush=True)
    vocab = SemanticDecoderConfig().vocab
    cfg = GPTConfig(vocab_size=vocab.vocab_size)
    rng = np.random.default_rng(0)
    t0 = time.time()
    params = jax.device_put(init_gpt_params(rng, cfg))
    print(f"params ready {time.time()-t0:.0f}s", flush=True)

    sampler = GPTSampler(cfg, params)
    prompt = rng.integers(0, 1000, size=(1, 251)).astype(np.int32) + 50257

    # warmup/compile
    t0 = time.time()
    out = sampler.generate(prompt, max_new_tokens=64, temperature=0.8, top_k=100, seed=0)
    print(f"sampler compile+first {time.time()-t0:.1f}s, {int((out>=0).sum())} tokens",
          flush=True)

    for n_new in (256, 512):
        t0 = time.perf_counter()
        out = sampler.generate(prompt, max_new_tokens=n_new, temperature=0.8,
                               top_k=100, seed=1)
        dt = time.perf_counter() - t0
        n = int((out >= 0).sum())
        print(f"KV-cache decode {n} tokens: {dt:.2f}s = {n/dt:.0f} tok/s", flush=True)

    # reference scheme cost estimate: one full forward at len L per token
    fwd = jax.jit(lambda p, x: gpt_logits(p, x, cfg, last_only=True))
    x = jnp.asarray(rng.integers(0, 1000, size=(1, 512)).astype(np.int32))
    jax.block_until_ready(fwd(params, x))
    t0 = time.perf_counter()
    for _ in range(5):
        jax.block_until_ready(fwd(params, x))
    per_fwd = (time.perf_counter() - t0) / 5
    print(f"full fwd @512: {per_fwd*1e3:.1f} ms -> reference-style 512-token "
          f"decode would be ~{per_fwd*512:.0f}s+ (plus per-length recompiles)",
          flush=True)


if __name__ == "__main__":
    main()
