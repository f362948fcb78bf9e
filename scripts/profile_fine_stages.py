"""Bark-fine stage micro-profile: where does the NAR cascade's time go?

Times, device-only (bench.timed_best sync discipline):
  * one bark_fine_logits forward (24 layers + lm_head), xla vs flash attn
  * jax.random.categorical sampling alone on a [B, 1024, 1024] logit tensor
  * the full 6-codebook _fill_window cascade

Usage: python scripts/profile_fine_stages.py [--batch 16]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from audiotoken_tpu.nn.bark_fine import (
        BarkFineConfig,
        _fill_window,
        bark_fine_logits,
        init_bark_fine_params,
    )
    from bench import timed_best

    print("backend:", jax.default_backend(), flush=True)
    cfg = BarkFineConfig()
    rng = np.random.default_rng(0)
    t0 = time.time()
    params = init_bark_fine_params(rng, cfg)
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if hasattr(a, "astype") else a, params
    )
    params = jax.device_put(params)
    B, T = args.batch, cfg.block_size
    variants = [
        (params, jax.device_put(rng.integers(0, 1024, size=(B, T, 8)).astype(np.int32)))
        for _ in range(2)
    ]
    jax.block_until_ready([v[1] for v in variants])
    print(f"params ready {time.time()-t0:.0f}s", flush=True)

    prec = jax.lax.Precision.DEFAULT
    for impl in ("xla", "flash"):
        dt = timed_best(
            lambda p, c, impl=impl: bark_fine_logits(p, c, 7, cfg, prec, impl),
            variants,
        )
        print(f"one forward (cb=7, {impl}): {dt*1e3:.1f} ms", flush=True)

    # sampling alone: categorical over the last axis of [B, T, 1024]
    lvars = [
        (jax.device_put(rng.standard_normal((B, T, 1024)).astype(np.float32)),
         jax.random.PRNGKey(i))
        for i in range(2)
    ]
    jax.block_until_ready([v[0] for v in lvars])
    dt = timed_best(
        lambda l, k: jax.random.categorical(k, l, axis=-1).astype(jnp.int32), lvars
    )
    print(f"categorical sample on [B,{T},1024]: {dt*1e3:.1f} ms", flush=True)

    # full cascade
    for impl in ("xla", "flash"):
        def cascade(p, c, impl=impl):
            return _fill_window(
                p, c, jnp.asarray(0, jnp.int32), jax.random.PRNGKey(0),
                jnp.asarray(0.5, jnp.float32), cfg=cfg, precision=prec,
                n_coarse=2, use_argmax=False, attn_impl=impl,
            )
        dt = timed_best(cascade, variants)
        print(f"full 6-cb cascade ({impl}): {dt*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
