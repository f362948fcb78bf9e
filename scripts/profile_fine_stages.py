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

    # ---- forward ablations: where do the ~190 ms go? -------------------
    # Rebuild the 24-layer stack with pieces removed so the gap between
    # "full" and the matmul roofline gets attributed (embedding gathers,
    # attention, lm_head, LN/gelu elementwise).
    from audiotoken_tpu.nn.bark_fine import _layer_norm, _linear

    cb = 7

    def fwd(p, codes, *, attn, embed=True, head=True, norms=True):
        Bc, Tc, _ = codes.shape
        if embed:
            x = jnp.zeros((Bc, Tc, cfg.n_embd), p["wpe"].dtype)
            for i in range(cb + 1):
                x = x + p["wtes"][i][codes[:, :, i]]
            x = x + p["wpe"][jnp.arange(Tc)]
        else:
            # data-dependent but gather-free stand-in
            x = (codes.astype(p["wpe"].dtype)[..., :1]
                 * jnp.ones((1, 1, cfg.n_embd), p["wpe"].dtype))
        nh, dh = cfg.n_head, cfg.n_embd // cfg.n_head
        for layer in p["layers"]:
            h = _layer_norm(layer["ln1"], x, cfg.layer_norm_eps) if norms else x
            qkv = _linear(layer["attn"]["qkv"], h, prec)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q, k, v = (jnp.swapaxes(t.reshape(Bc, Tc, nh, dh), 1, 2)
                       for t in (q, k, v))
            if attn == "none":
                a = v
            elif attn == "flash":
                from audiotoken_tpu.ops.flash_attention import (
                    flash_attention_relkey,
                )
                a = flash_attention_relkey(
                    q, k, v, None, None, precision=prec,
                    interpret=jax.default_backend() != "tpu",
                )
            else:
                scores = jnp.einsum(
                    "bhqd,bhkd->bhqk", q, k, precision=prec,
                    preferred_element_type=jnp.float32,
                ) * (dh**-0.5)
                probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
                a = jnp.einsum(
                    "bhqk,bhkd->bhqd", probs, v, precision=prec,
                    preferred_element_type=jnp.float32,
                ).astype(x.dtype)
            a = jnp.swapaxes(a, 1, 2).reshape(Bc, Tc, cfg.n_embd)
            x = x + _linear(layer["attn"]["out"], a, prec)
            h = _layer_norm(layer["ln2"], x, cfg.layer_norm_eps) if norms else x
            h = _linear(layer["mlp"]["in"], h, prec)
            h = jax.nn.gelu(h, approximate=False)
            x = x + _linear(layer["mlp"]["out"], h, prec)
        x = _layer_norm(p["ln_f"], x, cfg.layer_norm_eps)
        if head:
            return jnp.einsum(
                "btc,cv->btv", x, p["lm_heads"][cb - cfg.n_codes_given],
                precision=prec, preferred_element_type=jnp.float32,
            )
        return x

    for name, kw in [
        ("ablate full/xla   ", dict(attn="xla")),
        ("ablate full/flash ", dict(attn="flash")),
        ("ablate noattn     ", dict(attn="none")),
        ("ablate nohead     ", dict(attn="xla", head=False)),
        ("ablate noembed    ", dict(attn="xla", embed=False)),
        ("ablate nonorm     ", dict(attn="xla", norms=False)),
    ]:
        dt = timed_best(lambda p, c, kw=kw: fwd(p, c, **kw), variants)
        print(f"{name}: {dt*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
