"""AR decode-step attribution: where do the ~1.5 ms/step go?

Rebuilds the production decode step (nn/gpt.py:_generate_impl decode_step
+ sample) at real semantic-GPT sizes with ablation switches, runs each
variant K chained steps inside ONE jitted scan (same steady-state regime
as the production while_loop — no per-step host dispatch), and prints
per-step milliseconds. Ablations:

  full        production step: scan over layers + lm_head + top-k sample
  nohead      layers only (no lm_head matmul, no sampling)
  headonly    lm_head matmul + top-k sample from a fixed hidden state
  noattn      layers with the cache attention replaced by the self term
  attnonly    layers with the MLP halves removed
  unroll      full step with a python layer loop instead of lax.scan
  fused       full step with the ops/decode_step_fused.py Pallas kernels
              replacing the non-attention ops of each layer
  blockdiag   full step, UNPADDED kernel-layout caches read by plain XLA
              einsums via the block-diagonal Qb trick (the decode kernel's
              byte savings — head-split pads dh=64 to 128 lanes, 2x cache
              bytes — without pallas_call grid fixed costs; the 12x zero
              FLOPs in the 768-wide contraction are free on the MXU)

Timing follows the bench honesty rules (CLAUDE.md): distinct random
caches per pass, scalar-fetch sync, best-of passes.
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--cache-len", type=int, default=768)
    ap.add_argument("--steps", type=int, default=200, help="chained steps per timed call")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--kernel", action="store_true",
                    help="use the Pallas decode-attention kernel (default: einsum)")
    ap.add_argument("--variants", default="full,nohead,headonly,noattn,attnonly,unroll")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from audiotoken_tpu.nn.gpt import (
        GPTConfig, _attn_qkv, _layer_norm, _linear, _stack_layers, init_gpt_params,
    )

    print("backend:", jax.default_backend(), flush=True)
    cfg = GPTConfig()
    precision = jax.lax.Precision.DEFAULT
    dtype = jnp.bfloat16
    B, L = args.batch, args.cache_len
    nh, dh = cfg.n_head, cfg.n_embd // cfg.n_head
    neg = jnp.finfo(jnp.float32).min
    start0 = np.zeros((B,), np.int32)

    rng = np.random.default_rng(0)
    raw = init_gpt_params(rng, cfg)
    params0 = jax.tree.map(lambda a: jnp.asarray(a, dtype), {
        **{k: v for k, v in raw.items() if k != "layers"},
        "layers_stacked": _stack_layers(raw["layers"]),
    })

    def run_impl(params, cache, tok0, r0, *, mode, use_kernel):
        start = jnp.asarray(start0)

        interp = jax.default_backend() != "tpu"

        def layer_fn(x, layer, ck, cv, pos):
            slots = jnp.arange(L)[None, :]
            valid_bl = (slots >= start[:, None]) & (slots < pos)
            valid = valid_bl[:, None, None, :]
            scale = dh**-0.5
            if mode == "fused":
                from audiotoken_tpu.ops.decode_step_fused import decode_qkv

                qkv = decode_qkv(
                    x[:, 0], layer["ln1"]["scale"], layer["ln1"]["bias"],
                    layer["attn"]["qkv"]["kernel"], layer["attn"]["qkv"]["bias"],
                    eps=cfg.layer_norm_eps, interpret=interp,
                )[:, None]
                q, k, v = (
                    jnp.swapaxes(t.reshape(B, 1, nh, dh), 1, 2)
                    for t in jnp.split(qkv, 3, axis=-1)
                )
            else:
                h = _layer_norm(layer["ln1"], x, cfg.layer_norm_eps)
                q, k, v = _attn_qkv(layer, h, cfg, precision)
            if mode == "fused" and use_kernel:
                # production fully-fused small-batch path (nn/gpt.py)
                from audiotoken_tpu.ops.decode_attention import (
                    decode_attention_fused,
                )
                from audiotoken_tpu.ops.decode_step_fused import decode_ffn

                k_flat = k[:, :, 0, :].reshape(B, cfg.n_embd)
                v_flat = v[:, :, 0, :].reshape(B, cfg.n_embd)
                a = decode_attention_fused(
                    (q[:, :, 0, :] * scale).astype(dtype), ck, cv, valid_bl,
                    k_flat, v_flat, interpret=interp,
                )[:, None]
                x = decode_ffn(
                    x[:, 0], a[:, 0],
                    layer["attn"]["out"]["kernel"],
                    layer["ln2"]["scale"], layer["ln2"]["bias"],
                    layer["mlp"]["in"]["kernel"], layer["mlp"]["out"]["kernel"],
                    layer["attn"]["out"]["bias"], layer["mlp"]["in"]["bias"],
                    layer["mlp"]["out"]["bias"],
                    eps=cfg.layer_norm_eps, interpret=interp,
                )[:, None]
                return x, (k_flat, v_flat)
            s_self = jnp.sum((q * k).astype(jnp.float32), axis=-1, keepdims=True) * scale
            if mode == "noattn":
                a = v  # self term only: skip the cache read entirely
            elif mode == "blockdiag":
                # unpadded kernel layouts via XLA: ck [B, nh*dh, L] (L-minor),
                # cv [B, L, nh*dh] (channel-minor) — both tile cleanly; the
                # block-diagonal Qb keeps the score contraction 768-wide
                q_flat = (q[:, :, 0, :] * scale).astype(dtype)  # [B, nh, dh]
                eye = jnp.eye(nh, dtype=dtype)
                qb = (q_flat[:, :, None, :] * eye[None, :, :, None]).reshape(
                    B, nh, nh * dh)
                s_cache = jnp.einsum(
                    "bhc,bcl->bhl", qb, ck,
                    precision=precision, preferred_element_type=jnp.float32,
                )
                s_cache = jnp.where(valid_bl[:, None, :], s_cache, neg)
                scores = jnp.concatenate([s_cache, s_self[:, :, 0, :]], axis=-1)
                probs = jax.nn.softmax(scores, axis=-1).astype(dtype)  # [B, nh, L+1]
                cross = jnp.einsum(
                    "bhl,blc->bhc", probs[..., :L], cv,
                    precision=precision, preferred_element_type=jnp.float32,
                )  # [B, nh, nh*dh]; head h's values sit at lanes h*dh..
                acc = jnp.sum(
                    cross.reshape(B, nh, nh, dh)
                    * jnp.eye(nh, dtype=jnp.float32)[None, :, :, None],
                    axis=2,
                )  # [B, nh, dh]
                a = acc + probs[..., L:].astype(jnp.float32) * v[:, :, 0, :].astype(
                    jnp.float32)
                a = a.astype(dtype)[:, :, None, :]
            elif use_kernel:
                from audiotoken_tpu.ops.decode_attention import decode_attention

                acc, m, l = decode_attention(
                    (q[:, :, 0, :] * scale).astype(dtype), ck, cv, valid_bl,
                    interpret=jax.default_backend() != "tpu",
                )
                s1 = s_self[:, :, 0, :]
                mx = jnp.maximum(m, s1)
                alpha, w = jnp.exp(m - mx), jnp.exp(s1 - mx)
                a = (acc * alpha + w * v[:, :, 0, :].astype(jnp.float32)) / (l * alpha + w)
                a = a.astype(dtype)[:, :, None, :]
            else:
                s_cache = jnp.einsum(
                    "bhqd,bhkd->bhqk", q, ck,
                    precision=precision, preferred_element_type=jnp.float32,
                ) * scale
                s_cache = jnp.where(valid, s_cache, neg)
                scores = jnp.concatenate([s_cache, s_self], axis=-1)
                probs = jax.nn.softmax(scores, axis=-1).astype(dtype)
                a = jnp.einsum(
                    "bhqk,bhkd->bhqd", probs[..., :L], cv,
                    precision=precision, preferred_element_type=jnp.float32,
                ).astype(dtype) + probs[..., L:].astype(dtype) * v
            a = jnp.swapaxes(a, 1, 2).reshape(B, 1, cfg.n_embd)
            if mode == "fused":
                from audiotoken_tpu.ops.decode_step_fused import decode_ffn

                x = decode_ffn(
                    x[:, 0], a[:, 0],
                    layer["attn"]["out"]["kernel"],
                    layer["ln2"]["scale"], layer["ln2"]["bias"],
                    layer["mlp"]["in"]["kernel"], layer["mlp"]["out"]["kernel"],
                    layer["attn"]["out"]["bias"], layer["mlp"]["in"]["bias"],
                    layer["mlp"]["out"]["bias"],
                    eps=cfg.layer_norm_eps, interpret=interp,
                )[:, None]
            else:
                x = x + _linear(layer["attn"]["out"], a, precision)
                if mode != "attnonly":
                    h = _layer_norm(layer["ln2"], x, cfg.layer_norm_eps)
                    h = _linear(layer["mlp"]["in"], h, precision)
                    h = jax.nn.gelu(h, approximate=False)
                    x = x + _linear(layer["mlp"]["out"], h, precision)
            if use_kernel or mode == "blockdiag":
                return x, (k[:, :, 0, :].reshape(B, cfg.n_embd),
                           v[:, :, 0, :].reshape(B, cfg.n_embd))
            return x, (k, v)

        def head(x, rng_i):
            x = _layer_norm(params["ln_f"], x, cfg.layer_norm_eps)
            logits = jnp.einsum(
                "bc,vc->bv", x[:, 0], params["wte"], precision=precision,
                preferred_element_type=jnp.float32,
            )
            kth = jax.lax.approx_max_k(logits, 100, recall_target=0.99)[0][:, -1:]
            logits = jnp.where(logits < kth, neg, logits)
            return jax.random.categorical(rng_i, logits, axis=-1).astype(jnp.int32)

        def step(carry, _):
            tok, pos, cache, r = carry
            r, sub = jax.random.split(r)
            if mode == "headonly":
                x = params["wte"][tok[:, None]]
                tok = head(x, sub)
                return (tok, pos, cache, r), None
            x = params["wte"][tok[:, None]] + params["wpe"][pos - start][:, None]
            if mode == "unroll":
                ks, vs = [], []
                for i in range(cfg.n_layer):
                    layer = jax.tree.map(lambda a: a[i], params["layers_stacked"])
                    x, (k, v) = layer_fn(x, layer, cache["k"][i], cache["v"][i], pos)
                    ks.append(k)
                    vs.append(v)
                knew, vnew = jnp.stack(ks), jnp.stack(vs)
            else:
                x, (knew, vnew) = jax.lax.scan(
                    lambda xc, xs: layer_fn(xc, xs[0], xs[1], xs[2], pos),
                    x, (params["layers_stacked"], cache["k"], cache["v"]),
                )
            if use_kernel or mode == "blockdiag":
                cache = {
                    "k": jax.lax.dynamic_update_slice(
                        cache["k"], knew[..., None], (0, 0, 0, pos)),
                    "v": jax.lax.dynamic_update_slice(
                        cache["v"], vnew[:, :, None, :], (0, 0, pos, 0)),
                }
            else:
                cache = {
                    "k": jax.lax.dynamic_update_slice(
                        cache["k"], knew, (0, 0, 0, pos, 0)),
                    "v": jax.lax.dynamic_update_slice(
                        cache["v"], vnew, (0, 0, 0, pos, 0)),
                }
            if mode == "nohead":
                # keep a data dependence on x so the layer stack can't be
                # dead-code-eliminated when the head is ablated
                tok = (tok + (x[:, 0, 0] > 0).astype(jnp.int32)) % cfg.vocab_size
            else:
                tok = head(x, sub)
            # pos stays fixed: a moving pos only changes the masked share of
            # the streamed cache, not the bytes read; fixed pos keeps every
            # step identical for clean attribution
            return (tok, pos, cache, r), None

        pos = jnp.asarray(L - 2, jnp.int32)
        (tok, _, cache, _), _ = jax.lax.scan(
            step, (tok0, pos, cache, r0), None, length=args.steps)
        return tok.sum()

    def fresh_cache(seed, kernel_layout):
        r = np.random.default_rng(seed)
        if kernel_layout:
            return {
                "k": jnp.asarray(r.standard_normal((cfg.n_layer, B, cfg.n_embd, L)), dtype),
                "v": jnp.asarray(r.standard_normal((cfg.n_layer, B, L, cfg.n_embd)), dtype),
            }
        return {
            "k": jnp.asarray(r.standard_normal((cfg.n_layer, B, nh, L, dh)), dtype),
            "v": jnp.asarray(r.standard_normal((cfg.n_layer, B, nh, L, dh)), dtype),
        }

    toks = [jnp.asarray(np.full((B,), 7 + s), jnp.int32) for s in range(2)]

    from functools import partial

    for mode in args.variants.split(","):
        use_kernel = args.kernel and mode in ("full", "nohead", "attnonly", "fused")
        run = jax.jit(partial(run_impl, mode=mode, use_kernel=use_kernel))
        caches = [fresh_cache(s, use_kernel or mode == "blockdiag")
                  for s in range(2)]
        t0 = time.time()
        float(run(params0, caches[0], toks[0], jax.random.PRNGKey(0)))  # compile
        compile_s = time.time() - t0
        best = float("inf")
        for p in range(args.passes):
            c, t = caches[p % 2], toks[p % 2]
            t0 = time.perf_counter()
            float(run(params0, c, t, jax.random.PRNGKey(p + 1)))  # scalar fetch = sync
            best = min(best, time.perf_counter() - t0)
        per_step_ms = best * 1e3 / args.steps
        print(f"{mode:9s} {per_step_ms:7.3f} ms/step  "
              f"({B / (best / args.steps):7.0f} tok/s)  [compile {compile_s:.0f}s]",
              flush=True)


if __name__ == "__main__":
    main()
