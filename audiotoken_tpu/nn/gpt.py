"""Decoder-only transformer (GPT-2 family) with KV-cache sampling.

The semantic->acoustic translation model (SURVEY.md §2.2): pre-LN blocks,
causal attention, GELU 4x MLP, weight-tied lm_head, defaults 12L/12H/768d/
block 1024, vocab 53,376. Reference: /root/reference/audiotoken/
gpt2_model.py:108-341 — whose ``generate`` re-runs the FULL prefix for
every sampled token (gpt2_model.py:251-280). Here generation is a
``lax.while_loop`` over a static-shape KV cache: one prefill pass on the
(bucketed) prompt, then single-token decode steps — O(T) instead of O(T^2)
full forwards, with stop-token early exit inside the loop.

Sampling matches the reference's temperature + top-k + categorical scheme;
RNG streams differ (JAX threefry vs torch multinomial), so decode parity is
distributional (SURVEY.md §7).
"""

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class GPTConfig:
    block_size: int = 1024
    vocab_size: int = 53_376
    n_layer: int = 12
    n_head: int = 12
    n_embd: int = 768
    bias: bool = False
    causal: bool = True
    layer_norm_eps: float = 1e-5


def _layer_norm(p, x, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    h = (x - mu) * jax.lax.rsqrt(var + eps)
    h = h * p["scale"]
    if p.get("bias") is not None:
        h = h + p["bias"]
    return h


def _linear(p, x, precision):
    y = jnp.einsum(
        "...i,io->...o", x, p["kernel"], precision=precision,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if p.get("bias") is not None:
        y = y + p["bias"].astype(x.dtype)
    return y


def _block(p, x, bias, cfg: GPTConfig, precision):
    """Pre-LN: x + attn(ln1(x)); x + mlp(ln2(x))."""
    B, T, C = x.shape
    nh, dh = cfg.n_head, cfg.n_embd // cfg.n_head

    h = _layer_norm(p["ln1"], x, cfg.layer_norm_eps)
    qkv = _linear(p["attn"]["qkv"], h, precision)
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):
        return jnp.swapaxes(t.reshape(B, T, nh, dh), 1, 2)

    q, k, v = heads(q), heads(k), heads(v)
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, precision=precision,
        preferred_element_type=jnp.float32,
    ) * (dh**-0.5)
    if bias is not None:
        scores = scores + bias
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
    a = jnp.einsum(
        "bhqk,bhkd->bhqd", probs, v, precision=precision,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    a = jnp.swapaxes(a, 1, 2).reshape(B, T, C)
    x = x + _linear(p["attn"]["out"], a, precision)

    h = _layer_norm(p["ln2"], x, cfg.layer_norm_eps)
    h = _linear(p["mlp"]["in"], h, precision)
    h = jax.nn.gelu(h, approximate=False)
    return x + _linear(p["mlp"]["out"], h, precision)


def gpt_logits(
    params,
    idx: jnp.ndarray,
    cfg: GPTConfig,
    precision=jax.lax.Precision.HIGHEST,
    last_only: bool = False,
    activation_constraint=None,
) -> jnp.ndarray:
    """Full forward: ids [B, T] -> logits [B, T, vocab] (or [B, 1, vocab]).

    Reference forward: gpt2_model.py:146-170 (tok+pos embeddings, blocks,
    ln_f, weight-tied lm_head). ``activation_constraint`` (optional) is
    applied to the hidden states after each block — the sequence-parallel
    sharding hook used by train/gpt_train.py.
    """
    B, T = idx.shape
    x = params["wte"][idx] + params["wpe"][jnp.arange(T)]
    bias = None
    if cfg.causal:
        mask = jnp.tril(jnp.ones((T, T), bool))
        bias = jnp.where(mask, 0.0, jnp.finfo(jnp.float32).min)[None, None]
    for layer in params["layers"]:
        x = _block(layer, x, bias, cfg, precision)
        if activation_constraint is not None:
            x = activation_constraint(x)
    x = _layer_norm(params["ln_f"], x, cfg.layer_norm_eps)
    if last_only:
        x = x[:, -1:]
    return jnp.einsum(
        "btc,vc->btv", x, params["wte"], precision=precision,
        preferred_element_type=jnp.float32,
    )


def gpt_loss(params, idx, targets, cfg: GPTConfig, precision=jax.lax.Precision.DEFAULT):
    """Cross-entropy LM loss with ignore_index=-1 (gpt2_model.py:162-165)."""
    logits = gpt_logits(params, idx, cfg, precision)
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    valid = targets >= 0
    tgt = jnp.where(valid, targets, 0)
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1)


# ---------------------------------------------------------------------------
# KV-cache sampler
# ---------------------------------------------------------------------------


def _stack_layers(layers):
    """List of per-layer param dicts -> one dict of [L, ...] leaves.

    The sampler scans over the stacked layers (lax.scan) instead of
    unrolling the 12-layer python loop into the while_loop body: one
    scanned block compiles ~L times faster and dispatches as one fused
    loop per decode step. ``None`` leaves (bias=False) stay None — every
    layer shares the same structure."""
    return jax.tree.map(lambda *leaves: jnp.stack(leaves), *layers)


class GPTSampler:
    """Stateless jitted prefill + while_loop decode over a static KV cache.

    Improvements over the reference generate (gpt2_model.py:251-280):
    KV-cache O(T) decode instead of full-prefix re-forwarding; BATCHED
    generation with per-row stop bookkeeping (the reference is batch-1,
    gpt2_model.py:274); and context-window sliding — when prompt+output
    overflows block_size the sampler re-prefills on the trailing context
    instead of silently truncating, so the full ``max_new_tokens`` budget
    is always reachable (advisor r1 finding).
    """

    #: prompt lengths are bucketed to this multiple to limit prefill recompiles
    PROMPT_BUCKET = 32
    #: context kept when sliding the window on overflow (trailing tokens)
    SLIDE_KEEP_MARGIN = 256

    def __init__(self, cfg: GPTConfig, params, precision=jax.lax.Precision.HIGHEST,
                 decode_attn: Optional[str] = None,
                 fused_step: Optional[bool] = None,
                 mesh=None):
        self.cfg = cfg
        # stack the per-layer trees once at construction; _generate_impl
        # scans over them (see _stack_layers)
        self.params = {
            **{k: v for k, v in params.items() if k != "layers"},
            "layers_stacked": _stack_layers(params["layers"]),
        }
        self.mesh = mesh
        if mesh is not None:
            # TP inference as a config change (SURVEY.md §2.3): place the
            # stacked params per parallel/shard.py's Megatron rules and let
            # XLA propagate shardings + insert the collectives through
            # prefill and the decode while_loop. Prompts/outputs stay
            # replicated host arrays.
            from ..parallel.shard import gpt_sampler_param_spec, named_sharding_tree

            shardings = named_sharding_tree(gpt_sampler_param_spec(self.params), mesh)
            self.params = jax.device_put(self.params, shardings)
        self.precision = precision
        # cached-slot attention impl + cache layout, per ops/decode_attention.py
        # and the measured ladder (ARCHITECTURE.md round-3): "auto" picks
        # "blockdiag" on TPU bf16/DEFAULT decodes — the UNPADDED kernel-layout
        # caches read by plain XLA einsums via a block-diagonal Q: the score
        # contraction stays 768-wide (the 12x structural-zero FLOPs are free
        # on the MXU; the head-split einsum's dh=64 minor dim half-fills
        # (8,128) tiles = 2x cache-read bytes) without pallas_call fixed
        # costs. Interleaved same-process steps/s, L=768: B=8 blockdiag
        # 6642/6588 vs Pallas kernel 5995/6221; B=16 8220/7978 vs head-split
        # einsum 7247/7256; B=32 9815 vs 9078/9415. "kernel" (Pallas) and
        # "xla" (head-split einsum) remain as escape hatches; CPU and
        # f32/HIGHEST studies always take the head-split einsum (every dot
        # at the requested precision).
        if decode_attn is None:
            decode_attn = "auto"
        if decode_attn not in ("auto", "kernel", "xla", "blockdiag"):
            raise ValueError(
                "decode_attn must be 'auto', 'kernel', 'xla' or 'blockdiag', "
                f"got {decode_attn!r}"
            )
        self.decode_attn = decode_attn
        # fused decode-step kernels (ops/decode_step_fused.py): None = auto
        # (off until a measured back-to-back win on hardware; the kernels
        # assume bf16 operands + DEFAULT-precision dots)
        self.fused_step = fused_step
        self._generate = jax.jit(
            partial(_generate_impl, cfg=cfg, precision=precision),
            static_argnames=(
                "top_k", "prompt_bucket", "cache_len", "exact_topk",
                "attn_impl", "fused_step",
            ),
        )

    def _attn_impl(self, B: int) -> str:
        if self.decode_attn != "auto":
            return self.decode_attn
        if (
            jax.default_backend() == "tpu"
            and self.params["wte"].dtype == jnp.bfloat16
            and self.precision in (jax.lax.Precision.DEFAULT, None)
        ):
            # measured fastest at every batch tried (8/16/32); see __init__
            return "blockdiag"
        return "xla"

    def _use_fused(self) -> bool:
        if self.fused_step is not None:
            return self.fused_step
        # auto: OFF — measured LOSS on v5e hardware (interleaved same-
        # process, B=8, L=768, kernel attention: full 1.297/1.313 vs
        # fused 1.339/1.347 ms/step). XLA's own fusion of the step's
        # small ops already beats the pallas_call fixed costs; the
        # kernels stay as an escape hatch + documentation of the
        # experiment (ARCHITECTURE.md round-3 decision log).
        return False

    def generate(
        self,
        prompt: np.ndarray,
        max_new_tokens: int = 1024,
        temperature: float = 0.8,
        top_k: Optional[int] = 100,
        stop_token: Optional[int] = None,
        seed: int = 0,
        exact_topk: bool = False,
    ) -> np.ndarray:
        """prompt [1, P] or [P] -> sampled new tokens [max_new_tokens]
        (stop token not included; unused slots are -1).

        ``exact_topk`` forces the reference-exact top-k filter on TPU
        (jax.lax.top_k) instead of the default approx_max_k partial
        reduce, for parity-sensitive decode studies."""
        prompt = np.asarray(prompt, np.int32).reshape(1, -1)
        out = self.generate_batch(
            prompt,
            max_new_tokens=max_new_tokens,
            temperature=temperature,
            top_k=top_k,
            stop_token=stop_token,
            seed=seed,
            exact_topk=exact_topk,
        )
        return out[0]

    def generate_batch(
        self,
        prompts,
        lengths=None,
        max_new_tokens: int = 1024,
        temperature: float = 0.8,
        top_k: Optional[int] = 100,
        stop_token: Optional[int] = None,
        seed: int = 0,
        exact_topk: bool = False,
    ) -> np.ndarray:
        """Batched sampling with per-row stop bookkeeping.

        ``prompts``: [B, P] int array (right-padded rows) or list of 1-D
        arrays of varying length; ``lengths``: optional [B] true lengths.
        Returns [B, max_new_tokens] int32 — each row's sampled tokens, -1
        after (and including) that row's stop token.
        """
        if isinstance(prompts, (list, tuple)):
            rows = [np.asarray(p, np.int32).reshape(-1) for p in prompts]
        else:
            arr = np.asarray(prompts, np.int32)
            if arr.ndim == 1:
                arr = arr[None]
            L = arr.shape[1] if lengths is None else None
            rows = [
                arr[i, : (L if L is not None else int(lengths[i]))]
                for i in range(arr.shape[0])
            ]
        B = len(rows)
        bs = self.cfg.block_size
        stop = -1 if stop_token is None else int(stop_token)
        # bucket adapts to tiny block sizes (tests); keep = trailing context
        # retained when sliding, always leaving >= bucket decode slots
        bucket = min(self.PROMPT_BUCKET, max(1, bs // 4))
        keep = bs - max(2 * bucket, min(self.SLIDE_KEEP_MARGIN, bs // 2))

        collected = [np.zeros((0,), np.int32) for _ in range(B)]
        seqs = [r[-bs:] for r in rows]  # trailing context per row
        done = np.zeros((B,), bool)
        remaining = int(max_new_tokens)
        rounds = 0
        while remaining > 0 and not done.all():
            ctx_len = max(len(s) for s in seqs)
            room = bs - _bucket_len(ctx_len, bucket, bs)
            if room < min(remaining, bucket):
                # slide: keep only the trailing context so the cache has room
                seqs = [s[-keep:] for s in seqs]
                ctx_len = max(len(s) for s in seqs)
                room = bs - _bucket_len(ctx_len, bucket, bs)
            P_pad = _bucket_len(ctx_len, bucket, bs)
            n_new = min(remaining, room)
            # Phase-split the static KV cache (decode is cache-READ-bound:
            # every step streams cache_len slots per layer). When a long
            # decode would otherwise run every step against a full-size
            # cache, generate the first stretch in a round capped at a
            # half-size cache, then re-prefill and continue — the extra
            # prefill costs ~one step, the halved streaming saves ~15-20%
            # of total decode time. Only engaged for real model sizes
            # (bs >= 512); tiny test configs keep single-round behavior.
            if bs >= 512:
                phase = bs // 2
                if P_pad < phase and P_pad + _bucket_len(n_new, bucket, bs) > phase:
                    n_new = min(n_new, phase - P_pad)

            # LEFT-pad so every row's last prompt token sits at P_pad-1:
            # rows then share cache slots/decode positions, and per-row
            # lengths only affect the attention mask + position ids.
            padded = np.zeros((B, P_pad), np.int32)
            lens = np.zeros((B,), np.int32)
            for i, s in enumerate(seqs):
                padded[i, P_pad - len(s):] = s
                lens[i] = len(s)

            out, dev_done = self._generate(
                self.params,
                jnp.asarray(padded),
                jnp.asarray(lens),
                jnp.asarray(np.asarray(done)),
                jnp.asarray(n_new, jnp.int32),
                jnp.asarray(temperature, jnp.float32),
                jnp.asarray(stop, jnp.int32),
                jax.random.PRNGKey(np.int64(seed) + 0x9E3779B1 * rounds),
                top_k=top_k,
                exact_topk=exact_topk,
                attn_impl=self._attn_impl(B),
                fused_step=self._use_fused(),
                prompt_bucket=P_pad,
                # static tight cache: only the slots this round can touch
                # (the decode step streams the whole cache per layer)
                cache_len=min(bs, P_pad + _bucket_len(n_new, bucket, bs)),
            )
            out = np.asarray(out)[:, :n_new]
            done = np.asarray(dev_done)
            for i in range(B):
                row = out[i]
                stops = np.flatnonzero(row < 0)
                new = row[: stops[0]] if stops.size else row
                collected[i] = np.concatenate([collected[i], new])
                seqs[i] = np.concatenate([seqs[i], new])[-bs:]
            remaining -= n_new
            rounds += 1

        result = np.full((B, max_new_tokens), -1, np.int32)
        for i in range(B):
            n = min(len(collected[i]), max_new_tokens)
            result[i, :n] = collected[i][:n]
        return result


def _bucket_len(n: int, bucket: int, cap: int) -> int:
    return min(cap, ((n + bucket - 1) // bucket) * bucket)


def _init_cache(
    cfg: GPTConfig, B: int, dtype, length: Optional[int] = None,
    kernel_layout: bool = False,
):
    """Two cache layouts, one per decode-attention impl:

    * ``kernel_layout=True`` (Pallas kernel, small batch): UNPADDED —
      k L-minor [L?, B, nh*dh, slots] (slots on lanes), v channel-minor
      [L?, B, slots, nh*dh]. The head-split [.., slots, dh=64] layout
      half-pads every (8,128) HBM tile (2x cache-read bytes); these two
      orientations are exactly what the two fat dots in
      ops/decode_attention.py consume with no relayout.
    * ``kernel_layout=False`` (einsum, large batch / CPU / f32): head-split
      [L?, B, nh, slots, dh] — XLA fuses the whole layer step around it;
      at B >= 16 the step is NOT cache-read-bound and this path measured
      fastest despite the lane padding (ARCHITECTURE.md round-3)."""
    nh, dh = cfg.n_head, cfg.n_embd // cfg.n_head
    L = cfg.block_size if length is None else length
    if kernel_layout:
        return {
            "k": jnp.zeros((cfg.n_layer, B, nh * dh, L), dtype),
            "v": jnp.zeros((cfg.n_layer, B, L, nh * dh), dtype),
        }
    return {
        "k": jnp.zeros((cfg.n_layer, B, nh, L, dh), dtype),
        "v": jnp.zeros((cfg.n_layer, B, nh, L, dh), dtype),
    }


def _attn_qkv(p, h, cfg, precision):
    B, T, C = h.shape
    nh, dh = cfg.n_head, cfg.n_embd // cfg.n_head
    qkv = _linear(p["attn"]["qkv"], h, precision)
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):
        return jnp.swapaxes(t.reshape(B, T, nh, dh), 1, 2)

    return heads(q), heads(k), heads(v)


def _generate_impl(
    params,
    padded_prompt,
    prompt_len,
    done0,
    max_new,
    temperature,
    stop_token,
    rng,
    *,
    cfg: GPTConfig,
    precision,
    top_k: Optional[int],
    prompt_bucket: int,
    cache_len: Optional[int] = None,
    exact_topk: bool = False,
    attn_impl: str = "xla",
    fused_step: bool = False,
):
    """Batched KV-cache generation on LEFT-padded prompts.

    ``padded_prompt`` [B, prompt_bucket]: row i's tokens occupy the last
    ``prompt_len[i]`` slots, so all rows share decode cache slots; padding
    is excluded via the attention mask and position ids are shifted per
    row. ``done0`` [B] marks rows that must not generate (already stopped
    in a previous sliding-window round). Returns (out_buf [B, block_size]
    with -1 at/after each row's stop, done [B]).

    ``cache_len`` sizes the static KV cache to the slots this round can
    actually touch (prompt_bucket + the bucketized decode budget): the
    decode step is cache-READ-bound (every step streams the whole cache
    per layer), so a 1024-slot cache for an 856-token decode wastes ~17%
    of step bandwidth.
    """
    B = padded_prompt.shape[0]
    nh, dh = cfg.n_head, cfg.n_embd // cfg.n_head
    dtype = params["wte"].dtype
    if cache_len is None:
        cache_len = cfg.block_size
    # "kernel" and "blockdiag" both read the unpadded kernel-layout caches
    kernel_layout = attn_impl in ("kernel", "blockdiag")
    cache = _init_cache(cfg, B, dtype, length=cache_len, kernel_layout=kernel_layout)
    neg = jnp.finfo(jnp.float32).min

    # ---- prefill: causal pass over the left-padded prompt, cache k/v ----
    T = prompt_bucket
    start = (T - prompt_len).astype(jnp.int32)  # [B] first real slot per row
    pos_ids = jnp.maximum(jnp.arange(T)[None, :] - start[:, None], 0)  # [B, T]
    x = params["wte"][padded_prompt] + params["wpe"][pos_ids]
    # mask: causal AND key inside the row's real prompt
    causal = jnp.tril(jnp.ones((T, T), bool))[None]  # [1, T, T]
    in_row = (jnp.arange(T)[None, :] >= start[:, None])[:, None, :]  # [B, 1, T]
    bias = jnp.where(causal & in_row, 0.0, neg)[:, None]  # [B, 1, T, T]
    stacked = params["layers_stacked"]

    def prefill_layer(x, layer):
        h = _layer_norm(layer["ln1"], x, cfg.layer_norm_eps)
        q, k, v = _attn_qkv(layer, h, cfg, precision)
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, precision=precision,
            preferred_element_type=jnp.float32,
        ) * (dh**-0.5) + bias
        probs = jax.nn.softmax(scores, axis=-1).astype(dtype)
        a = jnp.einsum(
            "bhqk,bhkd->bhqd", probs, v, precision=precision,
            preferred_element_type=jnp.float32,
        ).astype(dtype)
        a = jnp.swapaxes(a, 1, 2).reshape(B, T, cfg.n_embd)
        x = x + _linear(layer["attn"]["out"], a, precision)
        h = _layer_norm(layer["ln2"], x, cfg.layer_norm_eps)
        h = _linear(layer["mlp"]["in"], h, precision)
        h = jax.nn.gelu(h, approximate=False)
        x = x + _linear(layer["mlp"]["out"], h, precision)
        return x, (k, v)

    x, (pk, pv) = jax.lax.scan(prefill_layer, x, stacked)
    # scan emits [L?, B, nh, T, dh]; transpose at prefill into the chosen
    # cache orientation (_init_cache), read every decode step
    nl = cfg.n_layer
    if kernel_layout:
        pk_t = jnp.swapaxes(pk, 3, 4).reshape(nl, B, nh * dh, T)  # [.., nh*dh, T]
        pv_t = jnp.transpose(pv, (0, 1, 3, 2, 4)).reshape(nl, B, T, nh * dh)
        cache["k"] = cache["k"].at[:, :, :, :T].set(pk_t)
        cache["v"] = cache["v"].at[:, :, :T, :].set(pv_t)
    else:
        cache["k"] = cache["k"].at[:, :, :, :T].set(pk)
        cache["v"] = cache["v"].at[:, :, :, :T].set(pv)
    x = _layer_norm(params["ln_f"], x, cfg.layer_norm_eps)
    # every row's last prompt token sits at T-1 (left padding)
    last_h = x[:, -1]  # [B, C]
    first_logits = jnp.einsum(
        "bc,vc->bv", last_h, params["wte"], precision=precision,
        preferred_element_type=jnp.float32,
    )

    # ---- decode loop ----
    def sample(rng_i, logits):
        logits = logits / temperature
        if top_k is None:
            return jax.random.categorical(rng_i, logits, axis=-1).astype(jnp.int32)
        k = min(top_k, cfg.vocab_size)
        # Sample among the k CANDIDATES instead of masking the full-vocab
        # row and sampling [B, 53k]: categorical over [B, k] + an index
        # gather replaces the where-mask, the 53k-wide gumbel draw and the
        # 53k-wide argmax — ~3 fewer full-vocab passes per decode step.
        # The distribution is the reference's torch.topk filter (exactly k
        # candidates; the old mask kept >k only on exact float ties, a
        # measure-zero event the reference doesn't keep either).
        if jax.default_backend() == "tpu" and not exact_topk:
            # exact lax.top_k over the 53k vocab costs ~0.35 ms of a
            # ~2 ms decode step; approx_max_k is the TPU-native
            # partial-reduce. A missed candidate only swaps in a
            # slightly-lower-probability tail token — within the
            # sampler's distributional contract (decoders.py; the
            # reference samples stochastically too). Parity-sensitive
            # decode studies pass exact_topk=True to force the
            # reference-exact torch.topk-equivalent candidate set.
            vals, idxs = jax.lax.approx_max_k(logits, k, recall_target=0.99)
        else:
            vals, idxs = jax.lax.top_k(logits, k)
        choice = jax.random.categorical(rng_i, vals, axis=-1)  # [B] in [0, k)
        return jnp.take_along_axis(
            idxs, choice[:, None], axis=-1
        )[:, 0].astype(jnp.int32)

    def decode_step(params, cache, tok, pos):
        """One token forward using the cache; returns (logits, cache).

        ``pos`` is the (scalar) shared cache slot; row i's position id is
        pos - start[i]. The layer loop is a lax.scan over the stacked
        layer params with the cache rows as scan inputs; each layer emits
        only its new (k, v) slot, and the cache is updated with ONE
        dynamic_update_slice across all layers after the scan — the
        current token attends to itself via an explicit self term, so the
        scan body never needs the updated cache.

        Cache layout matches the attention impl (see _init_cache): the
        Pallas kernel and the blockdiag einsums (TPU bf16) read the
        unpadded k [B, nh*dh, slots] / v [B, slots, nh*dh] orientations;
        the "xla" path (CPU tests, f32 studies) reads the head-split
        [B, nh, slots, dh] cache directly."""
        x = params["wte"][tok[:, None]] + params["wpe"][pos - start][:, None]
        slots = jnp.arange(cache_len)[None, :]
        # strictly-older slots; the current token's contribution is the
        # self term appended below
        valid_bl = (slots >= start[:, None]) & (slots < pos)  # [B, L]
        valid = valid_bl[:, None, None, :]
        scale = dh**-0.5

        interp = jax.default_backend() != "tpu"

        def layer_fn(x, xs):
            # kernel: ck [B, nh*dh, cache_len], cv [B, cache_len, nh*dh]
            # einsum: ck = cv layout [B, nh, cache_len, dh]
            layer, ck, cv = xs
            if fused_step:
                # one Pallas call for LN1 + qkv (ops/decode_step_fused.py)
                from ..ops.decode_step_fused import decode_qkv

                qkv = decode_qkv(
                    x[:, 0], layer["ln1"]["scale"], layer["ln1"].get("bias"),
                    layer["attn"]["qkv"]["kernel"],
                    layer["attn"]["qkv"].get("bias"),
                    eps=cfg.layer_norm_eps, interpret=interp,
                )[:, None]
                q, k, v = (
                    jnp.swapaxes(t.reshape(B, 1, nh, dh), 1, 2)
                    for t in jnp.split(qkv, 3, axis=-1)
                )
            else:
                h = _layer_norm(layer["ln1"], x, cfg.layer_norm_eps)
                q, k, v = _attn_qkv(layer, h, cfg, precision)  # [B, nh, 1, dh]
            if attn_impl == "kernel" and fused_step:
                # fully-fused path: self-term, normalization and head
                # compaction all inside the kernel; output is the flat
                # head-concat layout the out-projection consumes
                from ..ops.decode_attention import decode_attention_fused

                k_flat = k[:, :, 0, :].reshape(B, cfg.n_embd)
                v_flat = v[:, :, 0, :].reshape(B, cfg.n_embd)
                a = decode_attention_fused(
                    (q[:, :, 0, :] * scale).astype(dtype), ck, cv, valid_bl,
                    k_flat, v_flat,
                    interpret=jax.default_backend() != "tpu",
                )[:, None]  # [B, 1, n_embd]
                from ..ops.decode_step_fused import decode_ffn

                x = decode_ffn(
                    x[:, 0], a[:, 0],
                    layer["attn"]["out"]["kernel"],
                    layer["ln2"]["scale"], layer["ln2"].get("bias"),
                    layer["mlp"]["in"]["kernel"],
                    layer["mlp"]["out"]["kernel"],
                    layer["attn"]["out"].get("bias"),
                    layer["mlp"]["in"].get("bias"),
                    layer["mlp"]["out"].get("bias"),
                    eps=cfg.layer_norm_eps, interpret=interp,
                )[:, None]
                return x, (k_flat, v_flat)
            s_self = jnp.sum(
                (q * k).astype(jnp.float32), axis=-1, keepdims=True
            ) * scale  # [B, nh, 1, 1]
            if attn_impl == "kernel":
                from ..ops.decode_attention import decode_attention

                acc, m, l = decode_attention(
                    (q[:, :, 0, :] * scale).astype(dtype), ck, cv, valid_bl,
                    interpret=jax.default_backend() != "tpu",
                )
                s1 = s_self[:, :, 0, :]  # [B, nh, 1]
                mx = jnp.maximum(m, s1)
                alpha, w = jnp.exp(m - mx), jnp.exp(s1 - mx)
                a = (acc * alpha + w * v[:, :, 0, :].astype(jnp.float32)) / (
                    l * alpha + w
                )
                a = a.astype(dtype)[:, :, None, :]
            elif attn_impl == "blockdiag":
                # kernel-layout caches read by plain XLA einsums via a
                # block-diagonal Qb [B, nh, nh*dh] (row h is q_h at lanes
                # h*dh..(h+1)*dh, zero elsewhere): the score contraction is
                # 768-wide (full (8,128) tiles — the head-split cache's
                # dh=64 minor dim half-pads every tile = 2x HBM bytes) and
                # the 12x structural-zero FLOPs ride the MXU for free.
                # Output extraction mirrors it: head h's values land at
                # lanes h*dh.. of the [B, nh, nh*dh] cross product; an eye
                # mask-and-sum pulls the diagonal blocks. Exactness vs the
                # head-split einsum: the extra products are exact zeros.
                q_flat = (q[:, :, 0, :] * scale).astype(dtype)  # [B, nh, dh]
                eye = jnp.eye(nh, dtype=dtype)
                qb = (q_flat[:, :, None, :] * eye[None, :, :, None]).reshape(
                    B, nh, cfg.n_embd)
                s_cache = jnp.einsum(
                    "bhc,bcl->bhl", qb, ck,
                    precision=precision, preferred_element_type=jnp.float32,
                )
                s_cache = jnp.where(valid_bl[:, None, :], s_cache, neg)
                scores = jnp.concatenate(
                    [s_cache, s_self[:, :, 0, :]], axis=-1)  # [B, nh, L+1]
                probs = jax.nn.softmax(scores, axis=-1).astype(dtype)
                cross = jnp.einsum(
                    "bhl,blc->bhc", probs[..., :cache_len], cv,
                    precision=precision, preferred_element_type=jnp.float32,
                )  # [B, nh, nh*dh]
                acc = jnp.sum(
                    cross.reshape(B, nh, nh, dh)
                    * jnp.eye(nh, dtype=jnp.float32)[None, :, :, None],
                    axis=2,
                )  # [B, nh, dh]
                a = acc + probs[..., cache_len:].astype(jnp.float32) * v[
                    :, :, 0, :].astype(jnp.float32)
                a = a.astype(dtype)[:, :, None, :]
            else:
                # head-split [B, nh, cache_len, dh] direct einsums — one
                # fused XLA op pair per layer; fastest at B >= 16
                s_cache = jnp.einsum(
                    "bhqd,bhkd->bhqk", q, ck,
                    precision=precision, preferred_element_type=jnp.float32,
                ) * scale
                s_cache = jnp.where(valid, s_cache, neg)
                scores = jnp.concatenate([s_cache, s_self], axis=-1)
                probs = jax.nn.softmax(scores, axis=-1).astype(dtype)
                a = jnp.einsum(
                    "bhqk,bhkd->bhqd", probs[..., :cache_len], cv,
                    precision=precision, preferred_element_type=jnp.float32,
                ).astype(dtype) + probs[..., cache_len:].astype(dtype) * v
            a = jnp.swapaxes(a, 1, 2).reshape(B, 1, cfg.n_embd)
            if fused_step:
                # one Pallas call for out-proj + residual + LN2 + MLP
                from ..ops.decode_step_fused import decode_ffn

                x = decode_ffn(
                    x[:, 0], a[:, 0],
                    layer["attn"]["out"]["kernel"],
                    layer["ln2"]["scale"], layer["ln2"].get("bias"),
                    layer["mlp"]["in"]["kernel"], layer["mlp"]["out"]["kernel"],
                    layer["attn"]["out"].get("bias"),
                    layer["mlp"]["in"].get("bias"),
                    layer["mlp"]["out"].get("bias"),
                    eps=cfg.layer_norm_eps, interpret=interp,
                )[:, None]
            else:
                x = x + _linear(layer["attn"]["out"], a, precision)
                h = _layer_norm(layer["ln2"], x, cfg.layer_norm_eps)
                h = _linear(layer["mlp"]["in"], h, precision)
                h = jax.nn.gelu(h, approximate=False)
                x = x + _linear(layer["mlp"]["out"], h, precision)
            if kernel_layout:
                return x, (
                    k[:, :, 0, :].reshape(B, cfg.n_embd),
                    v[:, :, 0, :].reshape(B, cfg.n_embd),
                )
            return x, (k, v)  # [B, nh, 1, dh] each

        x, (knew, vnew) = jax.lax.scan(
            layer_fn, x, (params["layers_stacked"], cache["k"], cache["v"])
        )
        if kernel_layout:
            cache = {
                "k": jax.lax.dynamic_update_slice(
                    cache["k"], knew[..., None], (0, 0, 0, pos)
                ),
                "v": jax.lax.dynamic_update_slice(
                    cache["v"], vnew[:, :, None, :], (0, 0, pos, 0)
                ),
            }
        else:
            cache = {
                "k": jax.lax.dynamic_update_slice(
                    cache["k"], knew, (0, 0, 0, pos, 0)
                ),
                "v": jax.lax.dynamic_update_slice(
                    cache["v"], vnew, (0, 0, 0, pos, 0)
                ),
            }
        x = _layer_norm(params["ln_f"], x, cfg.layer_norm_eps)
        logits = jnp.einsum(
            "bc,vc->bv", x[:, 0], params["wte"], precision=precision,
            preferred_element_type=jnp.float32,
        )
        return logits, cache

    # static buffer at the block budget; runtime cap is `max_new` (dynamic)
    max_buf = cfg.block_size
    out_buf = jnp.full((B, max_buf), -1, jnp.int32)

    def cond(state):
        i, done, *_ = state
        return jnp.logical_and(i < max_new, jnp.logical_not(jnp.all(done)))

    def body(state):
        i, done, rng, cache, logits, out_buf = state
        rng, sub = jax.random.split(rng)
        tok = sample(sub, logits)
        is_stop = tok == stop_token  # [B]
        # branch-free write: rows at/after their stop record -1 (excluded),
        # matching the reference's break-before-append (gpt2_model.py:274).
        # NB: lax.cond here exploded XLA compile time ~15x inside while_loop.
        write = jnp.where(done | is_stop, jnp.full_like(tok, -1), tok)
        out_buf = jax.lax.dynamic_update_slice(out_buf, write[:, None], (0, i))
        pos = prompt_bucket + i
        new_logits, cache = decode_step(params, cache, tok, pos)
        return (i + 1, done | is_stop, rng, cache, new_logits, out_buf)

    state = (jnp.asarray(0, jnp.int32), done0, rng, cache, first_logits, out_buf)
    state = jax.lax.while_loop(cond, body, state)
    return state[5], state[1]


def expand_vocab(params, new_vocab_size: int, seed: int = 0):
    """Grow the tied embedding/lm_head to ``new_vocab_size``.

    New rows are sampled from a gaussian matched to the old embeddings'
    mean and (scaled) covariance — the Hewitt vocabulary-expansion recipe
    the reference uses (gpt2_model.py:282-303, covariance scaled 1e-5).
    """
    old = np.asarray(params["wte"], np.float64)
    old_v, dim = old.shape
    if new_vocab_size <= old_v:
        raise ValueError(f"new vocab {new_vocab_size} <= old {old_v}")
    mu = old.mean(axis=0)
    centered = old - mu
    sigma = centered.T @ centered / old_v
    rng = np.random.default_rng(seed)
    new_rows = rng.multivariate_normal(
        mu, 1e-5 * sigma, size=new_vocab_size - old_v, method="svd"
    )
    wte = np.concatenate([old, new_rows]).astype(np.float32)
    out = dict(params)
    out["wte"] = jnp.asarray(wte)
    return out


# ---------------------------------------------------------------------------
# Random init
# ---------------------------------------------------------------------------


def init_gpt_params(rng, cfg: GPTConfig):
    C, V = cfg.n_embd, cfg.vocab_size

    def lin(din, dout, bias):
        p = {"kernel": jnp.asarray(rng.standard_normal((din, dout)) * 0.02, jnp.float32)}
        p["bias"] = jnp.zeros((dout,), jnp.float32) if bias else None
        return p

    def ln(d):
        return {
            "scale": jnp.ones((d,), jnp.float32),
            "bias": jnp.zeros((d,), jnp.float32) if cfg.bias else None,
        }

    params = {
        "wte": jnp.asarray(rng.standard_normal((V, C)) * 0.02, jnp.float32),
        "wpe": jnp.asarray(rng.standard_normal((cfg.block_size, C)) * 0.02, jnp.float32),
        "ln_f": ln(C),
        "layers": [],
    }
    std_proj = 0.02 / np.sqrt(2 * cfg.n_layer)
    for _ in range(cfg.n_layer):
        out_attn = lin(C, C, cfg.bias)
        out_attn["kernel"] = jnp.asarray(
            rng.standard_normal((C, C)) * std_proj, jnp.float32
        )
        out_mlp = lin(4 * C, C, cfg.bias)
        out_mlp["kernel"] = jnp.asarray(
            rng.standard_normal((4 * C, C)) * std_proj, jnp.float32
        )
        params["layers"].append(
            {
                "ln1": ln(C),
                "attn": {"qkv": lin(C, 3 * C, cfg.bias), "out": out_attn},
                "ln2": ln(C),
                "mlp": {"in": lin(C, 4 * C, cfg.bias), "out": out_mlp},
            }
        )
    return params
