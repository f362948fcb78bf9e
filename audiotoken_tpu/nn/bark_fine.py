"""Bark "fine acoustics" model: non-causal GPT filling EnCodec codebooks 3-8.

Stage 2 of semantic decode (SURVEY.md §3.4): given the 2 coarse codebooks
from the AR GPT, iteratively predict codebooks 2..7 with a non-causal
transformer over 1024-frame windows sliding by 512. Reference usage:
/root/reference/audiotoken/decoder.py:103-121, 196-208
(``bark.api.generate_fine(x_coarse_gen=tokens[0:2], ...)``, default
temperature 0.5).

Architecture (suno/bark fine checkpoint): 24 pre-LN GPT blocks without the
causal mask, hidden 1024, 16 heads, one embedding table per codebook
(summed up to the predicted codebook), one lm_head per predicted codebook.

TPU mapping: the window loop is a short host loop (content-length
dependent); each window runs a jitted static-shape [B, 1024, 8] forward per
codebook, with sampling via jax.random.categorical (temperature=None ->
argmax, deterministic).
"""

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class BarkFineConfig:
    block_size: int = 1024
    vocab_size: int = 1056  # codebook 1024 + specials
    n_layer: int = 24
    n_head: int = 16
    n_embd: int = 1024
    n_codes_total: int = 8
    n_codes_given: int = 1
    bias: bool = False  # linear layers; layer norms always carry bias
    layer_norm_eps: float = 1e-5
    codebook_size: int = 1024
    max_history: int = 512  # window slide
    # filler id for unknown codebook slots == codebook_size


def _layer_norm(p, x, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    h = (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"]
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


@partial(jax.jit, static_argnames=("cfg", "codebook_idx", "precision", "attn_impl"))
def bark_fine_logits(
    params,
    codes: jnp.ndarray,
    codebook_idx: int,
    cfg: BarkFineConfig = BarkFineConfig(),
    precision=jax.lax.Precision.HIGHEST,
    attn_impl: str = "xla",
) -> jnp.ndarray:
    """codes [B, T, n_codes_total] -> logits [B, T, vocab] for codebook
    ``codebook_idx`` (sum of embeddings of codebooks 0..codebook_idx).

    ``attn_impl="flash"`` runs the non-causal attention through the
    blockwise Pallas kernel (ops/flash_attention.py, no rel bias / no
    padding mask): the XLA path materializes [B, nh, 1024, 1024] f32
    scores per layer — ~1 GB of HBM write+read x 24 layers x 6 cascade
    passes which dominates the fine stage's time on TPU."""
    B, T, _ = codes.shape
    x = jnp.zeros((B, T, cfg.n_embd), params["wpe"].dtype)
    for i in range(codebook_idx + 1):
        x = x + params["wtes"][i][codes[:, :, i]]
    x = x + params["wpe"][jnp.arange(T)]

    nh, dh = cfg.n_head, cfg.n_embd // cfg.n_head
    for layer in params["layers"]:
        h = _layer_norm(layer["ln1"], x, cfg.layer_norm_eps)
        qkv = _linear(layer["attn"]["qkv"], h, precision)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return jnp.swapaxes(t.reshape(B, T, nh, dh), 1, 2)

        q, k, v = heads(q), heads(k), heads(v)
        if attn_impl == "flash":
            from ..ops.flash_attention import flash_attention_relkey

            a = flash_attention_relkey(
                q, k, v, None, None, precision=precision,
                interpret=jax.default_backend() != "tpu",
            )
        else:
            scores = jnp.einsum(
                "bhqd,bhkd->bhqk", q, k, precision=precision,
                preferred_element_type=jnp.float32,
            ) * (dh**-0.5)
            probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
            a = jnp.einsum(
                "bhqk,bhkd->bhqd", probs, v, precision=precision,
                preferred_element_type=jnp.float32,
            ).astype(x.dtype)
        a = jnp.swapaxes(a, 1, 2).reshape(B, T, cfg.n_embd)
        x = x + _linear(layer["attn"]["out"], a, precision)
        h = _layer_norm(layer["ln2"], x, cfg.layer_norm_eps)
        h = _linear(layer["mlp"]["in"], h, precision)
        h = jax.nn.gelu(h, approximate=False)
        x = x + _linear(layer["mlp"]["out"], h, precision)

    x = _layer_norm(params["ln_f"], x, cfg.layer_norm_eps)
    head = params["lm_heads"][codebook_idx - cfg.n_codes_given]
    return jnp.einsum(
        "btc,cv->btv", x, head, precision=precision,
        preferred_element_type=jnp.float32,
    )


@partial(
    jax.jit,
    static_argnames=("cfg", "precision", "n_coarse", "use_argmax", "attn_impl"),
)
def _fill_window(
    params,
    buf,
    rel_fill,
    rng,
    temperature,
    *,
    cfg: BarkFineConfig,
    precision,
    n_coarse: int,
    use_argmax: bool,
    attn_impl: str = "xla",
):
    """Fill codebooks n_coarse..7 of one [1, window, 8] buffer ON DEVICE.

    The whole 6-codebook cascade (forward + sample + buffer update) runs in
    one jit — the host loop only slides windows. (A per-codebook host loop
    paid 6 device->host logit fetches per window; on this interconnect that
    dominated decode time.) Positions < rel_fill keep their existing
    values via a mask instead of a dynamic slice.
    """
    T = buf.shape[1]
    keep_new = (jnp.arange(T)[None, :] >= rel_fill)
    for cb in range(n_coarse, cfg.n_codes_total):
        logits = bark_fine_logits(params, buf, cb, cfg, precision, attn_impl)
        relevant = logits[:, :, : cfg.codebook_size]
        if use_argmax:
            preds = jnp.argmax(relevant, axis=-1)
        else:
            rng, sub = jax.random.split(rng)
            preds = jax.random.categorical(sub, relevant / temperature, axis=-1)
        newcol = jnp.where(keep_new, preds.astype(jnp.int32), buf[:, :, cb])
        buf = buf.at[:, :, cb].set(newcol)
    return buf


class BarkFineGenerator:
    """Sliding-window fine-codebook inpainting (bark generate_fine).

    ``attn_impl``: "flash" (default on TPU) keeps attention scores in
    VMEM via the blockwise Pallas kernel; "xla" (default elsewhere) is
    the plain materialized-scores path. Outputs are identical for
    temperature=None (argmax) and distributionally equivalent when
    sampling (the fine stage already runs bf16/DEFAULT, decoders.py)."""

    def __init__(self, cfg: BarkFineConfig, params,
                 precision=jax.lax.Precision.HIGHEST,
                 attn_impl: Optional[str] = None):
        self.cfg = cfg
        self.params = params
        self.precision = precision
        if attn_impl is None:
            attn_impl = "flash" if jax.default_backend() == "tpu" else "xla"
        if attn_impl not in ("xla", "flash"):
            raise ValueError(f"attn_impl must be 'xla' or 'flash', got {attn_impl!r}")
        self.attn_impl = attn_impl

    def generate_fine(
        self,
        coarse: np.ndarray,
        temperature: Optional[float] = 0.5,
        seed: int = 0,
    ) -> np.ndarray:
        """coarse [n_coarse, T] ids in [0, codebook_size) ->
        fine [n_codes_total, T]."""
        return self.generate_fine_batch(
            np.asarray(coarse)[None], temperature=temperature, seed=seed
        )[0]

    def generate_fine_batch(
        self,
        coarse: np.ndarray,
        temperature: Optional[float] = 0.5,
        seed: int = 0,
    ) -> np.ndarray:
        """Batched inpainting: coarse [B, n_coarse, T] -> fine
        [B, n_codes_total, T].

        Independent sequences share every window forward — the whole
        [B, window, 8] batch rides one 24-layer pass per codebook instead
        of a per-sequence host loop (VERDICT r1 #4; the reference's
        bark.api.generate_fine is strictly single-sequence,
        decoder.py:103-121). Sequences must share T (pad shorter coarse
        rows with any id and trim the result; bark itself pads short
        inputs to the window with the filler id)."""
        cfg = self.cfg
        B, n_coarse, T = coarse.shape
        filler = cfg.codebook_size
        window = cfg.block_size
        slide = cfg.max_history

        # [B, T, 8]: coarse rows + filler for unknown codebooks
        buf = np.full((B, T, cfg.n_codes_total), filler, np.int32)
        buf[:, :, :n_coarse] = np.swapaxes(coarse, 1, 2)

        n_remove = 0
        if T < window:
            n_remove = window - T
            buf = np.pad(buf, ((0, 0), (0, n_remove), (0, 0)), constant_values=filler)

        n_loops = max(0, int(np.ceil((T - window) / slide))) + 1
        rng = jax.random.PRNGKey(seed)
        # bark.api.generate_fine: argmax ONLY for temp=None; temp=1.0 samples
        use_argmax = temperature is None

        for n_outer in range(n_loops):
            start = min(n_outer * slide, buf.shape[1] - window)
            start_fill = min(n_outer * slide, buf.shape[1] - slide)
            rel_fill = start_fill - start
            rng, sub = jax.random.split(rng)
            filled = np.asarray(
                _fill_window(
                    self.params,
                    jnp.asarray(buf[:, start : start + window, :]),
                    jnp.asarray(rel_fill, jnp.int32),
                    sub,
                    jnp.asarray(1.0 if use_argmax else temperature, jnp.float32),
                    cfg=cfg,
                    precision=self.precision,
                    n_coarse=n_coarse,
                    use_argmax=use_argmax,
                    attn_impl=self.attn_impl,
                )
            )
            buf[:, start_fill : start_fill + (window - rel_fill), n_coarse:] = filled[
                :, rel_fill:, n_coarse:
            ]

        out = np.swapaxes(buf, 1, 2)  # [B, 8, T(+pad)]
        if n_remove > 0:
            out = out[:, :, :-n_remove]
        return out


def init_bark_fine_params(rng, cfg: BarkFineConfig = BarkFineConfig()):
    C = cfg.n_embd

    def lin(din, dout, bias):
        p = {"kernel": jnp.asarray(rng.standard_normal((din, dout)) * 0.02, jnp.float32)}
        p["bias"] = jnp.zeros((dout,), jnp.float32) if bias else None
        return p

    def ln(d):
        return {"scale": jnp.ones((d,), jnp.float32), "bias": jnp.zeros((d,), jnp.float32)}

    return {
        "wtes": [
            jnp.asarray(rng.standard_normal((cfg.vocab_size, C)) * 0.02, jnp.float32)
            for _ in range(cfg.n_codes_total)
        ],
        "wpe": jnp.asarray(rng.standard_normal((cfg.block_size, C)) * 0.02, jnp.float32),
        "ln_f": ln(C),
        "lm_heads": [
            jnp.asarray(rng.standard_normal((C, cfg.vocab_size)) * 0.02, jnp.float32)
            for _ in range(cfg.n_codes_total - cfg.n_codes_given)
        ],
        "layers": [
            {
                "ln1": ln(C),
                "attn": {"qkv": lin(C, 3 * C, cfg.bias), "out": lin(C, C, cfg.bias)},
                "ln2": ln(C),
                "mlp": {"in": lin(C, 4 * C, cfg.bias), "out": lin(4 * C, C, cfg.bias)},
            }
            for _ in range(cfg.n_layer)
        ],
    }
