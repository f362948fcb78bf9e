"""Numerics policy.

The reference runs bf16 autocast on CUDA and f32 on CPU
(/root/reference/audiotoken/encoder.py:45, utils.py:21-23); BASELINE.md's
token-parity configs are defined against the f32 CPU reference. On TPU the
MXU defaults to bf16 passes for f32 operands, so parity-grade code must
request ``Precision.HIGHEST`` explicitly. This module centralizes that
choice:

  - "highest":  f32 operands, HIGHEST matmul/conv passes (token parity)
  - "high":     f32 operands, HIGH (bf16x3 MXU passes — ~2x the HIGHEST
                matmul rate at ~1e-6 relative error; see the measured
                agreement ladder in ARCHITECTURE.md before using for
                token production)
  - "default":  f32 operands, DEFAULT (bf16 MXU passes; fastest f32-ish)
  - "bfloat16": bf16 operands end-to-end (speed; analog of CUDA autocast)
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class Policy:
    name: str
    compute_dtype: jnp.dtype
    matmul_precision: jax.lax.Precision

    def cast(self, x):
        return jnp.asarray(x, self.compute_dtype)


_POLICIES = {
    "highest": Policy("highest", jnp.float32, jax.lax.Precision.HIGHEST),
    "high": Policy("high", jnp.float32, jax.lax.Precision.HIGH),
    "default": Policy("default", jnp.float32, jax.lax.Precision.DEFAULT),
    "bfloat16": Policy("bfloat16", jnp.bfloat16, jax.lax.Precision.DEFAULT),
}


def get_policy(name) -> Policy:
    if isinstance(name, Policy):
        return name
    try:
        return _POLICIES[name]
    except KeyError:
        raise ValueError(f"unknown precision policy {name!r}; use one of {list(_POLICIES)}")


class StagePrecision:
    """Per-stage matmul-precision map (VERDICT r4 #3: bisect WHICH stage's
    rounding flips tokens at 'high', then run only that stage at HIGHEST).

    Callable: ``prec("ffn_in")`` returns the `jax.lax.Precision` for that
    stage — the override if present, else the default. Stage names on the
    semantic_m forward path (encoders.py / nn/conformer.py):

        fbank      the folded-DFT + mel matmuls (nn/fbank.py)
        proj       feature projection 160 -> 1024
        ffn_in     both half-step FFNs' H -> 4H linears (all layers)
        ffn_out    both FFNs' 4H -> H linears
        attn_qkv   q/k/v projections
        attn_scores  the q.k^T dot (XLA attention path)
        attn_pos   the q.E^T distance-embedding dot (XLA path)
        attn_pv    the probs.v dot (XLA path)
        attn_out   attention output projection
        attn_kernel  every dot INSIDE the flash kernel (the Pallas path
                     has one precision; HIGH lowers to DEFAULT there —
                     ops/flash_attention.py:368)
        conv       the conv module's two pointwise linears
        vq         the nearest-centroid distance dot (ops/lookup.py)

    Values may be policy names ("high") or `jax.lax.Precision` members.
    """

    STAGES = (
        "fbank", "proj", "ffn_in", "ffn_out", "attn_qkv", "attn_scores",
        "attn_pos", "attn_pv", "attn_out", "attn_kernel", "conv", "vq",
    )

    def __init__(self, default, overrides=None):
        self.default = self._resolve(default)
        self.overrides = {}
        for stage, val in (overrides or {}).items():
            if stage not in self.STAGES:
                raise ValueError(
                    f"unknown precision stage {stage!r}; use one of {self.STAGES}"
                )
            self.overrides[stage] = self._resolve(val)

    @staticmethod
    def _resolve(val):
        if isinstance(val, str):
            return get_policy(val).matmul_precision
        return val

    def __call__(self, stage: str):
        return self.overrides.get(stage, self.default)

    def __repr__(self):
        return f"StagePrecision({self.default}, {self.overrides})"


#: Round-5 measured "mixed" mode for the semantic_m (w2v-BERT conformer)
#: path: the 4-seed x 12-case bisect (scripts/bisect_precision.py,
#: tests/goldens/BISECT_r5.log) localized every 'high'-policy token flip
#: to exactly two stage groups — the fbank front (flips dc_offset_i16 on
#: every seed) and the in-flash-kernel attention dots, where 'high'
#: lowers to a single bf16 pass (flips noise/harmonic rows ~1 frame/400).
#: Running ONLY those at HIGHEST restores exactness 1.000000 on all 4
#: seeds at 525x device RTFx (vs 380x all-HIGHEST / 596x all-'high').
#: The attn_scores/pos/pv entries are the XLA-attention-path analog of
#: attn_kernel (unused — and free — under the flash kernel); the mixed
#: mode's exactness evidence is the TPU flash path.
W2VBERT_MIXED_OVERRIDES = {
    "fbank": "highest",
    "attn_kernel": "highest",
    "attn_scores": "highest",
    "attn_pos": "highest",
    "attn_pv": "highest",
}


def resolve_mixed(precision, stage_overrides, mixed_overrides):
    """Expand the named 'mixed' policy into (base_policy, overrides);
    explicit user stage_overrides win over the named set."""
    if precision == "mixed":
        return "high", {**mixed_overrides, **(stage_overrides or {})}
    return precision, stage_overrides


def as_stage_precision(precision) -> StagePrecision:
    """Wrap a plain Precision (or policy name) into a constant stage map;
    StagePrecision instances pass through."""
    if isinstance(precision, StagePrecision):
        return precision
    return StagePrecision(precision)
