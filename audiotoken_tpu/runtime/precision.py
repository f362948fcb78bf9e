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
