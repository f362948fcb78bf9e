"""Pallas TPU kernel: fused residual-VQ encode.

The jnp RVQ path (nn/rvq.py) emits, per codebook, a [N, C] distance matmul
plus a gather — 16 sequential HBM round-trips of the [N, D] residual and
[N, C] scores. This kernel runs the whole codebook cascade on-chip: the
residual tile lives in VMEM across all K codebooks, distances and the
argmin stay in VMEM, and de-quantization is a one-hot MXU matmul (TPU-
friendly, no gather). HBM traffic drops to: read x once, read codebooks
once, write [K, N] int32 codes.

Grid: one program per N-tile. Codebooks [K, C, D] ride VMEM whole
(16 x 1024 x 128 f32 = 8 MB at the default bandwidth ladder).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 256


def _rvq_kernel(x_ref, cb_ref, e2_ref, out_ref, *, num_q: int):
    residual = x_ref[:].astype(jnp.float32)  # [TILE_N, D]
    C = cb_ref.shape[1]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (TILE_N, C), dimension=1)
    for k in range(num_q):
        cb = cb_ref[k].astype(jnp.float32)  # [C, D]
        x2 = jnp.sum(residual * residual, axis=-1, keepdims=True)
        xe = jax.lax.dot_general(
            residual, cb,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,  # f32 passes: token parity
        )  # [TILE_N, C]
        neg_dist = -(x2 - 2.0 * xe + e2_ref[k][None, :])
        idx = jnp.argmax(neg_dist, axis=-1).astype(jnp.int32)  # first-max
        out_ref[k, :] = idx
        onehot = (col_ids == idx[:, None]).astype(jnp.float32)
        quant = jax.lax.dot_general(
            onehot, cb,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        residual = residual - quant


@partial(jax.jit, static_argnames=("num_q", "interpret"))
def rvq_encode_pallas(
    codebooks: jnp.ndarray,
    embeddings: jnp.ndarray,
    num_q: int,
    interpret: bool = False,
):
    """codebooks [K, C, D], embeddings [B, T, D] -> codes [B, num_q, T] int32.

    Same distance expression and first-min tie-breaking as nn/rvq.py.
    """
    B, T, D = embeddings.shape
    x = embeddings.reshape(B * T, D).astype(jnp.float32)
    N = x.shape[0]
    pad = (-N) % TILE_N
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    n_tiles = (N + pad) // TILE_N

    cbs = codebooks[:num_q].astype(jnp.float32)
    e2 = jnp.sum(cbs * cbs, axis=-1)  # [K, C]

    codes = pl.pallas_call(
        partial(_rvq_kernel, num_q=num_q),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((TILE_N, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((num_q, cbs.shape[1], D), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_q, cbs.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((num_q, TILE_N), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num_q, N + pad), jnp.int32),
        interpret=interpret,
    )(x, cbs, e2)

    return codes[:, :N].reshape(num_q, B, T).transpose(1, 0, 2)


def rvq_vmem_ok(num_q: int, codebook_size: int, dim: int) -> bool:
    """Whole-codebook-in-VMEM feasibility (leave headroom for tiles)."""
    bytes_needed = num_q * codebook_size * dim * 4 + num_q * codebook_size * 4
    return bytes_needed <= 12 * 1024 * 1024
