"""Pallas TPU kernel: LSTM recurrence with VMEM-resident state.

The SEANet bottleneck LSTM (nn/seanet.py:lstm_skip) is a 2250-step
sequential scan; under XLA each step round-trips the [B, H] state and
launches tiny ops. This kernel keeps h/c in VMEM scratch that PERSISTS
across the (sequential) TPU grid, streams the pre-computed input
projections xi = x@Wih^T + b tile by tile (the pipeline double-buffers the
DMA), and runs the per-step [B, H] @ [H, 4H] recurrence matmul on the MXU
with zero HBM traffic for the state.

Gate order (i, f, g, o) and arithmetic match torch nn.LSTM, as consumed by
the EnCodec checkpoints (SURVEY.md §2.4 "LSTM ... via lax.scan").
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T_TILE = 32
B_TILE = 8  # batch rows per grid step: VMEM stays constant at any batch


def _lstm_kernel(xi_ref, whht_ref, out_ref, h_ref, c_ref):
    """Time-major refs: xi [T_TILE, B_TILE, 4H], out [T_TILE, B_TILE, H] —
    dynamic time indexing stays on the leading (cheap) dimension. Grid is
    (batch tiles, time tiles), time innermost: state resets at each batch
    tile's first time step and persists across its time tiles."""

    @pl.when(pl.program_id(1) == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)
        c_ref[:] = jnp.zeros_like(c_ref)

    H = h_ref.shape[-1]

    def body(t, _):
        h = h_ref[:]
        gates = xi_ref[t] + jnp.dot(
            h, whht_ref[:],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        i = jax.nn.sigmoid(gates[:, :H])
        f = jax.nn.sigmoid(gates[:, H : 2 * H])
        g = jnp.tanh(gates[:, 2 * H : 3 * H])
        o = jax.nn.sigmoid(gates[:, 3 * H :])
        c = f * c_ref[:] + i * g
        h = o * jnp.tanh(c)
        h_ref[:] = h
        c_ref[:] = c
        out_ref[t] = h
        return 0

    jax.lax.fori_loop(0, xi_ref.shape[0], body, 0)


@partial(jax.jit, static_argnames=("interpret",))
def lstm_layer_pallas(xi: jnp.ndarray, whh: jnp.ndarray, interpret: bool = False):
    """xi [B, T, 4H] (input projections incl. biases), whh [4H, H] (torch
    layout) -> hidden states [B, T, H] f32."""
    B, T, H4 = xi.shape
    H = H4 // 4
    pad = (-T) % T_TILE
    bpad = (-B) % B_TILE
    if pad or bpad:
        xi = jnp.pad(xi, ((0, bpad), (0, pad), (0, 0)))
    n_tiles = (T + pad) // T_TILE
    nb = (B + bpad) // B_TILE
    whht = jnp.swapaxes(whh, 0, 1).astype(jnp.float32)  # [H, 4H]
    xi_tm = jnp.swapaxes(xi, 0, 1).astype(jnp.float32)  # time-major [T, B, 4H]

    out = pl.pallas_call(
        _lstm_kernel,
        grid=(nb, n_tiles),
        in_specs=[
            pl.BlockSpec(
                (T_TILE, B_TILE, H4), lambda b, i: (i, b, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((H, H4), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (T_TILE, B_TILE, H), lambda b, i: (i, b, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((T + pad, B + bpad, H), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((B_TILE, H), jnp.float32),
            pltpu.VMEM((B_TILE, H), jnp.float32),
        ],
        interpret=interpret,
    )(xi_tm, whht)
    return jnp.swapaxes(out[:T, :B], 0, 1)


def lstm_skip_pallas(params, x, precision=jax.lax.Precision.HIGHEST, interpret=False):
    """Drop-in replacement for nn/seanet.py:lstm_skip using the kernel."""
    h0 = x
    for layer in params["layers"]:
        bias = (layer["bih"] + layer["bhh"]).astype(jnp.float32)
        xi = jnp.einsum(
            "bti,gi->btg", x.astype(jnp.float32), layer["wih"].astype(jnp.float32),
            precision=precision, preferred_element_type=jnp.float32,
        ) + bias
        x = lstm_layer_pallas(xi, layer["whh"], interpret=interpret)
    return h0 + x.astype(h0.dtype)


# Explored and rejected: a fused 2-layer kernel staggering layer 2 one step
# behind layer 1 (both recurrences + layer 2's input projection in one wide
# per-step matmul). Bit-exact, but measured SLOWER (43 vs 40 ms for
# 8x2400x512): it trades the hoisted, MXU-efficient xi2 = x @ Wih2 batched
# matmul for extra per-step MXU passes — per-step cost here is matmul-work
# bound at HIGHEST precision, not overhead bound.
