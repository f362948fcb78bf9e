"""Pallas TPU kernel: blockwise (flash) attention with in-kernel
`relative_key` position bias.

Replaces the XLA attention in the w2v-BERT conformer for long sequences:
the XLA path materializes [B, H, T, T] f32 scores — 1.15 GB at the 30 s
chunk contract (T=1500, batch 8) and ~5 HBM passes per layer, which is
what capped the semantic_m batch size (VERDICT r1 #5; the op being
replaced is the reference's SDPA patch,
/root/reference/audiotoken/modeling_wav2vec2_bert.py:20-80).

The kernel runs the online-softmax recurrence over key tiles with the
running (max, denominator, accumulator) in VMEM scratch, G=8 (batch,
head) pairs per grid step (batched dots; amortizes the ~1 us/step grid
overhead that dominated the one-head-per-step r2 kernel). The rel-key
bias rel[q, k] = pos[q, clip(k - q + L, 0, P-1)], pos = q @ E^T, is
computed IN-KERNEL without a gather (Mosaic has no efficient
dynamic-lane gather):

  * pos is SHEARED once per q-tile with pltpu.roll's stride mode (row tq
    rolls right by tq, circular mod K_TILE), which aligns every band
    diagonal with its key column for all 3 band-carrying tile offsets at
    once — replacing the r2 kernel's 145 per-diagonal compare+selects
    (~5 ms/layer of VPU time at the 30 s contract);
  * band + clamp regions combine via PRECOMPUTED grid-invariant masks
    (an input, built from iotas in XLA);
  * far tiles are a single edge-column broadcast behind a 2-way cond
    (the r2 5-branch nest cost ~2 ms/layer of predication).

Measured on v5e at T=1500/B=8/H=16/dh=64: 17 ms -> ~2-4 ms per layer at
HIGHEST (within the D2H-latency noise floor of single-op timing; the
19-block encoder numbers in ARCHITECTURE.md are the reliable evidence).
Matmul count per grid step stays 3 (qk^T, pos, pv), compiling in seconds
even at HIGHEST (ARCHITECTURE.md "Kernel decision log").
"""

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# jax >= 0.8 API (the check_vma kwarg below matches it; the legacy
# jax.experimental.shard_map took check_rep instead, so no fallback)
from jax import shard_map as _shard_map

Q_TILE = 256
K_TILE = 256
_PREC = jax.lax.Precision.HIGHEST


@dataclass(frozen=True)
class AttnShard:
    """How to run the flash kernel under a jax.sharding.Mesh.

    pjit has no partitioning rule for a pallas_call, so a mesh-sharded
    model must wrap the kernel in shard_map with the axes the surrounding
    computation uses: ``batch_axis`` for data-parallel encode (batch dim
    of q/k/v sharded, e.g. 'dp'), ``head_axis`` for tensor-parallel
    inference (head dim sharded, e.g. 'tp' — matches
    parallel/shard.py:conformer_param_spec's column-parallel qkv). Either
    may be None. Hashable, so model configs carrying it stay usable as
    static jit arguments.
    """

    mesh: jax.sharding.Mesh
    batch_axis: Optional[str] = None
    head_axis: Optional[str] = None


def _kernel(q_ref, k_ref, v_ref, et_ref, fmask_ref, masks_ref, out_ref,
            m_ref, l_ref, acc_ref, pos_ref, band_ref, *, left: int, right: int,
            scale: float, has_rel: bool, precision=_PREC, packed: bool = False):
    if packed:
        # 2-head-packed grid (bh, head_half, iq, ik): iq is the PER-HEAD
        # q-tile index, so the band-offset math below is unchanged
        iq = pl.program_id(2)
        ik = pl.program_id(3)
        nk = pl.num_programs(3)
    else:
        iq = pl.program_id(1)
        ik = pl.program_id(2)
        nk = pl.num_programs(2)

    q = q_ref[:]  # [G, TQ, dh] — G (batch*head) pairs per grid step
    k = k_ref[:]  # [G, TK, dh]
    v = v_ref[:]
    G, TQ, dh = q.shape
    TK = k.shape[1]

    @pl.when(ik == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)
        if has_rel:
            # pos depends only on the q tile: compute ONCE per q row of
            # the grid, not per key tile. Flattening G into the rows turns
            # the narrow [TQ, dh] x [dh, P] matvec-ish dot into one fat
            # [G*TQ, dh] x [dh, P] MXU call.
            P = et_ref.shape[1]
            pos = jax.lax.dot_general(
                q.reshape(G * TQ, dh), et_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            ).reshape(G, TQ, P)
            pos_ref[:, :, :P] = pos
            pos_ref[:, :, P:] = jnp.zeros_like(pos_ref[:, :, P:])
            # Shear pos so diagonals align with key columns: row tq rolls
            # right by tq (pltpu.roll's stride mode), plus a uniform -left.
            # sheared[g, tq, l] = pos[g, tq, (l - tq + left) mod TK] — i.e.
            # the lane holding key-column l of ANY band tile carries
            # rel = pos[tq, d + left] (d = k - q), because the three
            # band-carrying tile offsets {-TQ, 0, +TK} differ by exactly
            # TK and the roll is circular mod TK. One roll per q-tile
            # replaces the old 145 per-diagonal compare+selects per tile
            # (the r2 kernel's VPU hot spot).
            # circular: a right-roll by TK - left == the needed -left
            band_ref[:] = pltpu.roll(
                pos_ref[:], pos_ref.shape[2] - left, 2, stride=1, stride_axis=1
            )

    # batched over G: one grid step carries G heads' tiles, amortizing the
    # per-step grid/DMA overhead (the r2 kernel ran one head per step —
    # 4608 steps at T=1536/B=8 with ~1 us fixed cost each was the single
    # largest term in its 17 ms/layer)
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=precision,
    )  # [G, TQ, TK]

    if has_rel:
        # --- relative_key bias, gather-free, shear-based ----------------
        # rel[q, k] = pos[q, clip(d + left, 0, P-1)], d = k - q. The band
        # (d in [-left, right]) intersects only the 3 tiles at offsets
        # off = ik*TK - iq*TQ in {-TQ, 0, +TK}; there the bias is the
        # pre-sheared pos (band_ref, one roll per q-tile at ik == 0)
        # combined with the two clamp regions via PRECOMPUTED masks
        # (masks_ref, grid-invariant constants built once in XLA — the r2
        # kernel burned ~5 ms/layer re-deriving per-diagonal masks from
        # iotas in-kernel). Wrap-around aliases of the circular roll land
        # where the band mask is 0 by construction (TK >= left+right+1).
        # Every farther tile is a pure edge-column broadcast selected by
        # the offset sign — a 2-way cond (the r2 5-branch nest cost
        # ~2 ms/layer of predication overhead).
        P = et_ref.shape[1]  # num distance embeddings (left + right + 1)
        pos = pos_ref[:]  # [G, TQ, TK] (pos in the first P lanes)
        off = ik * TK - iq * TQ

        def near(_):
            m = masks_ref[0]  # [3, TQ, TK]: in-band, clamp-lo, clamp-hi
            return (
                m[0][None] * band_ref[:]
                + m[1][None] * pos[:, :, 0:1]
                + m[2][None] * pos[:, :, P - 1 : P]
            )

        def far(_):  # every d beyond the clamp: edge column by offset sign
            lo = jnp.broadcast_to(pos[:, :, 0:1], s.shape)
            hi = jnp.broadcast_to(pos[:, :, P - 1 : P], s.shape)
            return jnp.where(off > 0, hi, lo)

        rel = jax.lax.cond((off == 0) | (off == TK) | (off == -TQ), near, far, None)
        s = s + rel

    s = s * scale
    # padding bias: matches ops/attention.py:padding_bias exactly
    s = s + (1.0 - fmask_ref[0]) * jnp.finfo(jnp.float32).min  # [1,1,TK] bcast

    # --- online softmax --------------------------------------------------
    m_prev = m_ref[:]  # [G, TQ, 1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p_tile = jnp.exp(s - m_new)
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p_tile, axis=-1, keepdims=True)
    # p_tile cast matches v's compute dtype (identity on the f32 parity
    # path; bf16 rounding on the bf16 path, f32 accumulation either way)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p_tile.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=precision,
    )
    m_ref[:] = m_new

    @pl.when(ik == nk - 1)
    def _():
        out_ref[:] = acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)


def _kernel_onepass(q_ref, k_ref, v_ref, out_ref, *, precision=_PREC):
    """Whole-row attention in ONE grid step: exact softmax, no online
    recurrence.

    For rows short enough that G rows' [T, T] f32 scores fit VMEM
    (T <= 1024, G = 2 -> 8 MB) this beats the tiled online-softmax
    kernel decisively: micro-profiled at the Bark-fine NAR shape
    [16, 16, 1024, 64] bf16, 2.23 ms/layer vs 4.17 (tiled 256) /
    3.35 (tiled 512) / 4.42 (XLA f32 scores) — the online recurrence's
    m/l rescale passes and the small tiles' MXU under-fill were the
    cost, not exp (ablations: dots alone 2.77 at tile 256; exp adds
    ~0.3).
    """
    q, k, v = q_ref[:], k_ref[:], v_ref[:]
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=precision,
    )  # [G, T, T]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    acc = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=precision,
    )
    out_ref[:] = (acc / jnp.maximum(l, 1e-30)).astype(out_ref.dtype)


def _kernel_plain(q_ref, k_ref, v_ref, out_ref, m_ref, l_ref, acc_ref,
                  *, precision=_PREC):
    """Lean blockwise attention: no rel bias, no padding mask.

    The Bark-fine NAR stage (nn/bark_fine.py) calls attention with
    neither — its windows are always exactly block_size frames, every
    slot valid. The general kernel still paid a full [G, TQ, TK] VPU
    pass for the all-ones mask bias, two unused [G, TQ, TK] f32 scratch
    buffers (pos/band), a separate scale multiply over the scores, and
    an f32 output round-trip; this variant drops all of it (scale is
    folded into q outside — [B*H, T, dh] once instead of [.., T, T] per
    tile) and writes the output in the compute dtype.
    """
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    q = q_ref[:]  # [G, TQ, dh], pre-scaled
    k = k_ref[:]
    v = v_ref[:]

    @pl.when(ik == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=precision,
    )  # [G, TQ, TK]

    m_prev = m_ref[:]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p_tile = jnp.exp(s - m_new)
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p_tile, axis=-1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p_tile.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=precision,
    )
    m_ref[:] = m_new

    @pl.when(ik == nk - 1)
    def _():
        out_ref[:] = (acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)).astype(
            out_ref.dtype)


@partial(jax.jit, static_argnames=("tile", "interpret", "precision"))
def _flash_attention_plain(q, k, v, *, tile: int = 256,
                           interpret: bool = False, precision=_PREC):
    """q,k,v [B, H, T, dh], T % tile == 0 -> [B, H, T, dh].

    softmax(q k^T / sqrt(dh)) v with no bias and no mask, via
    _kernel_plain. Dispatched from flash_attention_relkey when neither
    rel embedding nor frame mask is present and T needs no padding.
    """
    B, H, T, dh = q.shape
    assert T % tile == 0, (T, tile)
    cdt = jnp.bfloat16 if q.dtype == jnp.bfloat16 else jnp.float32
    qf = (q * (dh**-0.5)).reshape(B * H, T, dh).astype(cdt)
    kf = k.reshape(B * H, T, dh).astype(cdt)
    vf = v.reshape(B * H, T, dh).astype(cdt)
    if B * H == 0:
        return jnp.zeros((B, H, T, dh), q.dtype)
    if T <= 1024:
        # whole rows fit VMEM: single-pass exact softmax, measured ~2x
        # the tiled online-softmax kernel (see _kernel_onepass)
        G = next(g for g in (2, 1) if (B * H) % g == 0)
        out = pl.pallas_call(
            partial(_kernel_onepass, precision=precision),
            grid=(B * H // G,),
            in_specs=[
                pl.BlockSpec((G, T, dh), lambda bh: (bh, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((G, T, dh), lambda bh: (bh, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((G, T, dh), lambda bh: (bh, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((G, T, dh), lambda bh: (bh, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B * H, T, dh), cdt),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(qf, kf, vf)
        return out.reshape(B, H, T, dh).astype(q.dtype)
    G = next(g for g in (8, 4, 2, 1) if H % g == 0)
    grid = (B * H // G, T // tile, T // tile)
    out = pl.pallas_call(
        partial(_kernel_plain, precision=precision),
        grid=grid,
        in_specs=[
            pl.BlockSpec((G, tile, dh), lambda bh, iq, ik: (bh, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, tile, dh), lambda bh, iq, ik: (bh, ik, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, tile, dh), lambda bh, iq, ik: (bh, ik, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G, tile, dh), lambda bh, iq, ik: (bh, iq, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, T, dh), cdt),
        scratch_shapes=[
            pltpu.VMEM((G, tile, 1), jnp.float32),
            pltpu.VMEM((G, tile, 1), jnp.float32),
            pltpu.VMEM((G, tile, dh), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(B, H, T, dh).astype(q.dtype)


@partial(jax.jit, static_argnames=("left", "right", "interpret", "precision",
                                   "pack2"))
def flash_attention_relkey(
    q, k, v, dist_embedding=None, frame_mask=None,
    left: int = 64, right: int = 8, interpret: bool = False,
    precision=_PREC, pack2: Optional[bool] = None,
):
    """q,k,v [B, H, T, dh]; dist_embedding [left+right+1, dh] or None
    (plain attention, e.g. HuBERT); frame_mask [B, T] {0,1} or None ->
    attention output [B, H, T, dh].

    Computes softmax((q k^T + rel) / sqrt(dh) + padding_bias) v with the
    relative_key bias rel[q, k] = (q @ E^T)[q, clip(k-q+left, 0, P-1)],
    without materializing [T, T] scores in HBM.

    ``pack2`` (REJECTED on hardware — keep False): run every MXU dot at
    full 128 width by packing HEAD PAIRS — q becomes block-diagonal over
    2x the q rows ([.., 2Tp, 2dh], zeros off-diagonal), k/v/E^T are
    lane-concatenated, so the dh=64 contraction stops half-filling the
    128-deep systolic array. The interpreter reproduces the unpacked
    kernel bit-for-bit (tests/test_flash_attention.py), but on v5e
    HARDWARE the packed path is WRONG: exactly half the output elements
    (one head of each pair) differ, max abs diff 0.045 at the semantic_m
    shape — a Mosaic lowering divergence, caught by the round-4 golden
    matrix (semantic_m TPU agreement collapsed to ~0.2 while pack2 was
    briefly the auto-default). The measured win was 1.3% (10.52 vs
    10.66 ms/attn at [8,16,1500,64] HIGHEST, chained A/B,
    scripts/profile_flash_pack.py) — the dh=64 half-width MXU theory
    does not hold for this kernel (score-tensor VPU traffic dominates),
    so there is nothing worth debugging the lowering for. Auto-enable
    removed; the code stays as the recorded experiment.
    """
    if precision == jax.lax.Precision.HIGH:
        # Mosaic's dot lowering implements only DEFAULT and HIGHEST
        # (NotImplementedError: Unsupported dot precision: HIGH). Under
        # the 'high' policy the kernel's 3 dots run at DEFAULT (bf16
        # multiplies, f32 accumulation): softmax absorbs most of the
        # score perturbation — 411x vs 369x device RTFx (HIGHEST-dot
        # kernel) at B=8 x 30 s. On the full 4-seed x 8-case golden
        # matrix 'high' (policy-wide bf16x3, this dot downgrade
        # included) flips ~1 frame/400 on well-posed audio, so it is
        # documented as an APPROXIMATE mode for semantic_m
        # (ARCHITECTURE.md round-4 numerics). Parity-grade runs use the
        # 'highest' policy, which keeps every dot at HIGHEST.
        precision = jax.lax.Precision.DEFAULT
    B, H, T, dh = q.shape
    has_rel = dist_embedding is not None
    if not has_rel and frame_mask is None and T % K_TILE == 0:
        # no bias, no mask, tile-aligned (the Bark-fine NAR windows):
        # take the lean kernel (no mask pass, no pos/band scratch, scale
        # folded into q, compute-dtype output)
        return _flash_attention_plain(
            q, k, v, tile=K_TILE, interpret=interpret, precision=precision)
    # the per-offset band pruning in _kernel assumes the band fits the
    # 3 tiles at offsets {-TQ, 0, +TK}; that branch enumeration is only
    # exact when the two tile sizes match (a retuned Q_TILE=128 would put
    # near-band tiles at off=+-128 into the far-clamp branches silently)
    assert Q_TILE == K_TILE, (Q_TILE, K_TILE)
    assert left < Q_TILE and right < K_TILE, (left, right)
    # the sheared pos must fit one tile of lanes and its circular-roll
    # aliases must land outside the band mask
    assert left + right + 1 <= K_TILE, (left, right, K_TILE)
    if not has_rel:
        dist_embedding = jnp.zeros((1, dh), jnp.float32)  # unused dummy
    P = dist_embedding.shape[0]
    scale = dh**-0.5
    pad = (-T) % max(Q_TILE, K_TILE)
    if frame_mask is None:
        frame_mask = jnp.ones((B, T), jnp.float32)
    if pad:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
        frame_mask = jnp.pad(frame_mask, ((0, 0), (0, pad)))
    Tp = T + pad
    # Compute dtype follows the input: bf16 inputs (the Bark-fine NAR
    # stage, distributional contract) keep bf16 dot operands + VMEM blocks
    # (halved traffic; accumulation stays f32 via preferred_element_type);
    # anything else runs f32 (the parity-grade encoder paths).
    cdt = jnp.bfloat16 if q.dtype == jnp.bfloat16 else jnp.float32
    qf = q.reshape(B * H, Tp, dh).astype(cdt)
    kf = k.reshape(B * H, Tp, dh).astype(cdt)
    vf = v.reshape(B * H, Tp, dh).astype(cdt)
    et = jnp.swapaxes(dist_embedding, 0, 1).astype(cdt)  # [dh, P]
    fm = frame_mask.astype(jnp.float32)[:, None, :]  # [B, 1, Tp]

    # Grid-invariant band/clamp masks for the 3 band-carrying tile offsets
    # (off = (o-1)*K_TILE): [offset o, {in-band, clamp-lo, clamp-hi}, TQ, TK].
    # Built here (cheap iota math, XLA) so the kernel never re-derives them.
    qi = jax.lax.broadcasted_iota(jnp.int32, (Q_TILE, K_TILE), 0)
    ki = jax.lax.broadcasted_iota(jnp.int32, (Q_TILE, K_TILE), 1)
    d3 = ki[None] - qi[None] + (jnp.arange(3)[:, None, None] - 1) * K_TILE
    masks = jnp.stack(
        [
            ((d3 >= -left) & (d3 <= right)).astype(jnp.float32),
            (d3 < -left).astype(jnp.float32),
            (d3 > right).astype(jnp.float32),
        ],
        axis=1,
    )  # [3, 3, TQ, TK]

    if B * H == 0:  # empty local shard (mesh larger than batch): no-op
        return jnp.zeros((B, H, T, dh), q.dtype)
    if pack2 is None:
        pack2 = False  # hardware-rejected; see docstring
    if pack2:
        assert dh == 64 and H % 2 == 0, (dh, H)
        P2 = H // 2
        q4 = qf.reshape(B, H, Tp, dh)
        k4 = kf.reshape(B, H, Tp, dh)
        v4 = vf.reshape(B, H, Tp, dh)
        z = jnp.zeros((B, P2, Tp, dh), cdt)
        # block-diagonal q over head pairs: [B*P2, 2Tp, 2dh]
        qb = jnp.concatenate(
            [
                jnp.concatenate([q4[:, 0::2], z], axis=-1),
                jnp.concatenate([z, q4[:, 1::2]], axis=-1),
            ],
            axis=2,
        ).reshape(B * P2, 2 * Tp, 2 * dh)
        kb = jnp.concatenate([k4[:, 0::2], k4[:, 1::2]], axis=-1).reshape(
            B * P2, Tp, 2 * dh)
        vb = jnp.concatenate([v4[:, 0::2], v4[:, 1::2]], axis=-1).reshape(
            B * P2, Tp, 2 * dh)
        etb = jnp.concatenate([et, et], axis=0)  # [2dh, P]
        G = next(g for g in (8, 4, 2, 1) if P2 % g == 0)
        nqh = Tp // Q_TILE
        grid = (B * P2 // G, 2, nqh, Tp // K_TILE)
        out = pl.pallas_call(
            partial(_kernel, left=left, right=right, scale=scale,
                    has_rel=has_rel, precision=precision, packed=True),
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (G, Q_TILE, 2 * dh),
                    lambda bh, hh, iq, ik, nqh=nqh: (bh, hh * nqh + iq, 0),
                    memory_space=pltpu.VMEM),
                pl.BlockSpec((G, K_TILE, 2 * dh),
                             lambda bh, hh, iq, ik: (bh, ik, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((G, K_TILE, 2 * dh),
                             lambda bh, hh, iq, ik: (bh, ik, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2 * dh, P), lambda bh, hh, iq, ik: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (1, 1, K_TILE),
                    lambda bh, hh, iq, ik, G=G, P2=P2: (bh * G // P2, 0, ik),
                    memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (1, 3, Q_TILE, K_TILE),
                    lambda bh, hh, iq, ik: (jax.lax.clamp(0, ik - iq + 1, 2),
                                            0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (G, Q_TILE, 2 * dh),
                lambda bh, hh, iq, ik, nqh=nqh: (bh, hh * nqh + iq, 0),
                memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B * P2, 2 * Tp, 2 * dh),
                                           jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((G, Q_TILE, 1), jnp.float32),
                pltpu.VMEM((G, Q_TILE, 1), jnp.float32),
                pltpu.VMEM((G, Q_TILE, 2 * dh), jnp.float32),
                pltpu.VMEM((G, Q_TILE, K_TILE), jnp.float32),
                pltpu.VMEM((G, Q_TILE, K_TILE), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(qb, kb, vb, etb, fm, masks)
        # unpack: h0 rows carry its output in lanes [:dh], h1 in [dh:]
        o = out.reshape(B, P2, 2, Tp, 2 * dh)
        o = jnp.stack([o[:, :, 0, :, :dh], o[:, :, 1, :, dh:]], axis=2)
        return o.reshape(B, H, Tp, dh)[:, :, :T].astype(q.dtype)
    # G (batch*head) pairs per grid step. G must divide H so every block's
    # G rows share one batch index (the padding-mask block below); 8 tiles
    # ~4 MB of VMEM blocks and amortizes the per-step overhead 8x.
    G = next(g for g in (8, 4, 2, 1) if H % g == 0)
    grid = (B * H // G, Tp // Q_TILE, Tp // K_TILE)
    out = pl.pallas_call(
        partial(_kernel, left=left, right=right, scale=scale, has_rel=has_rel,
                precision=precision),
        grid=grid,
        in_specs=[
            pl.BlockSpec((G, Q_TILE, dh), lambda bh, iq, ik: (bh, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, K_TILE, dh), lambda bh, iq, ik: (bh, ik, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, K_TILE, dh), lambda bh, iq, ik: (bh, ik, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dh, P), lambda bh, iq, ik: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, K_TILE), lambda bh, iq, ik, G=G: (bh * G // H, 0, ik),
                         memory_space=pltpu.VMEM),
            # masks block for this tile's offset class; far tiles clamp to a
            # nearest band block (fetched but unused — consecutive repeats
            # stay VMEM-resident, so the extra DMA is negligible)
            pl.BlockSpec(
                (1, 3, Q_TILE, K_TILE),
                lambda bh, iq, ik: (jax.lax.clamp(0, ik - iq + 1, 2), 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec((G, Q_TILE, dh), lambda bh, iq, ik: (bh, iq, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, Tp, dh), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((G, Q_TILE, 1), jnp.float32),
            pltpu.VMEM((G, Q_TILE, 1), jnp.float32),
            pltpu.VMEM((G, Q_TILE, dh), jnp.float32),
            # hoisted pos, zero-padded to TK lanes (rel mode)
            pltpu.VMEM((G, Q_TILE, K_TILE), jnp.float32),
            # sheared pos: diagonal-aligned band values (rel mode)
            pltpu.VMEM((G, Q_TILE, K_TILE), jnp.float32),
        ],
        # G=8 blocks + [G, TQ, TK] f32 temporaries (scores, rel, p_tile)
        # need ~18 MB scoped VMEM — above the 16 MB default but well under
        # the chip's physical VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(qf, kf, vf, et, fm, masks)
    return out.reshape(B, H, Tp, dh)[:, :, :T].astype(q.dtype)


def flash_attention_relkey_sharded(
    q, k, v, dist_embedding=None, frame_mask=None, *,
    shard: Optional[AttnShard], left: int = 64, right: int = 8,
    interpret: bool = False, precision=_PREC,
):
    """flash_attention_relkey under a Mesh via shard_map.

    q/k/v [B, H, T, dh] with batch sharded over ``shard.batch_axis``
    and/or heads over ``shard.head_axis``; attention is independent per
    (batch, head), so each device runs the kernel on its local shard with
    no collectives. dist_embedding and the padding mask's time axis are
    replicated. ``shard=None`` runs the plain single-device kernel, so
    call sites need no mesh branch.
    """
    if shard is None:
        return flash_attention_relkey(
            q, k, v, dist_embedding, frame_mask,
            left=left, right=right, interpret=interpret, precision=precision,
        )

    from jax.sharding import PartitionSpec as P

    B, H, T, dh = q.shape
    has_rel = dist_embedding is not None
    if not has_rel:
        dist_embedding = jnp.zeros((1, dh), jnp.float32)  # carried, unused
    if frame_mask is None:
        frame_mask = jnp.ones((B, T), jnp.float32)
    qkv_spec = P(shard.batch_axis, shard.head_axis, None, None)
    mask_spec = P(shard.batch_axis, None)
    rel_spec = P(None, None)

    def inner(q, k, v, et, fm):
        return flash_attention_relkey(
            q, k, v, et if has_rel else None, fm,
            left=left, right=right, interpret=interpret, precision=precision,
        )

    f = _shard_map(
        inner, mesh=shard.mesh,
        in_specs=(qkv_spec,) * 3 + (rel_spec, mask_spec),
        out_specs=qkv_spec, check_vma=False,
    )
    return f(q, k, v, dist_embedding, frame_mask)
