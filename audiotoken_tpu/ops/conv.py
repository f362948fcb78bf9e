"""1-D convolution helpers with EnCodec padding semantics.

Implements the causal/asymmetric reflect padding and transposed-conv
trimming used by the SEANet stacks (reference behavior:
encodec's SConv1d/SConvTranspose1d, exercised at
/root/reference/audiotoken/encoder.py:48 and decoder.py:71-72).

Layout is [batch, time, channels] (TPU/XLA-friendly: channels on the lane
dimension). Kernels are stored as [K, C_in, C_out] ("HIO"). Weight norm is
folded into the kernel at conversion time (convert/encodec.py), so these are
plain convolutions.
"""

import math
from typing import Tuple

import jax
import jax.numpy as jnp


def fold_weight_norm(g, v):
    """Fold weight-norm parametrization w = g * v / ||v|| (norm over all
    dims except dim 0, torch semantics) into a plain kernel.

    Args:
        g: [C_out, 1, 1] magnitude, v: [C_out, C_in, K] direction
        (torch Conv1d layout).
    Returns:
        [C_out, C_in, K] folded kernel.
    """
    import numpy as np

    v = np.asarray(v, dtype=np.float64)
    g = np.asarray(g, dtype=np.float64)
    norm = np.sqrt((v**2).sum(axis=(1, 2), keepdims=True))
    return (g * v / norm).astype(np.float32)


def pad_amounts(
    length: int, kernel_size: int, stride: int, dilation: int, causal: bool
) -> Tuple[int, int]:
    """(left, right) padding for an EnCodec conv at a static input length.

    Mirrors EncodecConv1d: padding_total = K_eff - stride, plus
    extra right-padding so the final window lands exactly at the end
    (``_get_extra_padding_for_conv1d``).
    """
    k_eff = (kernel_size - 1) * dilation + 1
    padding_total = k_eff - stride
    n_frames = (length - k_eff + padding_total) / stride + 1
    ideal_length = (math.ceil(n_frames) - 1) * stride + k_eff - padding_total
    extra = ideal_length - length
    if causal:
        return padding_total, extra
    right = padding_total // 2
    return padding_total - right, right + extra


def _reflect_concat(x: jnp.ndarray, left: int, right: int, axis: int) -> jnp.ndarray:
    """Reflect padding as flip+concat of edge slices.

    jnp.pad(mode='reflect') lowers to a compare/select fusion whose TPU
    layout pads small channel counts to 128 lanes (measured 4x HBM blow-up
    on early SEANet activations); explicit slices avoid that fusion.
    """
    parts = []
    if left > 0:
        parts.append(jnp.flip(jax.lax.slice_in_dim(x, 1, left + 1, axis=axis), axis))
    parts.append(x)
    if right > 0:
        n = x.shape[axis]
        parts.append(
            jnp.flip(jax.lax.slice_in_dim(x, n - right - 1, n - 1, axis=axis), axis)
        )
    return jnp.concatenate(parts, axis=axis) if len(parts) > 1 else x


def _pad1d_reflect(x: jnp.ndarray, left: int, right: int) -> jnp.ndarray:
    """Reflect-pad the time axis of [B, T, C]; zero-extends first when the
    signal is shorter than the padding (EncodecConv1d._pad1d)."""
    length = x.shape[1]
    max_pad = max(left, right)
    extra = 0
    if length <= max_pad:
        extra = max_pad - length + 1
        x = jnp.pad(x, ((0, 0), (0, extra), (0, 0)))
    out = _reflect_concat(x, left, right, axis=1)
    if extra:
        out = out[:, : out.shape[1] - extra, :]
    return out


def _conv1d_nch_dots(x, kernel, stride, dilation, precision):
    """[B, C, Tp] (already padded) -> [B, C_out, T_out] via per-tap
    dot_generals, keeping TIME on the lane dimension throughout.

    lax.conv_general_dilated on NCH relayouts channels onto lanes
    internally, padding C in {1..64} up to 128 — a measured 4x HBM blow-up
    and the batch-32 OOM (VERDICT r1 #2). Per-tap dots never put channels
    on lanes: each tap is ``[C_in, C_out]^T @ [B, C_in, T_out]``.

    For strided convs the tap inputs live at ``stride``-spaced offsets; a
    strided lane slice would re-read every underlying tile from HBM per
    tap, so the input is phase-split ONCE ([B, C, U, s] -> [s, B, C, U],
    one relayout pass) and every tap becomes a contiguous lane slice of
    its phase plane.
    """
    B, C, Tp = x.shape
    K = kernel.shape[0]
    k_eff = (K - 1) * dilation + 1
    T_out = (Tp - k_eff) // stride + 1
    kernel = kernel.astype(x.dtype)

    def tap(k, xk, acc):
        c = jnp.einsum(
            "io,bit->bot", kernel[k], xk, precision=precision,
            preferred_element_type=jnp.float32,
        )
        return c if acc is None else acc + c

    out = None
    if stride == 1:
        for k in range(K):
            xk = jax.lax.slice_in_dim(x, k * dilation, k * dilation + T_out, axis=2)
            out = tap(k, xk, out)
    else:
        d_max = (K - 1) // stride
        U = max(-(-Tp // stride), T_out + d_max)
        if U * stride > Tp:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, U * stride - Tp)))
        z = jnp.transpose(x.reshape(B, C, U, stride), (3, 0, 1, 2))  # [s,B,C,U]
        for k in range(K):
            p, d = k % stride, k // stride
            xk = jax.lax.slice_in_dim(z[p], d, d + T_out, axis=2)
            out = tap(k, xk, out)
    return out


def conv1d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias,
    stride: int = 1,
    dilation: int = 1,
    causal: bool = True,
    pad_mode: str = "reflect",
    precision=jax.lax.Precision.HIGHEST,
    layout: str = "NHC",
) -> jnp.ndarray:
    """EnCodec-padded conv: kernel [K, C_in, C_out].

    layout "NHC": x [B, T, C] (channels on lanes — right when C >= 128).
    layout "NCH": x [B, C, T] (time on lanes — right for the early SEANet
    layers where C in {1..64} would waste 2-128x of every tile on lane
    padding; observed 4x HBM blow-up on [B, 720k, 32] activations). The
    NCH path lowers to per-tap dots (_conv1d_nch_dots), never to XLA's
    conv op, so no lane-padded internal buffers exist at any batch size.
    """
    time_axis = 1 if layout == "NHC" else 2
    left, right = pad_amounts(
        x.shape[time_axis], kernel.shape[0], stride, dilation, causal
    )
    if layout == "NHC":
        x = (
            _pad1d_reflect(x, left, right)
            if pad_mode == "reflect"
            else jnp.pad(x, ((0, 0), (left, right), (0, 0)))
        )
        out = jax.lax.conv_general_dilated(
            x,
            kernel.astype(x.dtype),
            window_strides=(stride,),
            padding=[(0, 0)],
            rhs_dilation=(dilation,),
            dimension_numbers=("NHC", "HIO", "NHC"),
            preferred_element_type=jnp.float32,
            precision=precision,
        )
    else:
        x = _pad_last_reflect(x, left, right, pad_mode)
        out = _conv1d_nch_dots(x, kernel, stride, dilation, precision)
    if bias is not None:
        b = bias.astype(out.dtype)
        out = out + (b if layout == "NHC" else b[:, None])
    return out.astype(x.dtype)


def _pad_last_reflect(x: jnp.ndarray, left: int, right: int, pad_mode: str) -> jnp.ndarray:
    """Pad the LAST axis of [B, C, T] (same small-input guard as NHC)."""
    if pad_mode != "reflect":
        return jnp.pad(x, ((0, 0), (0, 0), (left, right)))
    length = x.shape[-1]
    max_pad = max(left, right)
    extra = 0
    if length <= max_pad:
        extra = max_pad - length + 1
        x = jnp.pad(x, ((0, 0), (0, 0), (0, extra)))
    out = _reflect_concat(x, left, right, axis=2)
    if extra:
        out = out[:, :, : out.shape[-1] - extra]
    return out


def conv_transpose1d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias,
    stride: int,
    causal: bool = True,
    trim_right_ratio: float = 1.0,
    precision=jax.lax.Precision.HIGHEST,
    layout: str = "NHC",
) -> jnp.ndarray:
    """EnCodec transposed conv with post-trim.

    x [B, T, C_in], kernel [K, C_out, C_in] (torch ConvTranspose1d weight
    [C_in, C_out, K] transposed (2, 1, 0) at conversion; verified equal to
    torch at 1e-6 with transpose_kernel=True + VALID padding). Equivalent to
    torch ConvTranspose1d followed by EncodecConvTranspose1d's unpad (trim
    padding_total from the right for causal, asymmetric otherwise).
    """
    k = kernel.shape[0]
    dn = ("NHC", "HIO", "NHC") if layout == "NHC" else ("NCH", "HIO", "NCH")
    out = jax.lax.conv_transpose(
        x,
        kernel.astype(x.dtype),
        strides=(stride,),
        padding="VALID",
        dimension_numbers=dn,
        transpose_kernel=True,
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    if bias is not None:
        b = bias.astype(out.dtype)
        out = out + (b if layout == "NHC" else b[:, None])
    padding_total = k - stride
    if causal:
        pad_right = math.ceil(padding_total * trim_right_ratio)
    else:
        pad_right = padding_total // 2
    pad_left = padding_total - pad_right
    if layout == "NHC":
        return out[:, pad_left : out.shape[1] - pad_right, :].astype(x.dtype)
    return out[:, :, pad_left : out.shape[2] - pad_right].astype(x.dtype)
