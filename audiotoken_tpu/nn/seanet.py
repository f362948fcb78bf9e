"""SEANet convolutional codec (EnCodec 24 kHz architecture) in JAX.

The acoustic tokenizer's conv encoder/decoder, re-designed TPU-first:
[B, T, C] layout (channels on lanes), static-shape causal padding resolved
at trace time, LSTM bottleneck as a `lax.scan` whose input projections are
hoisted into one large MXU matmul, and weight-norm folded into kernels at
conversion time.

Architecture facts (SURVEY.md §2.2): 1-D weight-norm convs, ELU, 4
down-sampling stages with ratios 8*5*4*2 => hop 320 => 75 fps @ 24 kHz,
2-layer LSTM bottleneck, latent dim 128; decoder mirrors with transposed
convs. Exercised by the reference at encoder.py:48 (model.encoder) and
decoder.py:71-72 (model.decoder).
"""

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.conv import conv1d, conv_transpose1d


@dataclass(frozen=True)
class SeanetConfig:
    channels: int = 1
    dimension: int = 128
    num_filters: int = 32
    num_residual_layers: int = 1
    ratios: Tuple[int, ...] = (8, 5, 4, 2)  # decoder order; encoder reversed
    kernel_size: int = 7
    last_kernel_size: int = 7
    residual_kernel_size: int = 3
    dilation_growth_rate: int = 2
    compress: int = 2
    lstm_layers: int = 2
    causal: bool = True
    pad_mode: str = "reflect"
    trim_right_ratio: float = 1.0
    use_conv_shortcut: bool = True
    lstm_impl: str = "scan"  # "scan" (lax.scan) or "pallas" (VMEM-state kernel)
    front_impl: str = "xla"  # "xla" or "pallas" (fused conv_in+res block)

    @property
    def hop_length(self) -> int:
        out = 1
        for r in self.ratios:
            out *= r
        return out


# ---------------------------------------------------------------------------
# LSTM bottleneck
# ---------------------------------------------------------------------------


def lstm_skip(params, x, precision):
    """Stacked LSTM with residual skip: x + LSTM_n(...LSTM_1(x)).

    ``params['layers'][k]`` holds torch-layout weights: wih [4H, in],
    whh [4H, H], bih [4H], bhh [4H]; gate order (i, f, g, o).

    The input projection for every timestep is computed as one batched
    matmul before the scan; the scan body only carries the [B, H] @ [H, 4H]
    recurrent matmul (small, but unavoidable — sequential at 75 fps latent
    rate is cheap, SURVEY.md §2.4).
    """
    h0 = x
    for layer in params["layers"]:
        wih, whh = layer["wih"], layer["whh"]
        bias = (layer["bih"] + layer["bhh"]).astype(x.dtype)
        hdim = whh.shape[1]
        # [B, T, 4H] — hoisted MXU matmul
        xi = (
            jnp.einsum("bti,gi->btg", x, wih, precision=precision,
                       preferred_element_type=jnp.float32).astype(x.dtype)
            + bias
        )
        whh_t = jnp.swapaxes(whh, 0, 1)  # [H, 4H]

        def step(carry, xt, whh_t=whh_t, hdim=hdim):
            h, c = carry
            gates = xt + jnp.dot(
                h, whh_t, precision=precision, preferred_element_type=jnp.float32
            ).astype(xt.dtype)
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            i = jax.nn.sigmoid(i)
            f = jax.nn.sigmoid(f)
            g = jnp.tanh(g)
            o = jax.nn.sigmoid(o)
            c = f * c + i * g
            h = o * jnp.tanh(c)
            return (h, c), h

        init = (
            jnp.zeros((x.shape[0], hdim), x.dtype),
            jnp.zeros((x.shape[0], hdim), x.dtype),
        )
        _, ys = jax.lax.scan(step, init, jnp.swapaxes(xi, 0, 1), unroll=8)
        x = jnp.swapaxes(ys, 0, 1)
    return h0 + x


def _lstm(params, x, cfg: "SeanetConfig", precision):
    if cfg.lstm_impl == "pallas":
        from ..ops.lstm_pallas import lstm_skip_pallas

        return lstm_skip_pallas(params, x, precision)
    return lstm_skip(params, x, precision)


# ---------------------------------------------------------------------------
# Residual block
# ---------------------------------------------------------------------------


def _resnet_block(params, x, cfg: SeanetConfig, dilation: int, precision, layout="NHC"):
    """ELU -> conv(k=residual_kernel_size, dilation) -> ELU -> conv(k=1),
    plus 1x1 conv shortcut."""
    h = jax.nn.elu(x)
    h = conv1d(
        h, params["conv1"]["kernel"], params["conv1"]["bias"],
        dilation=dilation, causal=cfg.causal, pad_mode=cfg.pad_mode,
        precision=precision, layout=layout,
    )
    h = jax.nn.elu(h)
    h = conv1d(
        h, params["conv2"]["kernel"], params["conv2"]["bias"],
        causal=cfg.causal, pad_mode=cfg.pad_mode, precision=precision,
        layout=layout,
    )
    if "shortcut" in params:
        x = conv1d(
            x, params["shortcut"]["kernel"], params["shortcut"]["bias"],
            causal=cfg.causal, pad_mode=cfg.pad_mode, precision=precision,
            layout=layout,
        )
    return x + h


# ---------------------------------------------------------------------------
# Encoder / decoder
# ---------------------------------------------------------------------------


def seanet_encode(params, x, cfg: SeanetConfig, precision=jax.lax.Precision.HIGHEST):
    """Waveform [B, T] -> latents [B, T/hop, dimension].

    The high-rate early layers (channels < 128) run channels-first
    ([B, C, T]: time on the 128-lane axis) — in [B, T, C] layout XLA pads
    C up to 128 lanes, a measured 4x HBM/bandwidth blow-up on the
    [B, 720k, 32] activations. Once channels reach 128 the activations
    switch to [B, T, C].
    """
    layout = "NCH"
    use_fused_front = (
        cfg.front_impl == "pallas"
        and cfg.num_residual_layers == 1
        and cfg.kernel_size == 7
        and cfg.residual_kernel_size == 3
        and cfg.use_conv_shortcut
    )
    if use_fused_front:
        from ..ops.seanet_pallas import seanet_front_fused

        h = seanet_front_fused(params, x)  # conv_in + stage-1 res, [B, 32, T]
    else:
        h = x[:, None, :]  # [B, 1, T]
        h = conv1d(
            h, params["conv_in"]["kernel"], params["conv_in"]["bias"],
            causal=cfg.causal, pad_mode=cfg.pad_mode, precision=precision,
            layout=layout,
        )
    for si, (stage, ratio) in enumerate(zip(params["stages"], reversed(cfg.ratios))):
        if not (use_fused_front and si == 0):
            for j, res in enumerate(stage["res"]):
                h = _resnet_block(res, h, cfg, cfg.dilation_growth_rate**j, precision, layout)
        h = jax.nn.elu(h)
        h = conv1d(
            h, stage["down"]["kernel"], stage["down"]["bias"],
            stride=ratio, causal=cfg.causal, pad_mode=cfg.pad_mode,
            precision=precision, layout=layout,
        )
        if layout == "NCH" and h.shape[1] >= 128:
            h = jnp.swapaxes(h, 1, 2)
            layout = "NHC"
    h = _lstm(params["lstm"], h, cfg, precision)
    h = jax.nn.elu(h)
    h = conv1d(
        h, params["conv_out"]["kernel"], params["conv_out"]["bias"],
        causal=cfg.causal, pad_mode=cfg.pad_mode, precision=precision,
    )
    return h


def seanet_decode(params, z, cfg: SeanetConfig, precision=jax.lax.Precision.HIGHEST):
    """Latents [B, T', dimension] -> waveform [B, T' * hop].

    Mirrors the encoder's layout strategy: channels-last while wide,
    channels-first once upsampling brings channels under 128.
    """
    h = conv1d(
        z, params["conv_in"]["kernel"], params["conv_in"]["bias"],
        causal=cfg.causal, pad_mode=cfg.pad_mode, precision=precision,
    )
    h = _lstm(params["lstm"], h, cfg, precision)
    layout = "NHC"
    for stage, ratio in zip(params["stages"], cfg.ratios):
        if layout == "NHC" and stage["up"]["kernel"].shape[1] < 128:
            h = jnp.swapaxes(h, 1, 2)
            layout = "NCH"
        h = jax.nn.elu(h)
        h = conv_transpose1d(
            h, stage["up"]["kernel"], stage["up"]["bias"],
            stride=ratio, causal=cfg.causal,
            trim_right_ratio=cfg.trim_right_ratio, precision=precision,
            layout=layout,
        )
        for j, res in enumerate(stage["res"]):
            h = _resnet_block(res, h, cfg, cfg.dilation_growth_rate**j, precision, layout)
    h = jax.nn.elu(h)
    h = conv1d(
        h, params["conv_out"]["kernel"], params["conv_out"]["bias"],
        causal=cfg.causal, pad_mode=cfg.pad_mode, precision=precision,
        layout=layout,
    )
    return h[:, :, 0] if layout == "NHC" else h[:, 0, :]  # [B, T] mono


# ---------------------------------------------------------------------------
# Random init (tests / benchmarks without checkpoints)
# ---------------------------------------------------------------------------


def _conv_init(rng, k, cin, cout):
    fan_in = k * cin
    std = float(np.sqrt(2.0 / fan_in))
    return {
        "kernel": jnp.asarray(rng.standard_normal((k, cin, cout)) * std, jnp.float32),
        "bias": jnp.zeros((cout,), jnp.float32),
    }


def _convt_init(rng, k, cin, cout):
    fan_in = k * cin
    std = float(np.sqrt(2.0 / fan_in))
    return {
        # conv_transpose kernel layout [K, C_out, C_in]
        "kernel": jnp.asarray(rng.standard_normal((k, cout, cin)) * std, jnp.float32),
        "bias": jnp.zeros((cout,), jnp.float32),
    }


def _lstm_init(rng, dim, layers):
    out = []
    std = float(1.0 / np.sqrt(dim))
    for _ in range(layers):
        out.append(
            {
                "wih": jnp.asarray(rng.uniform(-std, std, (4 * dim, dim)), jnp.float32),
                "whh": jnp.asarray(rng.uniform(-std, std, (4 * dim, dim)), jnp.float32),
                "bih": jnp.zeros((4 * dim,), jnp.float32),
                "bhh": jnp.zeros((4 * dim,), jnp.float32),
            }
        )
    return {"layers": out}


def _res_init(rng, cfg: SeanetConfig, dim):
    hidden = dim // cfg.compress
    p = {
        "conv1": _conv_init(rng, cfg.residual_kernel_size, dim, hidden),
        "conv2": _conv_init(rng, 1, hidden, dim),
    }
    if cfg.use_conv_shortcut:
        p["shortcut"] = _conv_init(rng, 1, dim, dim)
    return p


def init_encoder_params(rng, cfg: SeanetConfig):
    mult = 1
    p = {"conv_in": _conv_init(rng, cfg.kernel_size, cfg.channels, cfg.num_filters)}
    stages = []
    for ratio in reversed(cfg.ratios):
        ch = mult * cfg.num_filters
        stages.append(
            {
                "res": [_res_init(rng, cfg, ch) for _ in range(cfg.num_residual_layers)],
                "down": _conv_init(rng, ratio * 2, ch, ch * 2),
            }
        )
        mult *= 2
    p["stages"] = stages
    p["lstm"] = _lstm_init(rng, mult * cfg.num_filters, cfg.lstm_layers)
    p["conv_out"] = _conv_init(rng, cfg.last_kernel_size, mult * cfg.num_filters, cfg.dimension)
    return p


def init_decoder_params(rng, cfg: SeanetConfig):
    mult = 2 ** len(cfg.ratios)
    p = {"conv_in": _conv_init(rng, cfg.kernel_size, cfg.dimension, mult * cfg.num_filters)}
    p["lstm"] = _lstm_init(rng, mult * cfg.num_filters, cfg.lstm_layers)
    stages = []
    for ratio in cfg.ratios:
        ch = mult * cfg.num_filters
        stages.append(
            {
                "up": _convt_init(rng, ratio * 2, ch, ch // 2),
                "res": [
                    _res_init(rng, cfg, ch // 2)
                    for _ in range(cfg.num_residual_layers)
                ],
            }
        )
        mult //= 2
    p["stages"] = stages
    p["conv_out"] = _conv_init(rng, cfg.last_kernel_size, cfg.num_filters, cfg.channels)
    return p
