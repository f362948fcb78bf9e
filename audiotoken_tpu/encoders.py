"""Encoder wrappers: host <-> device boundary, jit, bucketing, dtype policy.

L2 layer of the framework (SURVEY.md §1): the classes the AudioToken facade
instantiates. Reference analogs live in /root/reference/audiotoken/
encoder.py (AcousticEncoder :29-57, HubertEncoder :60-108,
Wav2VecBertEncoder :111-186). Differences: models are jitted pure functions
over param pytrees; variable-length inputs ride a static bucket grid
(runtime/bucketing.py) instead of forcing one compile per shape; outputs are
numpy int16 with the reference's exact shapes ([B, K, T] acoustic,
[B, 1, T] semantic).
"""

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .configs import (
    AcousticEncoderConfig,
    HubertEncoderConfig,
    Wav2VecBertConfig,
)
from .logger import get_logger
from .nn.rvq import RVQConfig, rvq_encode
from .nn.seanet import SeanetConfig, seanet_encode
from .runtime.bucketing import default_buckets, pad_to_bucket
from .runtime.precision import get_policy
from . import weights as weight_store

logger = get_logger(__name__)


def _require_min_samples(n: int, min_samples: int, sample_rate: int, who: str):
    """Clear error for degenerate inputs (VERDICT r2 #9): sub-minimum audio
    previously produced a negative frame count and a nonsense slice."""
    if n < min_samples:
        raise ValueError(
            f"{who}: input audio is {n} samples "
            f"({1000.0 * n / sample_rate:.1f} ms) — shorter than the "
            f"{1000.0 * min_samples / sample_rate:.1f} ms minimum "
            f"({min_samples} samples at {sample_rate} Hz) needed to produce "
            "one token"
        )


def _run_subbatched(forward, arrays, max_b: int):
    """Run ``forward(*arrays)`` in serial sub-batches of at most ``max_b``
    rows (VERDICT r2 #7 + ADVICE r2 #3: oversized device batches OOM —
    XLA-attention score buffers and SEANet front activations scale
    linearly with B). The last partial sub-batch is padded by repeating
    its first row so every sub-batch hits ONE compiled shape; pad rows
    are trimmed before concatenation. Per-sample independence of every
    encoder makes the split bit-invisible (tested)."""
    B = arrays[0].shape[0]
    if B <= max_b:
        return forward(*arrays)
    outs = []
    for i in range(0, B, max_b):
        chunks = [a[i : i + max_b] for a in arrays]
        trim = chunks[0].shape[0]
        if trim < max_b:
            chunks = [
                np.concatenate([c, np.repeat(c[:1], max_b - trim, axis=0)], axis=0)
                for c in chunks
            ]
        outs.append(forward(*chunks)[:trim])
    return jnp.concatenate(outs, axis=0)


def _expand_mask(mask, shape):
    """Device-side prefix-mask expansion: [B] int lengths -> [B, T] f32.

    A [B, T] mask passes through untouched. Expanding from lengths inside
    the jit produces the bit-identical f32 mask the host used to ship —
    15.4 MB of H2D per 8 x 30 s batch (2x the int16 audio payload) replaced
    by 32 bytes (VERDICT r3 #2)."""
    if mask.ndim == 1:
        return (
            jax.lax.broadcasted_iota(jnp.int32, shape, 1)
            < mask.astype(jnp.int32)[:, None]
        ).astype(jnp.float32)
    return mask


def _mask_to_lengths(attention_mask, audio_shape):
    """Host-side: collapse a valid-prefix [B, T] mask to [B] int32 lengths.

    None -> all-full lengths; [B] arrays pass through as lengths; a [B, T]
    mask is converted only when it IS a binary prefix mask (non-increasing
    rows of 0/1 — the only kind the pipeline produces); anything else is
    returned as-is and shipped whole (correctness over bandwidth)."""
    if attention_mask is None:
        return np.full(audio_shape[0], audio_shape[-1], np.int32)
    m = np.asarray(attention_mask)
    if m.ndim == 1:
        return m.astype(np.int32)
    m = m.astype(np.float32, copy=False)
    binary = bool(((m == 0.0) | (m == 1.0)).all())
    if binary and bool(np.all(m[:, :-1] >= m[:, 1:])):
        return np.count_nonzero(m, axis=-1).astype(np.int32)
    return m


def _dp_size(mesh) -> int:
    """Batch-split multiplier for a mesh: the 'dp' axis size only.

    Inputs are sharded over 'dp' alone (data_parallel_shardings -> P('dp')),
    so per-device batch = B / dp_size. Using mesh.size here would multiply
    the OOM ceiling by tp_size on a multi-axis mesh — ADVICE r3 (medium)."""
    if mesh is None:
        return 1
    return dict(mesh.shape).get("dp", 1)


def _placements(device, mesh):
    """(param placement, input placement) for a device or a dp mesh.

    With a Mesh, params are replicated and the batch axis is sharded over
    'dp' — the data-parallel corpus-encode layout (SURVEY.md §2.3
    "TPU-native equivalents"); XLA partitions the jitted encode.
    """
    if mesh is not None:
        from .parallel.shard import data_parallel_shardings

        return data_parallel_shardings(mesh)
    return device, device


class AcousticEncoder:
    """Waveform -> EnCodec RVQ codes [B, num_codebooks, T] int16 at 75 fps.

    Reference: encoder.py:29-57 (SEANet encoder + quantizer.encode under
    bf16 autocast; here the dtype policy is explicit).
    """

    # raw int16 PCM accepted; the exact /2^15 happens on device
    accepts_int16 = True

    def __init__(
        self,
        config: AcousticEncoderConfig = AcousticEncoderConfig(),
        weights: str = "artifacts",
        precision: str = "highest",
        seed: int = 0,
        device=None,
        buckets=None,
        use_pallas: Optional[bool] = None,
        mesh=None,
    ):
        self.config = config
        on_tpu = jax.default_backend() == "tpu"
        self.seanet_cfg = SeanetConfig(
            lstm_impl="pallas" if on_tpu else "scan",
            front_impl="pallas" if on_tpu else "xla",
        )
        self.rvq_cfg = RVQConfig()
        self.num_q = self.rvq_cfg.num_quantizers_for_bandwidth(config.bandwidth)
        self.policy = get_policy(precision)
        self.hop = self.seanet_cfg.hop_length  # 320 -> 75 fps @ 24 kHz

        param_place, self._input_place = _placements(device, mesh)
        params = weight_store.get_acoustic_params(weights, seed)
        params = {"encoder": params["encoder"], "codebooks": params["codebooks"]}
        self.params = jax.device_put(params, param_place)
        self.device = device
        self.mesh = mesh

        from .ops.rvq_pallas import rvq_encode_pallas, rvq_vmem_ok

        if use_pallas is None:
            # Default OFF: XLA's HIGHEST-precision RVQ path is bit-exact vs
            # the CPU reference and takes ~32 ms per 240 audio-s (not a
            # bottleneck), while Mosaic's f32-HIGHEST emulation inside the
            # fused kernel compiles pathologically slowly on this
            # toolchain. The kernel remains available (tested) for
            # DEFAULT-precision deployments where its fusion pays off.
            use_pallas = False
        # guard BEFORE the jit closure captures it: use_pallas=True with a
        # failing VMEM check must fall back to the XLA path (advisor r1)
        use_pallas = use_pallas and rvq_vmem_ok(
            self.num_q, self.rvq_cfg.codebook_size, self.rvq_cfg.dim
        )
        self.use_pallas = use_pallas

        policy = self.policy
        num_q = self.num_q
        seanet_cfg = self.seanet_cfg

        @jax.jit
        def _forward(params, audio):
            if audio.dtype == jnp.int16:
                # int16 PCM transferred raw (half the H2D bytes); /2^15 is
                # exact, so tokens equal the f32 path's bit-for-bit.
                audio = audio.astype(jnp.float32) * (1.0 / 32768.0)
            z = seanet_encode(
                params["encoder"], policy.cast(audio), seanet_cfg,
                precision=policy.matmul_precision,
            )
            if use_pallas:
                codes = rvq_encode_pallas(params["codebooks"], z.astype(jnp.float32), num_q)
            else:
                codes = rvq_encode(
                    params["codebooks"], z, num_q, precision=policy.matmul_precision
                )
            return codes.astype(jnp.int16)

        self._forward = _forward
        self.buckets = buckets or default_buckets(config.model_sample_rate, self.hop)
        # Auto-split bound for oversized batches: B=32 x 30 s is the
        # largest measured-safe configuration on a 16 GB chip (the fused
        # Pallas front keeps stage-1 activations un-padded, but stage-2+
        # XLA activations still scale with B — B=64 x 30 s OOMed at ~5.9 GB
        # of front activations, ARCHITECTURE.md). dispatch() runs larger
        # batches as device-resident sub-batches of this size; tokens are
        # per-sample independent, so the split is bit-invisible.
        self.max_device_batch = 32

    def dispatch(self, input_batch: np.ndarray, attention_mask=None):
        """Non-blocking encode: returns (device codes, n_frames).

        Accepts float32 (normalized) or int16 PCM input. Used by the
        pipelined executor to overlap H2D transfer with device compute.
        Batches larger than ``max_device_batch`` are encoded as serial
        sub-batches (one compile: the last partial sub-batch is padded by
        repeating a row, then trimmed).
        """
        audio = np.asarray(input_batch)
        if audio.dtype != np.int16:
            audio = audio.astype(np.float32)
        n = audio.shape[-1]
        # causal SEANet: any non-empty input yields ceil(n/hop) frames
        _require_min_samples(n, 1, self.config.model_sample_rate, "AcousticEncoder")
        padded, _ = pad_to_bucket(
            audio, self.buckets, self.config.pad_token or 0, return_mask=False
        )
        n_frames = math.ceil(n / self.hop)

        def fwd(chunk):
            return self._forward(
                self.params, jax.device_put(chunk, self._input_place)
            )

        mb = self.max_device_batch * _dp_size(self.mesh)
        return _run_subbatched(fwd, (padded,), mb), n_frames

    def __call__(self, input_batch: np.ndarray, attention_mask=None) -> np.ndarray:
        """[B, T] float32 (or int16 PCM) -> [B, num_q, ceil(T/hop)] int16.

        Right-pads to a bucket; the SEANet stack is causal, so trimming to
        the exact frame count reproduces exact-shape tokens bit-for-bit.
        """
        codes, n_frames = self.dispatch(input_batch, attention_mask)
        return np.asarray(codes)[:, :, :n_frames]


class HubertEncoder:
    """mHuBERT layer-11 features -> k-means-1000 ids [B, 1, T] int16 at 50 fps.

    Reference: encoder.py:60-108 (HubertModel hidden_states[11], affine-free
    LayerNorm(768), cdist+argmin to centroids).
    """

    # int16 PCM accepted on the corpus path: the per-utterance
    # normalization (host_transform) runs ON DEVICE for int16 input
    # (mask-weighted, scale-invariant), halving H2D bytes. f32 input keeps
    # the host-normalized bit-parity path.
    accepts_int16 = True
    int16_device_transform = True

    @staticmethod
    def host_transform(waveform: np.ndarray) -> np.ndarray:
        """Per-utterance zero-mean/unit-var normalize — the reference's
        ``hubert_processor`` (Wav2Vec2FeatureExtractor, encoder.py:20-26),
        applied on the host before batching (core.py:104-105, 188-189)."""
        waveform = np.asarray(waveform, np.float32)
        mu = waveform.mean(axis=-1, keepdims=True)
        var = waveform.var(axis=-1, keepdims=True)
        return (waveform - mu) / np.sqrt(var + 1e-7)

    def __init__(
        self,
        config: HubertEncoderConfig = HubertEncoderConfig(),
        weights: str = "artifacts",
        precision: str = "highest",
        seed: int = 0,
        device=None,
        buckets=None,
        quantize: bool = True,
        mesh=None,
        attn_impl: Optional[str] = None,
    ):
        from .nn.hubert import HubertConfig, hubert_features

        self.config = config
        self.policy = get_policy(precision)
        self.quantize = quantize
        # XLA attention by default: at the production batch (8 x 30 s,
        # masked) it measures 1058x vs flash's 964x device RTFx on v5e —
        # at T=1499 / 12 heads the [B, 12, T, T] f32 scores (863 MB at
        # B=8) still fit and XLA's fused softmax beats the Pallas kernel's
        # HIGHEST-emulated in-kernel matmuls. The scores buffer scales
        # linearly with B (~3.4 GB at B=32 x 30 s), so under this default
        # dispatch() auto-splits batches beyond ``max_device_batch`` = 8
        # per device (ADVICE r2 #3); attn_impl="flash" is O(T) in memory
        # and raises the bound to 32. Under a mesh, flash runs via
        # shard_map (ops/flash_attention.py:AttnShard).
        if attn_impl is None:
            attn_impl = "xla"
        if attn_impl not in ("xla", "flash"):
            raise ValueError(f"attn_impl must be 'xla' or 'flash', got {attn_impl!r}")
        attn_shard = None
        if attn_impl == "flash" and mesh is not None:
            from .ops.flash_attention import AttnShard

            attn_shard = AttnShard(mesh=mesh, batch_axis="dp")
        self.model_cfg = HubertConfig(attn_impl=attn_impl, attn_shard=attn_shard)
        self.mesh = mesh
        # per-device batch bound (see attention comment above); 30 s at
        # 16 kHz is the sizing contract
        self.max_device_batch = 32 if attn_impl == "flash" else 8

        param_place, self._input_place = _placements(device, mesh)
        params, centroids = weight_store.get_hubert_params(weights, seed, config)
        self.params = jax.device_put(
            {"model": params, "centroids": centroids}, param_place
        )

        policy = self.policy
        model_cfg = self.model_cfg
        output_layer = config.output_layer

        @jax.jit
        def _forward(params, audio, mask):
            from .ops.lookup import nearest_centroid

            mask = _expand_mask(mask, audio.shape)
            if audio.dtype == jnp.int16:
                # device-side host_transform: masked zero-mean/unit-var per
                # utterance. Scale by /2^15 FIRST so the 1e-7 eps acts in
                # the same value domain as the host path.
                a = audio.astype(jnp.float32) * (1.0 / 32768.0)
                n = jnp.maximum(jnp.sum(mask, axis=-1, keepdims=True), 1.0)
                mu = jnp.sum(a * mask, axis=-1, keepdims=True) / n
                var = jnp.sum(jnp.square(a - mu) * mask, axis=-1, keepdims=True) / n
                audio = (a - mu) / jnp.sqrt(var + 1e-7) * mask
            feats = hubert_features(
                params["model"], policy.cast(audio), mask, model_cfg,
                output_layer=output_layer, precision=policy.matmul_precision,
            )
            # affine-free LayerNorm (encoder.py:75-81)
            mu = jnp.mean(feats, axis=-1, keepdims=True)
            var = jnp.var(feats, axis=-1, keepdims=True)
            feats = (feats - mu) * jax.lax.rsqrt(var + 1e-5)
            ids = nearest_centroid(
                feats.astype(jnp.float32), params["centroids"],
                precision=policy.matmul_precision,
            )
            return ids.astype(jnp.int16)

        @jax.jit
        def _features(params, audio, mask):
            return hubert_features(
                params["model"], policy.cast(audio), _expand_mask(mask, audio.shape),
                model_cfg,
                output_layer=output_layer, precision=policy.matmul_precision,
            )

        self._forward = _forward
        self._features = _features
        self.buckets = buckets or default_buckets(config.model_sample_rate, 320)
        # smallest input that yields one conv-extractor frame: invert the
        # conv stack (400 samples = 25 ms for the mHuBERT kernels/strides)
        m = 1
        for k, s in zip(reversed(self.model_cfg.conv_kernel),
                        reversed(self.model_cfg.conv_stride)):
            m = (m - 1) * s + k
        self._min_samples = m

    def dispatch(self, input_batch: np.ndarray, attention_mask=None):
        """Non-blocking encode -> (device ids [B, T'], n_valid_frames).

        f32 input must be pre-normalized (host_transform); int16 PCM is
        normalized on device. ``attention_mask`` may be [B] int lengths
        (the corpus pipeline's form — 32 bytes of H2D instead of a 15 MB
        f32 mask) or a [B, T] mask (prefix masks are collapsed to lengths
        on the host; arbitrary masks ship whole)."""
        audio = np.asarray(input_batch)
        if audio.dtype != np.int16:
            audio = audio.astype(np.float32)
        _require_min_samples(
            audio.shape[-1], self._min_samples,
            self.config.model_sample_rate, "HubertEncoder",
        )
        padded, _ = pad_to_bucket(audio, self.buckets, self.config.pad_token or 0)
        mask = _mask_to_lengths(attention_mask, audio.shape)
        if mask.ndim == 2:
            mask = np.pad(mask, ((0, 0), (0, padded.shape[-1] - mask.shape[-1])))
        from .nn.hubert import feature_lengths

        n_frames = feature_lengths(audio.shape[-1], self.model_cfg)

        def fwd(a, m):
            return self._forward(
                self.params,
                jax.device_put(a, self._input_place),
                jax.device_put(m, self._input_place),
            )

        mb = self.max_device_batch * _dp_size(self.mesh)
        return _run_subbatched(fwd, (padded, mask), mb), n_frames

    def __call__(self, input_batch: np.ndarray, attention_mask=None) -> np.ndarray:
        audio = np.asarray(input_batch, dtype=np.float32)
        if not self.quantize:
            n = audio.shape[-1]
            _require_min_samples(
                n, self._min_samples, self.config.model_sample_rate, "HubertEncoder"
            )
            padded, _ = pad_to_bucket(audio, self.buckets, self.config.pad_token or 0)
            mask = _mask_to_lengths(attention_mask, audio.shape)
            if mask.ndim == 2:
                mask = np.pad(mask, ((0, 0), (0, padded.shape[-1] - mask.shape[-1])))
            from .nn.hubert import feature_lengths

            n_frames = feature_lengths(n, self.model_cfg)
            feats = self._features(self.params, jnp.asarray(padded), jnp.asarray(mask))
            return np.asarray(feats)[:, :n_frames]
        ids, n_frames = self.dispatch(audio, attention_mask)
        return np.asarray(ids)[:, None, :n_frames]  # [B, 1, T]


class Wav2VecBertEncoder:
    """Fbank -> 21-layer conformer layer-19 -> VQ-2048 ids [B, 1, T] int16.

    Reference: encoder.py:111-186 (Wav2VecBertProcessor + trimmed
    w2v-bert-2.0 + affine-free LayerNorm(1024) + VectorQuantize lookup).
    """

    # raw int16 PCM accepted: the exact /2^15 happens on device (the fbank
    # front consumes raw floats — no host preprocessing), halving H2D bytes
    accepts_int16 = True

    def __init__(
        self,
        config: Wav2VecBertConfig = Wav2VecBertConfig(),
        weights: str = "artifacts",
        precision: str = "highest",
        seed: int = 0,
        device=None,
        buckets=None,
        quantize: bool = True,
        mesh=None,
        attn_impl: Optional[str] = None,
        stage_overrides=None,
    ):
        from .nn.conformer import W2VBertConfig, w2vbert_features
        from .nn.fbank import FbankConfig, fbank_features
        from .runtime.precision import (
            W2VBERT_MIXED_OVERRIDES,
            StagePrecision,
            resolve_mixed,
        )

        self.config = config
        # precision="mixed" (round-5): the measured minimal-HIGHEST exact
        # mode — bf16x3 everywhere except the two flip-originating stage
        # groups (fbank front; in-kernel attention dots). 1.000000
        # exactness on the 12-case x 4-seed battery at 525x device RTFx
        # (runtime/precision.py:W2VBERT_MIXED_OVERRIDES has the evidence
        # trail). Explicit stage_overrides still win.
        precision, stage_overrides = resolve_mixed(
            precision, stage_overrides, W2VBERT_MIXED_OVERRIDES
        )
        self.policy = get_policy(precision)
        # mixed per-stage matmul precision (VERDICT r4 #3): e.g.
        # stage_overrides={"vq": "highest"} runs only the VQ distance dot
        # at HIGHEST while everything else follows ``precision``. See
        # runtime.precision.StagePrecision for the stage names.
        self.stage_prec = StagePrecision(
            self.policy.matmul_precision, stage_overrides
        )
        self.quantize = quantize
        # flash attention by default on TPU: 3x the XLA path at the 30 s
        # contract (T=1500, B=16: 278x vs 93x RTFx) with identical tokens
        # (measured 1.000000 agreement on v5e); XLA path on CPU
        # (interpret-mode Pallas is slow) and for parity studies. Under a
        # mesh the kernel runs through shard_map (batch over 'dp' —
        # attention is per-sample, so no collectives).
        if attn_impl is None:
            attn_impl = "flash" if jax.default_backend() == "tpu" else "xla"
        if attn_impl not in ("xla", "flash"):
            raise ValueError(f"attn_impl must be 'xla' or 'flash', got {attn_impl!r}")
        attn_shard = None
        if attn_impl == "flash" and mesh is not None:
            from .ops.flash_attention import AttnShard

            attn_shard = AttnShard(mesh=mesh, batch_axis="dp")
        self.model_cfg = W2VBertConfig(attn_impl=attn_impl, attn_shard=attn_shard)
        self.fbank_cfg = FbankConfig()
        self.mesh = mesh
        # per-device batch bound (ADVICE r2 #3): flash attention is O(T)
        # in memory (compute-bound well past B=32); the XLA path's
        # [B, 16, T, T] f32 scores are ~1.15 GB at B=8 x 30 s, so it
        # auto-splits at 8. dispatch() runs larger batches serially.
        self.max_device_batch = 32 if attn_impl == "flash" else 8

        param_place, self._input_place = _placements(device, mesh)
        params, codebook = weight_store.get_w2vbert_params(weights, seed, config)
        self.params = jax.device_put(
            {"model": params, "codebook": codebook}, param_place
        )

        policy = self.policy
        stage_prec = self.stage_prec
        model_cfg = self.model_cfg
        fbank_cfg = self.fbank_cfg
        output_layer = config.output_layer

        @partial(jax.jit, static_argnames=("pad_to_multiple_of",))
        def _forward(params, audio, mask, pad_to_multiple_of=2):
            from .ops.lookup import nearest_centroid

            mask = _expand_mask(mask, audio.shape)
            if audio.dtype == jnp.int16:
                # exact /2^15: tokens equal the f32 path's bit-for-bit
                audio = audio.astype(jnp.float32) * (1.0 / 32768.0)
            proc = fbank_features(
                audio, mask, fbank_cfg, pad_to_multiple_of=pad_to_multiple_of,
                precision=stage_prec("fbank"),
            )
            feats = w2vbert_features(
                params["model"],
                policy.cast(proc["input_features"]),
                proc["attention_mask"],
                model_cfg,
                output_layer=output_layer,
                precision=stage_prec,
            )
            mu = jnp.mean(feats, axis=-1, keepdims=True)
            var = jnp.var(feats, axis=-1, keepdims=True)
            feats = (feats - mu) * jax.lax.rsqrt(var + 1e-5)
            ids = nearest_centroid(
                feats.astype(jnp.float32), params["codebook"],
                precision=stage_prec("vq"),
            )
            return ids.astype(jnp.int16), proc["attention_mask"]

        @partial(jax.jit, static_argnames=("pad_to_multiple_of",))
        def _features(params, audio, mask, pad_to_multiple_of=2):
            proc = fbank_features(
                audio, _expand_mask(mask, audio.shape), fbank_cfg,
                pad_to_multiple_of=pad_to_multiple_of,
                precision=stage_prec("fbank"),
            )
            return w2vbert_features(
                params["model"],
                policy.cast(proc["input_features"]),
                proc["attention_mask"],
                model_cfg,
                output_layer=output_layer,
                precision=stage_prec,
            )

        self._forward = _forward
        self._features = _features
        self.buckets = buckets or default_buckets(config.model_sample_rate, 320)
        # one 50 Hz token = 2 fbank frames: frame_length + hop_length
        # samples (560 = 35 ms); below that n_frames goes non-positive
        self._min_samples = self.fbank_cfg.frame_length + self.fbank_cfg.hop_length

    def dispatch(
        self,
        input_batch: np.ndarray,
        attention_mask=None,
        pad_to_multiple_of: int = 2,
    ):
        """Non-blocking encode -> (device ids [B, T'], n_valid_frames).

        ``attention_mask`` may be [B] int lengths (corpus pipeline form) or
        a [B, T] mask — see HubertEncoder.dispatch."""
        audio = np.asarray(input_batch)
        if audio.dtype != np.int16:
            audio = audio.astype(np.float32)
        _require_min_samples(
            audio.shape[-1], self._min_samples,
            self.config.model_sample_rate, "Wav2VecBertEncoder",
        )
        n = audio.shape[-1]
        padded, _ = pad_to_bucket(audio, self.buckets, self.config.pad_token or 0)
        mask = _mask_to_lengths(attention_mask, audio.shape)
        if mask.ndim == 2:
            mask = np.pad(mask, ((0, 0), (0, padded.shape[-1] - mask.shape[-1])))
        # 50 tokens/s: one token per 2 fbank frames (hop 160 * stride 2)
        n_frames = (1 + (n - self.fbank_cfg.frame_length) // self.fbank_cfg.hop_length) // 2

        def fwd(a, m):
            ids, _am = self._forward(
                self.params,
                jax.device_put(a, self._input_place),
                jax.device_put(m, self._input_place),
                pad_to_multiple_of,
            )
            return ids

        mb = self.max_device_batch * _dp_size(self.mesh)
        return _run_subbatched(fwd, (padded, mask), mb), n_frames

    def __call__(
        self,
        input_batch: np.ndarray,
        attention_mask=None,
        pad_to_multiple_of: int = 2,
    ) -> np.ndarray:
        audio = np.asarray(input_batch, dtype=np.float32)
        if not self.quantize:
            n = audio.shape[-1]
            _require_min_samples(
                n, self._min_samples, self.config.model_sample_rate,
                "Wav2VecBertEncoder",
            )
            padded, _ = pad_to_bucket(audio, self.buckets, self.config.pad_token or 0)
            mask = _mask_to_lengths(attention_mask, audio.shape)
            if mask.ndim == 2:
                mask = np.pad(mask, ((0, 0), (0, padded.shape[-1] - mask.shape[-1])))
            n_frames = (1 + (n - self.fbank_cfg.frame_length) // self.fbank_cfg.hop_length) // 2
            feats = self._features(
                self.params, jnp.asarray(padded), jnp.asarray(mask), pad_to_multiple_of
            )
            return np.asarray(feats)[:, :n_frames]
        ids, n_frames = self.dispatch(audio, attention_mask, pad_to_multiple_of)
        return np.asarray(ids)[:, None, :n_frames]
