"""Decoder wrappers: tokens -> waveform.

Reference analogs in /root/reference/audiotoken/decoder.py:
AcousticDecoder (:50-76), HubertDecoder (:79-157), Wav2VecBertDecoder
(:160-243). The semantic decoders are a 3-stage pipeline: AR GPT
(semantic -> 2 interleaved coarse EnCodec codebooks), Bark-fine NAR
(codebooks 3-8), then the acoustic decoder at bandwidth 6.
"""

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .configs import (
    COMMONS,
    AcousticDecoderConfig,
    HubertDecoderConfig,
    SemanticDecoderConfig,
    Wav2VecBertDecoderConfig,
)
from .logger import get_logger
from .nn.rvq import rvq_decode
from .nn.seanet import SeanetConfig, seanet_decode
from .runtime.precision import get_policy
from . import weights as weight_store

logger = get_logger(__name__)


class AcousticDecoder:
    """RVQ codes [B, K, T] -> waveform [1, B*T*hop] float32 (or int16 PCM).

    Matches the reference's exact output contract, including flattening the
    batch into one stream (decoder.py:76).

    ``output_dtype="int16"`` applies the save_audio clamp+quantize
    (io/audio.py:198-212, reference utils.py:399-415) ON DEVICE, so the
    bytes written to WAV are identical to the float path while the
    device->host transfer halves — the decode analog of the encoders'
    int16 ingestion.

    ``max_device_batch`` (round-5): batches above this are decoded in
    serial sub-batches (same bit-invisible split as the encoders —
    per-sample independence; encoders._run_subbatched). The SEANet
    decode's [B, C, T] stage activations hold C*T ~ 23M elements per
    row at 30 s x 16 codebooks; at B >= 16 the XLA TPU compile's
    padded HLO-temp estimate blows past 16 GB HBM (measured: B=32
    "used 35.71G of 15.75G, 25% layout utilization" — the same
    memory wall as the r4 decode-scaling cliff) so the compiler
    refuses outright. 8 rows/compile is the measured-safe bound.
    """

    def __init__(
        self,
        config: AcousticDecoderConfig = AcousticDecoderConfig(),
        weights: str = "artifacts",
        precision: str = "highest",
        seed: int = 0,
        device=None,
        output_dtype: str = "float32",
        max_device_batch: Optional[int] = 8,
    ):
        self.config = config
        self.seanet_cfg = SeanetConfig()
        self.policy = get_policy(precision)
        if output_dtype not in ("float32", "int16"):
            raise ValueError(f"output_dtype must be float32|int16, got {output_dtype!r}")
        self.output_dtype = output_dtype
        self.max_device_batch = max_device_batch

        params = weight_store.get_acoustic_params(weights, seed)
        params = {"decoder": params["decoder"], "codebooks": params["codebooks"]}
        self.params = jax.device_put(params, device)

        policy = self.policy
        seanet_cfg = self.seanet_cfg
        int16_out = output_dtype == "int16"

        @jax.jit
        def _forward(params, codes):
            z = rvq_decode(params["codebooks"], codes)
            wav = seanet_decode(
                params["decoder"], policy.cast(z), seanet_cfg,
                precision=policy.matmul_precision,
            )
            wav = wav.astype(jnp.float32)
            if int16_out:
                # save_audio clamp (limit 0.99) + write_wav quantization,
                # bit-for-bit
                wav = jnp.clip(wav, -0.99, 0.99)
                wav = jnp.clip(jnp.round(wav * 32768.0), -32768, 32767)
                return wav.astype(jnp.int16)
            return wav

        self._forward = _forward

    def forward_codes(self, codes) -> jnp.ndarray:
        """Device-side decode [B, K, T] -> [B, T*hop] (float32 or int16
        per ``output_dtype``), auto-splitting batches above
        ``max_device_batch`` — the device half of ``__call__`` without
        the host materialization (bench.py times this)."""
        from .encoders import _run_subbatched

        codes = jnp.asarray(codes, jnp.int32)
        mb = self.max_device_batch or codes.shape[0]
        return _run_subbatched(
            lambda c: self._forward(self.params, c), (codes,), mb
        )

    def __call__(self, input_batch: np.ndarray) -> np.ndarray:
        codes = np.asarray(input_batch)
        if codes.ndim == 2:
            codes = codes[None]
        wav = np.asarray(self.forward_codes(codes))
        return wav.reshape(1, -1)  # flatten batch like the reference


class _SemanticDecoderBase:
    """semantic ids -> GPT AR coarse tokens -> Bark-fine NAR -> waveform.

    Reference flow (decoder.py:210-243): offset ids into the joint vocab,
    truncate to max_source_tokens, append the acoustic INFER token, sample
    up to 1024 tokens (temp 0.8, top-k 100, stop token), de-interleave the
    2 coarse codebooks, Bark generate_fine to 8 codebooks, EnCodec decode
    at bandwidth 6.
    """

    def __init__(
        self,
        config: SemanticDecoderConfig,
        language: COMMONS,
        weights: str = "artifacts",
        precision: str = "highest",
        seed: int = 0,
        device=None,
        temperature: float = 0.8,
        top_k: int = 100,
        max_new_tokens: int = 1024,
        fine_precision: str = "default",
        fine_dtype: str = "bfloat16",
        fine_attn_impl: Optional[str] = None,
        ar_precision: str = "default",
        ar_dtype: str = "bfloat16",
        ar_attn: Optional[str] = None,
        ar_fused_step: Optional[bool] = None,
        output_dtype: str = "float32",
    ):
        if language not in config.supported_languages:
            raise AssertionError(
                f"{language} not supported; only {config.supported_languages}"
            )
        self.config = config
        self.language = language
        self.policy = get_policy(precision)
        self.temperature = temperature
        self.top_k = top_k
        self.max_new_tokens = max_new_tokens
        self.seed = seed

        from .nn.gpt import GPTSampler

        artifact_key = dict(config.model_artifacts)[language]
        gpt_params, gpt_cfg = weight_store.get_semantic_gpt_params(
            weights, seed, artifact_key, config.vocab.vocab_size
        )
        # Decode parity is distributional (stochastic sampling, disjoint RNG
        # streams; SURVEY.md §7), so the AR stage defaults to bf16 params +
        # DEFAULT matmuls — measured 1.6x the HIGHEST-f32 sampler on v5e
        # (3663 vs 2246 tok/s batch 8) with no parity contract to preserve.
        # Pass ar_precision="highest", ar_dtype="float32" for f32 studies.
        dt = jnp.bfloat16 if ar_dtype == "bfloat16" else jnp.float32
        gpt_params = jax.tree_util.tree_map(
            lambda a: a.astype(dt) if hasattr(a, "astype") else a, gpt_params
        )
        self.gpt = GPTSampler(
            gpt_cfg, jax.device_put(gpt_params, device),
            precision=get_policy(ar_precision).matmul_precision,
            decode_attn=ar_attn, fused_step=ar_fused_step,
        )

        from .nn.bark_fine import BarkFineGenerator

        # Decode parity is distributional (stochastic sampling; SURVEY.md
        # §7), so the NAR fine stage defaults to DEFAULT matmul passes and
        # bf16 params — the analog of bark's own fp16 GPU inference
        # (reference decoder.py:103 loads bark under torch fp16). Measured:
        # the 6-pass fine cascade 0.83 -> ~0.5 s per batch-8 window.
        # Pass fine_dtype="float32" for f32 studies.
        bark_params, bark_cfg = weight_store.get_bark_fine_params(weights, seed)
        fdt = jnp.bfloat16 if fine_dtype == "bfloat16" else jnp.float32
        bark_params = jax.tree_util.tree_map(
            lambda a: a.astype(fdt) if hasattr(a, "astype") else a, bark_params
        )
        self.bark = BarkFineGenerator(
            bark_cfg, jax.device_put(bark_params, device),
            precision=get_policy(fine_precision).matmul_precision,
            attn_impl=fine_attn_impl,
        )

        # ``output_dtype="int16"`` applies the save_audio clamp+quantize on
        # device (identical WAV bytes, half the D2H) — the CLI detokenize
        # path; library callers keep float32 by default.
        self.acoustic_decoder = AcousticDecoder(
            config=AcousticDecoderConfig(bandwidth=6.0),
            weights=weights, precision=precision, seed=seed, device=device,
            output_dtype=output_dtype,
        )

    def _deserialize(self, tokens: np.ndarray) -> np.ndarray:
        """Interleaved coarse stream -> [2, T] codebook ids
        (decoder.py:42-47: cb2 carries a +1024 offset)."""
        n = (len(tokens) // 2) * 2
        cb1 = tokens[0:n:2]
        cb2 = tokens[1:n:2] - self.config.per_codebook_size
        return np.clip(np.stack([cb1, cb2]), 0, self.config.per_codebook_size - 1)

    def __call__(self, input_batch: np.ndarray, seed: Optional[int] = None) -> np.ndarray:
        return self.decode_batch([np.asarray(input_batch).reshape(-1)], seed=seed)[0]

    #: per-chunk seed stride for the pipelined path (any odd constant; keeps
    #: chunk RNG streams disjoint — the AR kernel folds only round count in)
    _CHUNK_SEED_STRIDE = 1_000_003

    def decode_batch(
        self,
        sources,
        seed: Optional[int] = None,
        pipeline_batch: Optional[int] = None,
    ):
        """Decode MANY semantic-token sequences concurrently -> list of
        [1, n_samples] waveforms (float32, or int16 PCM when the decoder
        was built with output_dtype="int16").

        All three stages batch across sources (the reference is strictly
        one-utterance-at-a-time, decoder.py:210-243): the AR GPT samples
        all rows in one KV-cache while_loop (per-row stop bookkeeping),
        Bark-fine inpaints all rows per window forward, and the EnCodec
        decode runs the whole [B, 8, T_max] batch at once. Per-chip decode
        throughput scales with B because each AR decode step is
        weight-bound, not batch-bound (VERDICT r1 #4/#7).

        ``pipeline_batch``: when set and len(sources) exceeds it, split
        sources into chunks of that size and run a two-deep host pipeline —
        chunk n+1's AR sampling loop (host-dispatch-bound, device gaps)
        overlaps chunk n's fine+EnCodec stages (MXU-bound) from a second
        host thread (VERDICT r4 #4). Chunk i samples with seed
        ``seed + _CHUNK_SEED_STRIDE*i``, so outputs equal per-chunk
        ``decode_batch(chunk_i, seed=...)`` calls exactly (decode parity is
        distributional anyway; SURVEY.md §7)."""
        seed = self.seed if seed is None else seed
        if pipeline_batch and len(sources) > int(pipeline_batch):
            return self._decode_pipelined(sources, seed, int(pipeline_batch))
        coarse_rows = self._ar_stage(sources, seed)
        return self._finish_stage(coarse_rows, seed)

    def _ar_stage(self, sources, seed: int):
        """sources -> per-row [2, T] coarse codebook ids (AR GPT sampling +
        host-side extraction; the data-dependent stop positions force a
        host roundtrip here, which is what makes the stage split natural)."""
        vocab = self.config.vocab
        infer = vocab.infer_token[COMMONS.ACOUSTIC]
        stop = vocab.stop_token[COMMONS.ACOUSTIC]

        prompts = []
        for src in sources:
            src = np.asarray(src).reshape(-1) + vocab.offsets[COMMONS.SEMANTIC]
            src = src[: self.config.max_source_tokens]
            prompts.append(np.concatenate([src, [infer]]).astype(np.int32))

        new_tokens = self.gpt.generate_batch(
            prompts,
            max_new_tokens=self.max_new_tokens,
            temperature=self.temperature,
            top_k=self.top_k,
            stop_token=stop,
            seed=seed,
        )

        # per row: extract between INFER and STOP, remove acoustic offset
        coarse_rows = []
        for y in np.asarray(new_tokens):
            y = y[(y != stop) & (y >= 0)]
            y = y - vocab.offsets[COMMONS.ACOUSTIC]
            if y.size < 2:
                raise RuntimeError(
                    "AR model produced no acoustic tokens before the stop token"
                )
            # clamp stray out-of-range samples (the reference would crash
            # on them in bark's embedding lookup); positions are preserved
            # so the codebook interleaving stays aligned
            y = np.clip(y, 0, 2 * self.config.per_codebook_size - 1)
            coarse_rows.append(self._deserialize(y))
        return coarse_rows

    def _finish_stage(self, coarse_rows, seed: int):
        """coarse rows -> waveforms (batched Bark-fine NAR + EnCodec)."""
        # pad rows to a shared frame count for the batched NAR stage; the
        # filler id is bark's own short-input padding, so padded frames
        # only see what a solo short decode would
        lens = [c.shape[1] for c in coarse_rows]
        T_max = max(lens)
        B = len(coarse_rows)
        filler = self.bark.cfg.codebook_size  # bark's own padding id
        coarse = np.full((B, coarse_rows[0].shape[0], T_max), filler, np.int64)
        for i, c in enumerate(coarse_rows):
            coarse[i, :, : lens[i]] = c
        fine = self.bark.generate_fine_batch(coarse, seed=seed)

        wav = np.asarray(
            self.acoustic_decoder._forward(
                self.acoustic_decoder.params, jnp.asarray(fine, jnp.int32)
            )
        )  # [B, 1, T_max*hop]
        hop = self.acoustic_decoder.seanet_cfg.hop_length
        return [wav[i].reshape(1, -1)[:, : lens[i] * hop] for i in range(B)]

    def _decode_pipelined(self, sources, seed: int, chunk: int):
        """Two-deep host pipeline over chunks: main thread runs chunk i's
        AR loop while one worker thread drives chunk i-1's fine+EnCodec
        dispatches (JAX dispatch is thread-safe; the device interleaves the
        MXU-bound fine/EnCodec kernels into the AR loop's dispatch gaps —
        or serializes them, which is what the go/no-go in
        scripts/profile_decode.py --pipeline measures)."""
        from concurrent.futures import ThreadPoolExecutor

        chunks = [sources[i: i + chunk] for i in range(0, len(sources), chunk)]
        results = [None] * len(chunks)
        with ThreadPoolExecutor(max_workers=1) as pool:
            fut, fut_idx = None, None
            for i, ch in enumerate(chunks):
                s = seed + self._CHUNK_SEED_STRIDE * i
                coarse_rows = self._ar_stage(ch, s)
                if fut is not None:
                    results[fut_idx] = fut.result()
                fut = pool.submit(self._finish_stage, coarse_rows, s)
                fut_idx = i
            results[fut_idx] = fut.result()
        return [w for rs in results for w in rs]


class HubertDecoder(_SemanticDecoderBase):
    """semantic_s decode (EN checkpoint) — reference decoder.py:79-157."""

    def __init__(self, config=HubertDecoderConfig(), language=COMMONS.EN, **kw):
        super().__init__(config, COMMONS(language), **kw)


class Wav2VecBertDecoder(_SemanticDecoderBase):
    """semantic_m decode (HI checkpoint) — reference decoder.py:160-243."""

    def __init__(self, config=Wav2VecBertDecoderConfig, language=COMMONS.HI, **kw):
        if isinstance(config, type):
            config = config()
        super().__init__(config, COMMONS(language), **kw)
