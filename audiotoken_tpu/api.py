"""AudioToken facade — the L3 core API.

Reference analog: /root/reference/audiotoken/core.py:27-359 (class AudioToken
with encode / encode_batch_files / decode). Same public surface and shapes:
acoustic tokens [1, K, T] int16, semantic tokens [1, 1, T] int16, decoded
audio [1, samples] float32 — returned as numpy arrays (the framework is
torch-free at inference time).

TPU-native differences:
  - models are jitted JAX functions with bucketed static shapes (no
    torch.compile flag; compilation is inherent),
  - weights come from a converted-weight store (convert/) or random init
    (``init="random"``) instead of import-time hub downloads,
  - ``encode_batch_files`` runs a pipelined host-prefetch -> device-compute ->
    async-sink executor and is idempotent across re-runs (the reference
    appends duplicate tokens on re-run, utils.py:214-217).
"""

import os
from pathlib import Path
from typing import List, Optional, Union

import numpy as np

from .configs import Tokenizers, num_codebooks_to_bandwidth
from .logger import get_logger

logger = get_logger(__name__)

ArrayLike = Union[np.ndarray, "os.PathLike[str]", Path]


class AudioToken:
    """Tokenize audio to discrete ids and decode ids back to audio.

    Args:
        tokenizer: one of :class:`Tokenizers` (acoustic / semantic_s /
            semantic_m).
        device: optional JAX device (defaults to the first accelerator).
        num_codebooks: acoustic codebook count in {2, 4, 8, 16}
            (reference core.py:69-71).
        weights: "artifacts" (resolve + convert reference checkpoints),
            "random" (random init — tests/benchmarks without network), or a
            path to a converted-weight directory.
        precision: "highest" for f32 parity-grade numerics, "bfloat16" for
            speed (the reference runs bf16 autocast on CUDA, encoder.py:45).
            semantic_m also accepts "mixed" — bf16x3 with HIGHEST on only
            the two measured flip-originating stages; battery outcomes
            identical to "highest" at ~1.4x the throughput
            (runtime/precision.py:W2VBERT_MIXED_OVERRIDES).
    """

    def __init__(
        self,
        tokenizer: Tokenizers,
        device=None,
        num_codebooks: int = 16,
        weights: str = "artifacts",
        precision: str = "highest",
        seed: int = 0,
        mesh=None,
        **kwargs,
    ):
        self.tokenizer_name = Tokenizers(tokenizer)
        self.device = device
        self.mesh = mesh
        self.num_codebooks = num_codebooks
        self.weights = weights
        self.precision = precision
        self.seed = seed
        self.kwargs = kwargs

        assert self.num_codebooks in (2, 4, 8, 16), "num_codebooks must be one of [2, 4, 8, 16]"

        self.encoder = None
        self.decoder = None
        self._load_config()

    # -- config / lazy model construction ---------------------------------

    def _load_config(self):
        from . import configs

        if self.tokenizer_name == Tokenizers.acoustic:
            self.model_config = configs.AcousticEncoderConfig(
                bandwidth=num_codebooks_to_bandwidth(self.num_codebooks)
            )
        elif self.tokenizer_name == Tokenizers.semantic_s:
            self.model_config = configs.HubertEncoderConfig()
        elif self.tokenizer_name == Tokenizers.semantic_m:
            self.model_config = configs.Wav2VecBertConfig()
        else:  # pragma: no cover
            raise ValueError(f"Tokenizer {self.tokenizer_name} not supported")
        self.model_sample_rate = self.model_config.model_sample_rate

    def load_encoder(self):
        if self.encoder is not None:
            return
        from . import encoders

        if self.tokenizer_name == Tokenizers.acoustic:
            self.encoder = encoders.AcousticEncoder(
                config=self.model_config,
                weights=self.weights,
                precision=self.precision,
                seed=self.seed,
                device=self.device,
                mesh=self.mesh,
            )
        elif self.tokenizer_name == Tokenizers.semantic_s:
            self.encoder = encoders.HubertEncoder(
                config=self.model_config,
                weights=self.weights,
                precision=self.precision,
                seed=self.seed,
                device=self.device,
                mesh=self.mesh,
            )
        elif self.tokenizer_name == Tokenizers.semantic_m:
            self.encoder = encoders.Wav2VecBertEncoder(
                config=self.model_config,
                weights=self.weights,
                precision=self.precision,
                seed=self.seed,
                device=self.device,
                mesh=self.mesh,
            )
        logger.info("Initialized %s encoder", self.tokenizer_name)

    def load_decoder(self, **kwargs):
        if self.decoder is not None:
            return
        from . import configs, decoders

        if self.tokenizer_name == Tokenizers.acoustic:
            cfg = configs.AcousticDecoderConfig(
                bandwidth=num_codebooks_to_bandwidth(self.num_codebooks)
            )
            self.decoder = decoders.AcousticDecoder(
                config=cfg,
                weights=self.weights,
                precision=self.precision,
                seed=self.seed,
                device=self.device,
                **kwargs,
            )
        elif self.tokenizer_name == Tokenizers.semantic_s:
            self.decoder = decoders.HubertDecoder(
                weights=self.weights,
                precision=self.precision,
                seed=self.seed,
                device=self.device,
                **kwargs,
            )
        elif self.tokenizer_name == Tokenizers.semantic_m:
            self.decoder = decoders.Wav2VecBertDecoder(
                weights=self.weights,
                precision=self.precision,
                seed=self.seed,
                device=self.device,
                **kwargs,
            )
        logger.info("Initialized %s decoder", self.tokenizer_name)

    # -- encode -------------------------------------------------------------

    def encode(
        self,
        audio: ArrayLike,
        chunk_size: Optional[float] = None,
        overlap: float = 0.0,
    ) -> np.ndarray:
        """Encode one audio (array [1, T] at model rate, or a path) to tokens
        [1, K, T] int16 (reference core.py:120-185).

        ``overlap`` (seconds, used with ``chunk_size``) prepends that much
        left context to every chunk and discards its tokens — the
        overlap-discard scheme that removes the chunk-boundary artifacts
        the reference accepts (SURVEY.md §5: stride == segment length, no
        overlap). Rounded to a whole number of token hops so counts align.
        """
        self.load_encoder()

        if isinstance(audio, np.ndarray):
            assert audio.ndim == 2 and audio.shape[0] == 1, "Audio must be [1, T] mono"
            return self._encode_single(audio)

        if isinstance(audio, (os.PathLike, Path, str)):
            from .io.audio import process_audio_chunks, read_audio

            if chunk_size is None:
                wav = read_audio(audio, self.model_sample_rate)
                return self._encode_single(wav)

            sr = self.model_sample_rate
            hop = sr // self.model_config.model_token_rate
            carry_len = int(round(overlap * sr / hop)) * hop if overlap > 0 else 0
            carry = np.zeros((1, 0), np.float32)
            out = []
            for chunk, _name in process_audio_chunks(
                str(audio), None, sr, chunk_size
            ):
                ext = np.concatenate([carry, chunk], axis=-1)
                toks = self._encode_single(ext)
                n_skip = carry.shape[-1] // hop
                out.append(toks[:, :, n_skip:])
                if carry_len:
                    carry = ext[:, -carry_len:]
            return np.concatenate(out, axis=-1)

        if isinstance(audio, (bytes, bytearray)):
            # in-memory compressed audio (the reference raises
            # NotImplementedError here, core.py:181-182); decoded via the
            # native libav bytes path
            from .io.audio import convert_audio
            from .io import _native

            if not _native.native_available():
                raise NotImplementedError(
                    "Encoding bytes requires the native libav decoder"
                )
            with _native.NativeDecoder(bytes(audio)) as dec:
                sr = dec.sample_rate
                parts = list(dec.chunks(1 << 20))
            wav = np.concatenate(parts)[None, :] if parts else np.zeros((1, 0), np.float32)
            wav = convert_audio(wav, sr, self.model_sample_rate)
            return self._encode_single(wav)
        raise ValueError(f"Unsupported input type {type(audio)}")

    def _encode_single(self, audio: np.ndarray) -> np.ndarray:
        transform = getattr(self.encoder, "host_transform", None)
        if transform is not None:
            audio = transform(audio)
        # all-valid input: lengths form (the encoders expand on device)
        mask = np.full(audio.shape[0], audio.shape[-1], np.int32)
        return np.asarray(self.encoder(audio, mask))

    def encode_batch_files(
        self,
        batch_size: int,
        outdir: Union[str, os.PathLike],
        chunk_size: float = 30,
        num_workers: int = 4,
        audio_files: Optional[List[Union[str, os.PathLike]]] = None,
        audio_dir: Optional[Union[str, os.PathLike]] = None,
        **kwargs,
    ) -> None:
        """Corpus tokenization: stream files -> fixed-shape batches -> device
        encode -> idempotent token sink (reference core.py:198-289)."""
        self.load_encoder()
        from .runtime.executor import encode_batch_files as _run

        return _run(
            encoder=self.encoder,
            model_config=self.model_config,
            batch_size=batch_size,
            outdir=outdir,
            chunk_size=chunk_size,
            num_workers=num_workers,
            audio_files=audio_files,
            audio_dir=audio_dir,
            **kwargs,
        )

    # -- decode -------------------------------------------------------------

    def decode(self, tokens: ArrayLike, **kwargs) -> np.ndarray:
        """Decode tokens [1, K, T] (acoustic) or [T]/[1, T] (semantic) back
        to a waveform [1, samples] float32 (reference core.py:317-353)."""
        self.load_decoder(**kwargs)

        if isinstance(tokens, (os.PathLike, Path, str)):
            tokens = np.load(tokens)
        tokens = np.asarray(tokens)
        return np.asarray(self.decoder(tokens.astype(np.int32)))

    def decode_batch(self, token_seqs, **kwargs):
        """Decode MANY token sequences -> list of [1, samples] waveforms.

        For semantic tokenizers all three decode stages batch across
        sequences (decoders.decode_batch — measured 14.3x real-time at
        batch 8 on v5e vs 3.6x one-at-a-time); the reference has no
        batched decode (decoder.py:210-243). Acoustic sequences decode as
        one batched SEANet pass when shapes agree, else per-sequence."""
        self.load_decoder(**kwargs)
        seqs = [
            np.load(t) if isinstance(t, (os.PathLike, Path, str)) else np.asarray(t)
            for t in token_seqs
        ]
        if hasattr(self.decoder, "decode_batch"):
            return self.decoder.decode_batch(
                [np.asarray(s).reshape(-1).astype(np.int32) for s in seqs]
            )
        import jax.numpy as jnp

        outs = []
        i = 0
        while i < len(seqs):
            # group same-shape acoustic token blocks into one device batch
            grp = [seqs[i]]
            while i + len(grp) < len(seqs) and seqs[i + len(grp)].shape == grp[0].shape:
                grp.append(seqs[i + len(grp)])
            batch = np.stack([g.reshape(g.shape[-2], g.shape[-1]) for g in grp])
            wav = np.asarray(
                self.decoder._forward(
                    self.decoder.params, jnp.asarray(batch.astype(np.int32))
                )
            )
            outs.extend(wav[j].reshape(1, -1) for j in range(len(grp)))
            i += len(grp)
        return outs
