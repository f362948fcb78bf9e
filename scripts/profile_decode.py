"""Semantic decode profiler: per-stage breakdown + e2e RTFx, batched.

Stages of the semantic_m/semantic_s decode (reference decoder.py:210-243,
strictly one utterance at a time): AR GPT sampling, Bark-fine NAR
inpainting, EnCodec waveform decode. Here all three stages batch across
utterances (decoders.decode_batch); this script times each stage at the
real model sizes (GPT 12L/768d vocab 53,376; Bark 24L/1024d; EnCodec 24k)
with random weights and prints stage seconds + end-to-end RTFx per batch
size.

Usage: python scripts/profile_decode.py [--batches 1,4,8] [--source 250]
(random weights never emit the stop token, so the AR stage runs its full
max_new budget = 3 * source tokens, the reference's token-rate ratio).
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


class StageTimes:
    def __init__(self):
        self.t = {}

    def mark(self, name, t0):
        self.t[name] = time.perf_counter() - t0
        return time.perf_counter()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1,4,8")
    ap.add_argument("--source", type=int, default=250, help="semantic tokens per row (50/s)")
    ap.add_argument("--fine-attn", default=None, choices=(None, "xla", "flash"),
                    help="Bark-fine attention impl (default: flash on TPU)")
    ap.add_argument("--ar-attn", default=None,
                    choices=(None, "xla", "kernel", "blockdiag"),
                    help="AR decode cached-slot attention (default: kernel on TPU bf16)")
    ap.add_argument("--ar-fused", action="store_true",
                    help="fused decode-step Pallas kernels (ops/decode_step_fused.py)")
    ap.add_argument("--output-dtype", default="float32", choices=("float32", "int16"),
                    help="int16 = device-side PCM quantize (the CLI detokenize path)")
    ap.add_argument("--pipeline", type=int, default=0, metavar="CHUNK",
                    help="go/no-go (VERDICT r4 #4): decode 2*CHUNK sources "
                         "serial (two chunk-sized calls) vs the two-deep "
                         "host pipeline (decode_batch pipeline_batch=CHUNK) "
                         "back-to-back and print both RTFx")
    args = ap.parse_args()

    import jax

    from audiotoken_tpu.decoders import Wav2VecBertDecoder

    print("backend:", jax.default_backend(), flush=True)
    max_new = 3 * args.source  # 2 coarse tokens per 75 Hz frame vs 50 Hz source
    t0 = time.time()
    dec = Wav2VecBertDecoder(
        weights="random", max_new_tokens=max_new,
        fine_attn_impl=args.fine_attn, ar_attn=args.ar_attn,
        ar_fused_step=True if args.ar_fused else None,
        output_dtype=args.output_dtype,
    )
    print(f"models ready {time.time()-t0:.0f}s "
          f"(fine_attn={dec.bark.attn_impl}, ar_attn={dec.gpt.decode_attn}, "
          f"out={args.output_dtype})", flush=True)

    rng = np.random.default_rng(0)

    if args.pipeline:
        C = args.pipeline
        sources = [
            rng.integers(0, 2048, size=args.source).astype(np.int32)
            for _ in range(2 * C)
        ]
        # compile both chunk shapes (AR bucket + fine windows + encodec)
        dec.decode_batch(sources[:C], seed=0)
        stride = dec._CHUNK_SEED_STRIDE
        for label in ("serial", "pipelined", "serial", "pipelined"):
            t0 = time.perf_counter()
            if label == "serial":
                wavs = dec.decode_batch(sources[:C], seed=11)
                wavs += dec.decode_batch(sources[C:], seed=11 + stride)
            else:
                wavs = dec.decode_batch(sources, seed=11, pipeline_batch=C)
            wall = time.perf_counter() - t0
            audio_s = sum(w.shape[-1] for w in wavs) / 24_000
            print(f"pipeline go/no-go [{label:9s}] 2x{C}: "
                  f"{wall:.2f}s for {audio_s:.1f} audio-s = "
                  f"{audio_s/wall:.2f}x RT", flush=True)
        return

    # instrument the three stages by timing the underlying calls
    for B in [int(b) for b in args.batches.split(",")]:
        sources = [rng.integers(0, 2048, size=args.source).astype(np.int32) for _ in range(B)]

        # warmup/compile for this batch size
        t0 = time.time()
        dec.decode_batch(sources, seed=0)
        print(f"B={B}: compile+first {time.time()-t0:.1f}s", flush=True)

        # timed run with stage breakdown (mirrors decode_batch internals)
        from audiotoken_tpu.configs import COMMONS

        vocab = dec.config.vocab
        infer = vocab.infer_token[COMMONS.ACOUSTIC]
        stop = vocab.stop_token[COMMONS.ACOUSTIC]
        prompts = [
            np.concatenate([s + vocab.offsets[COMMONS.SEMANTIC], [infer]]).astype(np.int32)
            for s in sources
        ]
        st = StageTimes()
        t = time.perf_counter()
        t_all = t
        toks = dec.gpt.generate_batch(
            prompts, max_new_tokens=max_new, temperature=dec.temperature,
            top_k=dec.top_k, stop_token=stop, seed=1,
        )
        t = st.mark("ar", t)
        rows = []
        for y in toks:
            y = y[(y != stop) & (y >= 0)] - vocab.offsets[COMMONS.ACOUSTIC]
            y = np.clip(y, 0, 2 * dec.config.per_codebook_size - 1)
            rows.append(dec._deserialize(y))
        lens = [c.shape[1] for c in rows]
        T_max = max(lens)
        coarse = np.full((B, 2, T_max), dec.bark.cfg.codebook_size, np.int64)
        for i, c in enumerate(rows):
            coarse[i, :, : lens[i]] = c
        fine = dec.bark.generate_fine_batch(coarse, seed=1)
        t = st.mark("bark_fine", t)
        import jax.numpy as jnp

        wav = np.asarray(
            dec.acoustic_decoder._forward(
                dec.acoustic_decoder.params, jnp.asarray(fine, jnp.int32)
            )
        )
        st.mark("encodec", t)
        wall = time.perf_counter() - t_all

        n_tok = int((toks >= 0).sum())
        audio_s = sum(lens) / 75.0
        print(
            f"B={B}: AR {st.t['ar']:.2f}s ({n_tok/st.t['ar']:.0f} tok/s) | "
            f"fine {st.t['bark_fine']:.2f}s | encodec {st.t['encodec']:.2f}s | "
            f"e2e {wall:.2f}s for {audio_s:.1f} audio-s = {audio_s/wall:.1f}x RT",
            flush=True,
        )


if __name__ == "__main__":
    main()
