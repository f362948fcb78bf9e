"""Benchmark: RTFx (audio-seconds per wall-second per chip) across the
BASELINE.md config list.

Covers BASELINE.md "configs to track" (VERDICT r1 #3):
  1. acoustic encode (EnCodec SEANet + 16-codebook RVQ) — the primary
     driver-tracked metric, reference core.py:271-276;
  2. acoustic decode round-trip (RVQ tokens -> waveform, decoder.py:50-76);
  3. semantic_m encode (fbank -> conformer -> VQ-2048, encoder.py:111-186);
  4. semantic_m decode e2e (AR GPT -> Bark-fine -> EnCodec decode,
     decoder.py:160-243);
  5. corpus encode_batch_files when $AUDIOTOKEN_CORPUS points at a wav dir.

Prints ONE JSON line. The primary "metric"/"value"/"vs_baseline" triple
stays the acoustic encode RTFx (continuity with BENCH_r01); the other
paths ride in the same object under "paths". Weights are random (RTFx is
weight-independent); token parity is covered by the test suite and
scripts/verify_tpu_parity.py. All paths run at parity-grade HIGHEST
precision except the Bark-fine NAR stage (distributional contract,
decoders.py rationale).
"""

import json
import os
import time
import traceback

import numpy as np


def _enable_compile_cache():
    import jax

    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
    except Exception:  # noqa: BLE001
        pass


# Set by _pipelined_rtfx / bench_corpus after each run: [min, max] RTFx
# across passes. main() pops it into the artifact's "spreads" map so
# ambient-tunnel noise (documented 2-3x swing) is visible rather than a
# silently-wrong single number (VERDICT r3 #8: r03 recorded semantic_s
# 'high' pipelined 424 vs 'highest' 783 — a physically impossible ordering
# that was pure noise).
_LAST_SPREAD = None


def _pcm16(rng, shape, scale=6000.0):
    """Random int16 PCM (incompressible through the relay). Clipped before
    the cast: float->int16 of out-of-range values is undefined/wrapping in
    NumPy, and |x| > 32767 needs only ~5.5 sigma at this scale (ADVICE r3)."""
    return np.clip(rng.standard_normal(shape) * scale, -32768, 32767).astype(np.int16)


def _pipelined_rtfx(dispatch, variants, audio_seconds_per_iter, iters=16, passes=5):
    """Best-of-N pipelined throughput: dispatch on the main thread, fetch on
    a worker (H2D, compute, D2H overlap — runtime/executor.py pattern).
    Best-of-N de-noises the shared host<->device tunnel's ambient load.

    ``variants`` is a LIST of distinct input tuples cycled per iteration:
    the relay dedupes repeated identical transfers/executions (observed
    0 ms "timings" on repeat calls — the artifact behind round 1's inflated
    semantic numbers), so every iteration must carry fresh bytes.

    passes=5: the shared tunnel's ambient bandwidth swings 2-3x between
    runs (measured 296 vs 969 RTFx for the same path minutes apart);
    best-of-5 tightens the estimate toward the uncontended value and the
    per-pass spread is surfaced via _LAST_SPREAD (VERDICT r3 #8)."""
    import queue
    import threading

    def run_pass() -> float:
        fetch_q: "queue.Queue" = queue.Queue(maxsize=6)

        def fetcher():
            while True:
                item = fetch_q.get()
                if item is None:
                    return
                np.asarray(item)

        ft = threading.Thread(target=fetcher)
        ft.start()
        t0 = time.perf_counter()
        for i in range(iters):
            fetch_q.put(dispatch(*variants[i % len(variants)]))
        fetch_q.put(None)
        ft.join()
        return time.perf_counter() - t0

    global _LAST_SPREAD
    rtfx = sorted(
        iters * audio_seconds_per_iter / run_pass() for _ in range(passes)
    )
    _LAST_SPREAD = [round(rtfx[0], 2), round(rtfx[-1], 2)]
    return rtfx[-1]


def timed_best(fn, variants, iters=4):
    """Best device wall time (seconds) of ``fn(*variants[i])``.

    The ONE device-timing helper (scripts/profile_*.py and
    scripts/precision_ladder.py import it): jitted scalar reduction
    fetched to the host as the completion sync — on the axon backend
    ``block_until_ready`` alone can return before the computation drains
    (measured "0 ms" repeats) — over distinct cycled inputs (the relay
    dedupes repeated identical calls), discarding sub-2 ms samples (a
    deduped re-execution reads as ~0 ms and min() would report it)."""
    import jax
    import jax.numpy as jnp

    g = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
    float(g(*variants[0]))  # compile
    samples = []
    for i in range(iters):
        args = variants[(i + 1) % len(variants)]
        t0 = time.perf_counter()
        float(g(*args))  # scalar fetch = true completion sync
        samples.append(time.perf_counter() - t0)
    honest = [s for s in samples if s >= 2e-3]
    return min(honest) if honest else max(samples)


def _device_rtfx(fn, variants, audio_seconds, iters=4):
    """Device-compute-only RTFx: what the chip does once inputs are
    resident — the per-chip capability number; the pipelined number is
    capped by this host's ~45 MB/s relay. See timed_best."""
    return audio_seconds / timed_best(fn, variants, iters=iters)


def bench_acoustic_encode():
    """Returns (pipelined batch-8 RTFx, device-only batch-32 RTFx)."""
    import jax

    from audiotoken_tpu.configs import AcousticEncoderConfig
    from audiotoken_tpu.encoders import AcousticEncoder

    seconds, sr = 30, 24_000
    enc = AcousticEncoder(
        config=AcousticEncoderConfig(bandwidth=12.0),  # 16 codebooks
        weights="random",
        precision="highest",
    )
    rng = np.random.default_rng(0)
    # int16 PCM input (native wav sample format): exact /2^15 scaling on
    # device, half the host->device bytes
    mask = np.ones((8, seconds * sr), np.float32)
    variants = [(_pcm16(rng, (8, seconds * sr)), mask) for _ in range(4)]
    enc(*variants[0])  # warmup/compile

    def dispatch(a, m):
        codes, _ = enc.dispatch(a, m)
        return codes

    pipelined = _pipelined_rtfx(dispatch, variants, 8 * seconds)

    # batch 32 unlocked in r2 (NCH per-tap dots + batch-tiled LSTM kernel);
    # tokens at B=32 equal B=8 exactly (measured on v5e)
    a32 = _pcm16(rng, (32, seconds * sr))
    enc(a32, np.ones(a32.shape, np.float32))  # compile
    devs = [(jax.device_put(_pcm16(rng, (32, seconds * sr))),) for _ in range(2)]
    jax.block_until_ready(devs)
    device_only = _device_rtfx(
        lambda d: enc._forward(enc.params, d), devs, 32 * seconds
    )
    return pipelined, device_only


def bench_acoustic_decode():
    """int16 device-side PCM output (the CLI detokenize path): identical
    WAV bytes to the float path, half the D2H bytes.

    Returns (pipelined B=8 RTFx, {device-only B=8, device-only B=32}).
    The device-only variants exist because BENCH_r04's pipelined number
    dropped 557 -> 213 with nothing in the artifact to say whether the
    decoder regressed or the shared relay was loaded (VERDICT r4 #2) —
    device-only numbers are the tuning/regression signal (CLAUDE.md)."""
    import jax

    from audiotoken_tpu.configs import AcousticDecoderConfig
    from audiotoken_tpu.decoders import AcousticDecoder

    batch, seconds = 8, 30
    frames = seconds * 75
    dec = AcousticDecoder(
        config=AcousticDecoderConfig(bandwidth=12.0), weights="random",
        precision="highest", output_dtype="int16",
    )
    rng = np.random.default_rng(0)
    variants = [
        (rng.integers(0, 1024, size=(batch, 16, frames)).astype(np.int16),)
        for _ in range(4)
    ]
    dec(variants[0][0])  # warmup/compile

    def dispatch(c):
        return dec._forward(dec.params, np.asarray(c, np.int32))

    pipelined = _pipelined_rtfx(dispatch, variants, batch * seconds, iters=8)

    # B=32 runs through the production auto-split (4 x 8-row sub-batches,
    # decoders.AcousticDecoder.max_device_batch): a single 32-row compile
    # exceeds HBM (35.71G padded HLO temp vs 15.75G, measured round 5)
    device = {}
    for b, key in ((8, "acoustic_decode_device_b8_rtfx"),
                   (32, "acoustic_decode_device_b32_rtfx")):
        devs = [
            (jax.device_put(
                rng.integers(0, 1024, size=(b, 16, frames)).astype(np.int32)),)
            for _ in range(2)
        ]
        jax.block_until_ready(devs)
        jax.block_until_ready(dec.forward_codes(devs[0][0]))  # compile
        device[key] = _device_rtfx(
            lambda c: dec.forward_codes(c), devs, b * seconds
        )
    return pipelined, device


def device_rtfx(enc, batch, seconds, sr, iters=4):
    """Device-compute-only RTFx through the production ``_forward`` — the
    per-chip capability number (the pipelined number is capped by this
    host's shared relay, whose ambient load swings 2-3x between runs).

    The ONE copy of this helper (scripts/precision_ladder.py imports it;
    the two used to drift). Params ride in the variants (jit ARGUMENTS): a
    closure over them would inline hundreds of MB of constants into the
    compile request. AcousticEncoder's _forward takes no mask argument."""
    import jax

    rng = np.random.default_rng(1)
    variants = [
        (enc.params, jax.device_put(_pcm16(rng, (batch, seconds * sr))))
        for _ in range(2)
    ]
    jax.block_until_ready([v[1] for v in variants])
    mask = jax.device_put(np.ones((batch, seconds * sr), np.float32))

    from audiotoken_tpu.encoders import AcousticEncoder

    takes_mask = not isinstance(enc, AcousticEncoder)

    def fwd(params, a):
        out = enc._forward(params, a, mask) if takes_mask else enc._forward(params, a)
        return out[0] if isinstance(out, tuple) else out

    return batch * seconds / timed_best(fwd, variants, iters=iters)


def bench_semantic_m_encode(precision="highest"):
    """Returns (pipelined RTFx, device-only RTFx)."""
    from audiotoken_tpu.configs import Wav2VecBertConfig
    from audiotoken_tpu.encoders import Wav2VecBertEncoder

    # 30 s = the corpus chunk contract (reference core.py:201)
    batch, seconds, sr = 8, 30, 16_000
    enc = Wav2VecBertEncoder(weights="random", precision=precision)
    rng = np.random.default_rng(0)
    # int16 PCM: exact /2^15 on device, half the H2D bytes
    variants = [(_pcm16(rng, (batch, seconds * sr)),) for _ in range(4)]
    enc(*variants[0])  # warmup/compile

    def dispatch(a):
        ids, _ = enc.dispatch(a)
        return ids

    pipelined = _pipelined_rtfx(dispatch, variants, batch * seconds, iters=8)
    return pipelined, device_rtfx(enc, batch, seconds, sr)


def bench_semantic_s_encode(precision="highest"):
    """Returns (pipelined RTFx, device-only RTFx)."""
    from audiotoken_tpu.encoders import HubertEncoder

    batch, seconds, sr = 8, 30, 16_000
    enc = HubertEncoder(weights="random", precision=precision)
    rng = np.random.default_rng(0)
    # int16 PCM: host_transform runs on device for int16 (half H2D bytes)
    variants = [(_pcm16(rng, (batch, seconds * sr)),) for _ in range(4)]
    enc(*variants[0])  # warmup/compile

    def dispatch(a):
        ids, _ = enc.dispatch(a)
        return ids

    pipelined = _pipelined_rtfx(dispatch, variants, batch * seconds, iters=8)
    return pipelined, device_rtfx(enc, batch, seconds, sr)


def bench_semantic_decode():
    """semantic_m decode e2e, BATCHED: AR GPT -> Bark-fine -> EnCodec
    decode over 32 utterances at once (decoders.decode_batch — the
    reference is one-at-a-time, decoder.py:210-243). B=32 is the
    throughput-optimal batch measured on v5e (32.2x RT vs 29.9x at
    B=16, 26.6x at B=8 — the AR step is cache-read-bound so tok/s
    keeps climbing with batch: 6096/7832/8595).

    Random weights never emit the stop token, so the AR stage runs a fixed
    600-token budget -> 600/2/75 = 4 s of audio per row (the RTFx
    denominator is deterministic). output_dtype="int16" is the production
    CLI detokenize configuration (device-side PCM quantize, half D2H)."""
    from audiotoken_tpu.decoders import Wav2VecBertDecoder

    dec = Wav2VecBertDecoder(
        weights="random", max_new_tokens=600, output_dtype="int16"
    )
    rng = np.random.default_rng(0)
    B = 32
    sources = [
        rng.integers(0, 2048, size=250).astype(np.int32) for _ in range(B)
    ]  # 5 s each @ 50 tok/s
    dec.decode_batch(sources, seed=0)  # warmup/compile

    # best-of-3 with the per-pass spread surfaced like every other
    # pipelined metric (VERDICT r4 weak #5: this was the one metric
    # without a spread entry); distinct seeds keep the relay from
    # deduping repeated identical sampling runs
    global _LAST_SPREAD
    vals = []
    for s in (1, 2, 3):
        t0 = time.perf_counter()
        wavs = dec.decode_batch(sources, seed=s)
        total_audio = sum(w.shape[-1] for w in wavs) / 24_000
        vals.append(total_audio / (time.perf_counter() - t0))
    vals.sort()
    _LAST_SPREAD = [round(vals[0], 2), round(vals[-1], 2)]
    return vals[-1]


def bench_corpus(tokenizer="acoustic"):
    """encode_batch_files end-to-end (file decode -> segment -> encode ->
    sink). Uses $AUDIOTOKEN_CORPUS if set; otherwise synthesizes 32 x 60 s
    PCM16 wavs (random = incompressible through the relay, per the
    measurement-integrity rule).

    tokenizer="semantic_s" synthesizes int16 wavs AT the model rate
    (16 kHz, no resample) so the corpus rides the int16 H2D passthrough
    with the device-side normalization (VERDICT r2 #4: worker sub-streams
    used to silently drop the passthrough and pay 2x transfer bytes)."""
    import shutil
    import tempfile

    from audiotoken_tpu import AudioToken, Tokenizers

    corpus = os.environ.get("AUDIOTOKEN_CORPUS")
    tmp_corpus = None
    if not corpus or not os.path.isdir(corpus):
        from audiotoken_tpu.io.wavfile import write_wav

        rng = np.random.default_rng(0)
        tmp_corpus = tempfile.mkdtemp(prefix="bench_corpus_")
        sr = 24_000 if tokenizer == "acoustic" else 16_000
        for i in range(32):
            wav = _pcm16(rng, (1, 60 * sr))
            write_wav(os.path.join(tmp_corpus, f"c{i:03d}.wav"), wav, sr)
        corpus = tmp_corpus

    if tokenizer == "acoustic":
        tok = AudioToken(Tokenizers.acoustic, weights="random", num_codebooks=16)
    else:
        tok = AudioToken(Tokenizers[tokenizer], weights="random")
    global _LAST_SPREAD
    try:
        # best-of-2 full passes with the spread surfaced: corpus RTFx rides
        # the shared relay and swings with ambient load like every
        # pipelined metric (VERDICT r3 #8)
        vals = []
        for _ in range(2):
            out = tempfile.mkdtemp(prefix="bench_tokens_")
            try:
                summary = tok.encode_batch_files(
                    batch_size=8, outdir=out, chunk_size=30.0, num_workers=4,
                    audio_dir=corpus,
                )
            finally:
                shutil.rmtree(out, ignore_errors=True)
            v = summary.get("rtfx")
            if v is None:
                return None
            vals.append(v)
        _LAST_SPREAD = [round(min(vals), 2), round(max(vals), 2)]
        return max(vals)
    finally:
        if tmp_corpus:
            shutil.rmtree(tmp_corpus, ignore_errors=True)


def _err_line(e: BaseException) -> str:
    """One informative line for the JSON artifact. format_exc's last line
    is often JAX's 'removed its internal frames' notice — useless."""
    msg = f"{type(e).__name__}: {e}".replace("\n", " ")
    return msg[:500]


def _preflight():
    """Execute a tiny jitted computation on the default backend; returns
    None on success, else the one-line error. This is what distinguishes
    a dead TPU terminal from broken bench code (VERDICT r2 #2: one wedged
    claim nulled the whole round with FAILED_PRECONDITION on every
    metric and no way to tell which from the artifact)."""
    try:
        import jax
        import jax.numpy as jnp

        v = float(jax.jit(lambda a: jnp.sum(a * 2.0))(jnp.arange(8.0)))
        if v != 56.0:
            return f"preflight computed {v} != 56.0"
        return None
    except Exception as e:  # noqa: BLE001
        return _err_line(e)


def _rotate_compile_cache():
    """Disable the persistent compile cache for this process: a stale AOT
    entry compiled against an older libtpu can poison execution (the
    BENCH_r02 tail showed a failed cache-entry read next to the
    FAILED_PRECONDITION storm). Fresh compiles are slow but correct."""
    import jax

    try:
        from jax._src import compilation_cache

        compilation_cache.reset_cache()
    except Exception:  # noqa: BLE001
        pass
    for value in (None, ""):
        try:
            jax.config.update("jax_compilation_cache_dir", value)
            break
        except Exception:  # noqa: BLE001
            continue


def main():
    global _LAST_SPREAD
    _enable_compile_cache()

    paths = {}
    errors = {}
    spreads = {}
    tpu_status = "ok"

    # --- preflight: never let a wedged backend zero the round silently ---
    err = _preflight()
    if err is not None:
        _rotate_compile_cache()
        err2 = _preflight()
        if err2 is None:
            tpu_status = "ok_after_cache_rotation"
        else:
            print(json.dumps({
                "metric": "acoustic_encode_rtfx_per_chip",
                "value": None,
                "unit": "audio_seconds/wall_second/chip",
                "vs_baseline": None,
                "paths": {},
                "tpu_status": "tpu_unavailable",
                "errors": {"preflight": err, "preflight_after_cache_rotation": err2},
            }))
            return

    backend_dead = False
    metrics = [
        # (pipelined key, device-only key or None, thunk)
        ("acoustic_encode_rtfx", "acoustic_encode_device_b32_rtfx",
         bench_acoustic_encode),
        ("acoustic_decode_rtfx", None, bench_acoustic_decode),
        ("semantic_m_encode_rtfx", "semantic_m_encode_device_rtfx",
         bench_semantic_m_encode),
        # 'mixed' (round-5) = bf16x3 with only the two flip-originating
        # stage groups at HIGHEST — semantic_m's EXACT >=500x mode
        # (1.000000 on the 4-seed battery, tests/goldens/BISECT_r5.log)
        ("semantic_m_encode_mixed_rtfx", "semantic_m_encode_mixed_device_rtfx",
         lambda: bench_semantic_m_encode("mixed")),
        # 'high' = bf16x3 on every matmul: exact for semantic_s over the
        # full matrix; APPROXIMATE for semantic_m (~1 flip/400, demoted
        # round 4 — scripts/precision_ladder.py / verify_tpu_parity.py)
        ("semantic_m_encode_high_rtfx", "semantic_m_encode_high_device_rtfx",
         lambda: bench_semantic_m_encode("high")),
        ("semantic_s_encode_rtfx", "semantic_s_encode_device_rtfx",
         bench_semantic_s_encode),
        ("semantic_s_encode_high_rtfx", "semantic_s_encode_high_device_rtfx",
         lambda: bench_semantic_s_encode("high")),
        ("semantic_decode_rtfx", None, bench_semantic_decode),
        ("corpus_encode_rtfx", None, bench_corpus),
        # int16 H2D passthrough through the worker sub-streams
        # (VERDICT r2 #4) measured at the full pipeline level
        ("corpus_semantic_s_encode_rtfx", None,
         lambda: bench_corpus("semantic_s")),
    ]
    for name, device_key, fn in metrics:
        if backend_dead:
            errors[name] = "skipped: backend lost mid-run (see tpu_status)"
            continue
        attempt_errors = []
        v = None
        for attempt in range(2):  # each failed metric gets ONE retry
            try:
                _LAST_SPREAD = None
                v = fn()
                if _LAST_SPREAD is not None:
                    spreads[name] = _LAST_SPREAD
                break
            except Exception as e:  # noqa: BLE001
                attempt_errors.append(_err_line(e))
                # Re-verify the backend before retrying: if the backend
                # itself died, rotate the cache and re-check; if still
                # dead, stop burning time on metrics that cannot pass.
                if _preflight() is not None:
                    _rotate_compile_cache()
                    if _preflight() is not None:
                        backend_dead = True
                        tpu_status = "tpu_lost_mid_run"
                        break
                    tpu_status = "ok_after_cache_rotation"
        if attempt_errors:
            errors[name] = attempt_errors[-1] if len(attempt_errors) == 1 else attempt_errors
        if v is None:
            continue
        if isinstance(v, tuple):  # (pipelined, device-only | {key: device-only})
            v, device_only = v
            if isinstance(device_only, dict):
                for k, dv in device_only.items():
                    paths[k] = round(dv, 2)
            elif device_key:
                paths[device_key] = round(device_only, 2)
        paths[name] = round(v, 2)

    primary = paths.get("acoustic_encode_rtfx")
    out = {
        "metric": "acoustic_encode_rtfx_per_chip",
        "value": primary,
        "unit": "audio_seconds/wall_second/chip",
        "vs_baseline": None if primary is None else round(primary / 500.0, 3),
        "paths": paths,
        "spreads": spreads,
        "tpu_status": tpu_status,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))


if __name__ == "__main__":
    main()
