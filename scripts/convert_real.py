"""One-command real-checkpoint conversion dry run (VERDICT r2 #6).

Converts ALL reference artifacts to the canonical .npz weight store,
validates every converted tree against the committed structural
manifests (audiotoken_tpu/convert/manifests.json — mis-staged files
fail loudly at conversion time, not deep inside a forward pass), loads
the store through the production AudioToken facade, and runs a small
encode/decode smoke on each tokenizer.

    AUDIOTOKEN_ARTIFACTS=/path/to/staged python -u scripts/convert_real.py \
        --out /path/to/weights [--skip-smoke]

Staging recipe (zero-egress environments; reference configs.py:55-147):
  $AUDIOTOKEN_ARTIFACTS/
    encodec_24khz.safetensors              # facebook/encodec_24khz state dict
    mhubert_base.safetensors               # voidful/mhubert-base (or
                                           #   voidful__mhubert-base/pytorch_model.bin)
    mhubert_base_vp_en_es_fr_it3_L11_km1000.bin   # k-means (joblib/pickle)
    cmeraki__audiotoken/w2vbert2_l21/model.safetensors
    cmeraki__audiotoken/semantic_detokenizer/semantic_m/vq_quantizer/
        run4__quantizer__L19_C2048_ckpt8000.pkl
    cmeraki__audiotoken/semantic_detokenizer/semantic_s/
        hubert_semantic_acoustic_gpt_en.pt
    cmeraki__audiotoken/semantic_detokenizer/semantic_m/
        w2vbert2_semantic_acoustic_gpt_hi.pt
    bark_fine.pt                           # suno/bark fine checkpoint (or fine_2.pt)

Flat fallbacks (basename under $AUDIOTOKEN_ARTIFACTS) work for every
cmeraki file too, via configs.Artifact.resolve.
"""

import argparse
import os
import sys
import traceback

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _staged(root, *candidates):
    for c in candidates:
        p = os.path.join(root, c)
        if os.path.exists(p):
            return p
    return None


def convert_all(root: str, out: str) -> dict:
    """Convert + validate + save every artifact; returns {name: status}."""
    from audiotoken_tpu.configs import ARTIFACTS
    from audiotoken_tpu.convert.manifest import load_manifests, validate_tree
    from audiotoken_tpu.convert.store import save_params
    from audiotoken_tpu.weights import _load_torch_sd

    manifests = load_manifests()
    os.makedirs(out, exist_ok=True)
    results = {}

    def run(name, build):
        try:
            params = build()
            validate_tree(params, name, manifests)
            save_params(os.path.join(out, f"{name}.npz"), params)
            results[name] = "OK"
            print(f"[convert_real] {name}: OK")
        except Exception as e:  # noqa: BLE001
            results[name] = f"FAILED: {e}"
            print(f"[convert_real] {name}: FAILED")
            traceback.print_exc()

    # --- acoustic: EnCodec 24 kHz (reference encoder.py:38) --------------
    def build_acoustic():
        from audiotoken_tpu.convert.encodec import convert_encodec

        path = _staged(root, "encodec_24khz.safetensors", "encodec_24khz.pt",
                       "encodec_24khz.th")
        if path is None:
            raise FileNotFoundError("stage encodec_24khz.safetensors (see docstring)")
        return convert_encodec(_load_torch_sd(path))

    run("acoustic", build_acoustic)

    # --- hubert + kmeans (reference encoder.py:60-108) -------------------
    def build_hubert():
        from audiotoken_tpu.convert.hubert import convert_hubert

        path = _staged(
            root, "mhubert_base.safetensors", "mhubert_base.pt",
            os.path.join("voidful__mhubert-base", "pytorch_model.bin"),
            os.path.join("voidful__mhubert-base", "model.safetensors"),
        )
        if path is None:
            raise FileNotFoundError("stage mhubert_base.safetensors (see docstring)")
        return convert_hubert(_load_torch_sd(path))

    run("hubert", build_hubert)

    def build_kmeans():
        from audiotoken_tpu.convert.quantizers import convert_kmeans

        return {"centroids": convert_kmeans(ARTIFACTS["hubert_kmeans"].resolve())}

    run("hubert_kmeans", build_kmeans)

    # --- w2vbert + VQ (reference encoder.py:111-186) ---------------------
    def build_w2vbert():
        from audiotoken_tpu.convert.w2vbert import convert_w2vbert

        return convert_w2vbert(
            _load_torch_sd(ARTIFACTS["w2vbert_l21_weights"].resolve())
        )

    run("w2vbert", build_w2vbert)

    def build_vq():
        import torch  # type: ignore

        from audiotoken_tpu.convert.quantizers import convert_vq

        sd = torch.load(ARTIFACTS["w2vbert_vq"].resolve(), map_location="cpu")
        return {"codebook": convert_vq(sd)}

    run("w2vbert_vq", build_vq)

    # --- semantic->acoustic GPTs (reference gpt2_model.py:306-337) -------
    for key in ("gpt_semantic_s_en", "gpt_semantic_m_hi"):
        def build_gpt(key=key):
            from audiotoken_tpu.convert.gpt import convert_gpt
            from audiotoken_tpu.nn.gpt import GPTConfig

            return convert_gpt(_load_torch_sd(ARTIFACTS[key].resolve()), GPTConfig())

        run(key, build_gpt)

    # --- bark fine (reference decoder.py:103-106) ------------------------
    def build_bark():
        from audiotoken_tpu.convert.bark import convert_bark_fine

        path = _staged(root, "bark_fine.pt", "fine_2.pt", "fine.pt")
        if path is None:
            raise FileNotFoundError("stage bark_fine.pt (see docstring)")
        return convert_bark_fine(_load_torch_sd(path))

    run("bark_fine", build_bark)
    return results


def smoke(out: str, results: dict) -> dict:
    """Load the converted store through the facade; tiny encode/decode."""
    from audiotoken_tpu import AudioToken, Tokenizers

    rng = np.random.default_rng(0)
    checks = {}

    def check(name, fn):
        try:
            fn()
            checks[name] = "OK"
            print(f"[convert_real] smoke {name}: OK")
        except Exception as e:  # noqa: BLE001
            checks[name] = f"FAILED: {e}"
            print(f"[convert_real] smoke {name}: FAILED")
            traceback.print_exc()

    if results.get("acoustic") == "OK":
        def acoustic():
            tok = AudioToken(Tokenizers.acoustic, weights=out, num_codebooks=8)
            audio = (rng.standard_normal((1, 24_000)) * 0.2).astype(np.float32)
            toks = tok.encode(audio)
            assert toks.shape == (1, 8, 75) and toks.min() >= 0
            wav = tok.decode(toks)
            assert np.isfinite(np.asarray(wav)).all()

        check("acoustic_roundtrip", acoustic)

    if results.get("hubert") == "OK" and results.get("hubert_kmeans") == "OK":
        def sem_s():
            tok = AudioToken(Tokenizers.semantic_s, weights=out)
            audio = (rng.standard_normal((1, 16_000)) * 0.2).astype(np.float32)
            ids = tok.encode(audio)
            assert ids.shape[0] == 1 and ids.min() >= 0 and ids.max() < 1000

        check("semantic_s_encode", sem_s)

    if results.get("w2vbert") == "OK" and results.get("w2vbert_vq") == "OK":
        def sem_m():
            tok = AudioToken(Tokenizers.semantic_m, weights=out)
            audio = (rng.standard_normal((1, 16_000)) * 0.2).astype(np.float32)
            ids = tok.encode(audio)
            assert ids.shape[0] == 1 and ids.min() >= 0 and ids.max() < 2048

        check("semantic_m_encode", sem_m)

    needed = ("gpt_semantic_s_en", "acoustic", "bark_fine")
    if all(results.get(k) == "OK" for k in needed):
        def decode_s():
            from audiotoken_tpu.decoders import HubertDecoder

            dec = HubertDecoder(weights=out, max_new_tokens=64)
            wav = dec(rng.integers(0, 1000, size=50).astype(np.int32), seed=0)
            assert np.isfinite(np.asarray(wav)).all()

        check("semantic_s_decode", decode_s)
    return checks


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--out", required=True, help="output weights directory")
    ap.add_argument("--artifacts", default=None,
                    help="staged artifact dir (default: $AUDIOTOKEN_ARTIFACTS)")
    ap.add_argument("--skip-smoke", action="store_true")
    args = ap.parse_args()

    root = args.artifacts or os.environ.get("AUDIOTOKEN_ARTIFACTS", "")
    if not root or not os.path.isdir(root):
        raise SystemExit(
            "No staged artifacts: set $AUDIOTOKEN_ARTIFACTS (or --artifacts) "
            "to a directory laid out per the module docstring."
        )
    os.environ["AUDIOTOKEN_ARTIFACTS"] = root

    results = convert_all(root, args.out)
    checks = smoke(args.out, results) if not args.skip_smoke else {}

    failed = [k for k, v in {**results, **checks}.items() if v != "OK"]
    print(f"[convert_real] converted {sum(v == 'OK' for v in results.values())}"
          f"/{len(results)} artifacts; smoke {sum(v == 'OK' for v in checks.values())}"
          f"/{len(checks)} OK")
    if failed:
        raise SystemExit(f"[convert_real] FAILURES: {failed}")
    print("[convert_real] ALL OK")


if __name__ == "__main__":
    main()
