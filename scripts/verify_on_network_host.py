"""First-deployment verification for the two environment-blocked parity flags.

The build container has zero network egress, so two behaviors could never be
verified against the real upstream artifacts (COMPONENTS.md "Known gaps"):

  A. S3 tokenizer upstream-checkpoint fidelity — the converter + JAX model
     are parity-tested against a builder-authored torch replica only; the
     real `s3tokenizer` pip checkpoint layout was unverifiable.
  B. Perth watermark compatibility — `utils/watermark.py` falls back to a
     spread-spectrum mark that is NOT Perth-format-compatible when the
     `resemble-perth` package is absent.

Run THIS script once on any host with network access (a dev box or the
deployment image) to close both:

    pip install s3tokenizer resemble-perth
    python scripts/verify_on_network_host.py [--wav path/to/speech.wav]

It exits non-zero with a precise diagnosis if either check fails. Passing a
real speech wav (16 kHz+, a few seconds) makes the tokenizer check stronger
than the synthetic default.

Stage A (s3tokenizer):
  1. downloads the upstream `speech_tokenizer_v2_25hz` checkpoint,
  2. runs `utils.weights.convert_s3tokenizer` over its state dict with FULL
     key-coverage validation (any unconsumed/missing tensor fails loudly),
  3. compares our mel frontend to the package's `log_mel_spectrogram`,
  4. asserts token-identical output of our JAX model vs the torch model.

Stage B (Perth):
  1. instantiates `perth.PerthImplicitWatermarker`, applies + detects on a
     synthetic wav (the deployment contract, reference tts.py:64,1463-1469),
  2. confirms `utils.watermark.get_watermarker()` auto-selects Perth when
     importable (so deployed services satisfy the contract automatically),
  3. documents the expected NON-compatibility of the offline fallback mark
     (Perth must NOT detect it, and vice versa).
"""
from __future__ import annotations

import argparse
import sys

import numpy as np


def _synthetic_speech(sr: int, seconds: float = 3.0, seed: int = 0) -> np.ndarray:
    """Deterministic speech-ish fixture: gated harmonic stack + noise floor."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * sr)) / sr
    f0 = 130.0 * (1.0 + 0.08 * np.sin(2 * np.pi * 0.7 * t))
    phase = 2 * np.pi * np.cumsum(f0) / sr
    wav = sum((0.5 / k) * np.sin(k * phase) for k in range(1, 9))
    env = np.clip(np.sin(2 * np.pi * 1.8 * t), 0.0, 1.0)
    wav = wav * env + 0.003 * rng.standard_normal(t.shape)
    return (0.7 * wav / np.abs(wav).max()).astype(np.float32)


def verify_s3tokenizer(wav_path: str | None) -> bool:
    print("=== Stage A: upstream s3tokenizer parity ===")
    try:
        import torch
        import s3tokenizer as s3t
    except ImportError as e:
        print(f"FAIL: cannot import required package ({e}).\n"
              "      pip install s3tokenizer torch")
        return False

    model = s3t.load_model("speech_tokenizer_v2_25hz").eval()
    sd = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
    print(f"  checkpoint loaded: {len(sd)} tensors")

    # -- converter key coverage (fails loudly on any layout drift)
    from chatterbox_embed_tpu.utils.weights import (_convert_validated,
                                                    convert_s3tokenizer)
    try:
        params = _convert_validated(
            lambda d: convert_s3tokenizer(d, prefix=""), sd,
            ignore=(r"_mel_filters", r"window"))
    except (KeyError, ValueError) as e:
        print(f"FAIL: converter coverage: {e}")
        return False
    print(f"  converter coverage OK ({len(params['blocks'])} SAN-M blocks)")

    # -- fixture wav at 16 kHz
    sr = 16_000
    if wav_path:
        import librosa
        wav, _ = librosa.load(wav_path, sr=sr)
        wav = wav.astype(np.float32)
        print(f"  fixture: {wav_path} ({len(wav) / sr:.2f}s)")
    else:
        wav = _synthetic_speech(sr)
        print("  fixture: synthetic harmonic speech (pass --wav for real speech)")

    from chatterbox_embed_tpu.models import s3tokenizer as s3_mod
    wav = s3_mod.pad_to_token_multiple(wav, sr)

    # -- mel frontend parity (localizes a failure to DSP vs model)
    ref_mel = s3t.log_mel_spectrogram(torch.from_numpy(wav)).numpy()
    from chatterbox_embed_tpu.ops import mel as mel_ops
    our_mel = np.asarray(mel_ops.log_mel_s3tokenizer(wav[None]))[0]
    n = min(ref_mel.shape[-1], our_mel.shape[-1])
    mel_err = float(np.abs(ref_mel[..., :n] - our_mel[..., :n]).max())
    print(f"  mel frontend max|diff| = {mel_err:.3e} "
          f"(ref {ref_mel.shape} vs ours {our_mel.shape})")
    if mel_err > 1e-3:
        print("FAIL: mel frontends diverge — fix ops/mel.py:log_mel_s3tokenizer "
              "before looking at the model")
        return False

    # -- token parity: upstream torch quantize vs our JAX quantize
    mels, mel_lens = s3t.padding([torch.from_numpy(ref_mel)])
    with torch.no_grad():
        ref_tokens, ref_lens = model.quantize(mels, mel_lens)
    ref_tokens = ref_tokens[0, : int(ref_lens[0])].cpu().numpy()

    our_tokens, our_lens = s3_mod.quantize(
        params, our_mel[None], np.asarray([our_mel.shape[-1]], np.int32))
    our_tokens = np.asarray(our_tokens)[0, : int(np.asarray(our_lens)[0])]

    n = min(len(ref_tokens), len(our_tokens))
    agree = float(np.mean(ref_tokens[:n] == our_tokens[:n])) if n else 0.0
    print(f"  tokens: upstream {len(ref_tokens)} vs ours {len(our_tokens)}, "
          f"agreement {agree * 100:.2f}%")
    if len(ref_tokens) != len(our_tokens) or agree < 1.0:
        bad = np.nonzero(ref_tokens[:n] != our_tokens[:n])[0][:10]
        print(f"FAIL: token parity (first mismatches at {bad.tolist()})")
        return False
    print("PASS: upstream checkpoint converts cleanly and tokens are identical")
    return True


def verify_perth() -> bool:
    print("=== Stage B: Perth watermark compatibility ===")
    try:
        import perth
    except ImportError as e:
        print(f"FAIL: cannot import perth ({e}).\n      pip install resemble-perth")
        return False

    sr = 24_000
    wav = _synthetic_speech(sr, seconds=2.0, seed=1)

    wm = perth.PerthImplicitWatermarker()
    marked = wm.apply_watermark(wav, sample_rate=sr)
    score = float(wm.get_watermark(marked, sample_rate=sr))
    print(f"  perth apply->detect score: {score:.3f}")
    if score < 0.5:
        print("FAIL: Perth did not detect its own mark")
        return False

    # the deployed selector must pick Perth automatically when importable
    from chatterbox_embed_tpu.utils import watermark as wm_mod
    selected = wm_mod.get_watermarker()
    if selected.__class__.__module__.split(".")[0] != "perth":
        print(f"FAIL: get_watermarker() selected {type(selected)} even though "
              "perth is importable — deployments would ship the fallback mark")
        return False
    print(f"  get_watermarker() -> {type(selected).__name__} (perth) OK")

    # document the expected NON-compatibility both ways
    fb = wm_mod.ImplicitWatermarker()
    fb_marked = fb.apply_watermark(wav, sample_rate=sr)
    cross1 = float(wm.get_watermark(fb_marked, sample_rate=sr))
    cross2 = float(fb.get_watermark(marked, sample_rate=sr))
    print(f"  cross-detection (expected ~0): perth-on-fallback {cross1:.3f}, "
          f"fallback-on-perth {cross2:.3f}")
    if cross1 >= 0.5:
        print("  NOTE: perth unexpectedly detects the fallback mark — harmless "
              "but surprising; please report")
    print("PASS: Perth watermarking is active and the deployment contract holds")
    return True


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--wav", default=None,
                    help="real speech wav for the tokenizer parity check")
    ap.add_argument("--skip-tokenizer", action="store_true")
    ap.add_argument("--skip-perth", action="store_true")
    args = ap.parse_args()

    ok = True
    if not args.skip_tokenizer:
        ok = verify_s3tokenizer(args.wav) and ok
    if not args.skip_perth:
        ok = verify_perth() and ok
    print("\nALL CHECKS PASSED" if ok else "\nVERIFICATION FAILED")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
