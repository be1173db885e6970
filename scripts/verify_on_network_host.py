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

Stages C-E close the other real-deployment question (round-4 verdict item
3): "are the promoted TPU perf defaults safe on REAL weights?" — every
default was gated on full-size RANDOM weights in the build container.
All three need the real checkpoint; it is downloaded from
`ResembleAI/chatterbox` automatically (or pass --ckpt DIR with
ve/t3_cfg/s3gen.safetensors + tokenizer.json + conds.pt):

  C. int8 T3 weights (DEFAULT ON for TPU) + int8 KV cache (default for the
     batched XLA decode): scripts/int8_quality_gate.py --ckpt ... --kv 1 —
     margin-conditioned top-1 >= 97%, median KL < 0.02, mel cos >= 0.995,
     prefill-logit cosine + first-divergence for the KV cache.
  D. CFM DeepCache K=2 (default at >= 8 live rows/dispatch):
     scripts/cfm_cache_gate.py --ckpt ... --ks 2 — mel cosine >= 0.995,
     rel L2 < 0.10 per row vs the exact solver on the deployed weights.
  E. Streaming C/M window render: synthesizes the SAME text through
     stream_generate (default CHATTERBOX_STREAM_CTX/VOC_CTX geometry) and
     the non-streamed path on real weights, writes both wavs next to the
     checkpoint for the final LISTENING check PERF_NOTES round-4 q4i
     defers (window sufficiency is unmeasurable on random weights), and
     reports their rel-L2 for the record (advisory, not a hard bound —
     the streamed path is windowed by design).
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

import numpy as np

REPO_ID = "ResembleAI/chatterbox"
CKPT_FILES = ["ve.safetensors", "t3_cfg.safetensors", "s3gen.safetensors",
              "tokenizer.json", "conds.pt"]


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


def _resolve_ckpt(ckpt: str | None) -> str | None:
    """Local checkpoint dir, downloading from HF when not given."""
    if ckpt:
        missing = [f for f in CKPT_FILES
                   if not os.path.exists(os.path.join(ckpt, f))]
        if missing:
            print(f"FAIL: --ckpt {ckpt} is missing {missing}")
            return None
        return ckpt
    try:
        from huggingface_hub import hf_hub_download
    except ImportError:
        print("FAIL: huggingface_hub unavailable and no --ckpt given.\n"
              "      pip install huggingface_hub")
        return None
    path = None
    try:
        for f in CKPT_FILES:
            path = hf_hub_download(repo_id=REPO_ID, filename=f)
    except Exception as e:  # noqa: BLE001 — any download failure is a FAIL verdict
        print(f"FAIL: could not download {REPO_ID} ({type(e).__name__}: {e}).\n"
              "      Check network access or pass --ckpt DIR with the files "
              f"{CKPT_FILES}")
        return None
    print(f"  checkpoint: {os.path.dirname(path)}")
    return os.path.dirname(path)


def _run_gate(script: str, extra: list[str], want) -> bool:
    """Run a gate script as a subprocess and evaluate its JSON verdict."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [repo] + [p for p in env.get("PYTHONPATH", "").split(os.pathsep) if p])
    cmd = [sys.executable, os.path.join(repo, "scripts", script)] + extra
    print(f"  $ {' '.join(cmd[1:])}")
    p = subprocess.run(cmd, env=env, capture_output=True, text=True)
    sys.stderr.write(p.stderr[-4000:])
    if p.returncode != 0:
        print(f"FAIL: {script} exited {p.returncode}")
        return False
    try:
        result = json.loads(p.stdout.strip().splitlines()[-1])
    except (json.JSONDecodeError, IndexError):
        print(f"FAIL: {script} printed no JSON verdict")
        return False
    ok = want(result)
    print(f"  {script}: {json.dumps(result)[:400]}")
    return bool(ok)


def verify_int8_defaults(ckpt: str) -> bool:
    print("=== Stage C: int8 weight + int8-KV quality gate on the real "
          "checkpoint ===")
    ok = _run_gate("int8_quality_gate.py", ["--ckpt", ckpt, "--kv", "1"],
                   lambda r: r.get("pass")
                   and r.get("kv_int8", {}).get("pass"))
    print("PASS: int8 defaults hold on deployed weights" if ok
          else "FAIL: int8 gate — set CHATTERBOX_INT8=0 / CHATTERBOX_INT8_KV=0 "
               "until resolved")
    return ok


def verify_cfm_cache(ckpt: str) -> bool:
    print("=== Stage D: CFM DeepCache K=2 mel gate on the real checkpoint ===")
    ok = _run_gate("cfm_cache_gate.py", ["--ckpt", ckpt, "--ks", "2"],
                   lambda r: "2" in r.get("pass_ks", []))
    print("PASS: CFM K=2 cache holds on deployed weights" if ok
          else "FAIL: CFM gate — set CHATTERBOX_CFM_CACHE=0 until resolved")
    return ok


def verify_streaming_render(ckpt: str, out_dir: str | None) -> bool:
    """Stage E: render the streamed and non-streamed paths on real weights
    for the final listening check (PERF_NOTES q4i defers C/M window
    sufficiency to exactly this)."""
    print("=== Stage E: streaming C/M window render (listening check) ===")
    from scipy.io import wavfile as sf_wav
    from chatterbox_embed_tpu.tts import ChatterboxTTS

    tts = ChatterboxTTS.from_local(ckpt)
    if tts.conds is None:
        print("FAIL: conds.pt missing — stage E needs the builtin voice")
        return False
    text = ("The quick brown fox jumps over the lazy dog, "
            "and keeps on running through the quiet morning streets.")
    chunks = list(tts.stream_generate(text, temperature=0.7, cfg_weight=0.5,
                                      seed=3))
    streamed = np.concatenate(chunks) if chunks else np.zeros(0, np.float32)
    batch = np.asarray(tts.generate(text, temperature=0.7, cfg_weight=0.5,
                                    seed=3)).reshape(-1)
    out_dir = out_dir or (ckpt if os.access(ckpt, os.W_OK) else ".")
    p_s = os.path.join(out_dir, "verify_stream.wav")
    p_b = os.path.join(out_dir, "verify_batch.wav")
    sf_wav.write(p_s, tts.sr, np.clip(streamed, -1, 1).astype(np.float32))
    sf_wav.write(p_b, tts.sr, np.clip(batch, -1, 1).astype(np.float32))
    n = min(streamed.size, batch.size)
    rel = (float(np.linalg.norm(streamed[:n] - batch[:n])
                 / (np.linalg.norm(batch[:n]) + 1e-12)) if n else 1.0)
    rms = float(np.sqrt(np.mean(streamed**2))) if streamed.size else 0.0
    print(f"  streamed {streamed.size / tts.sr:.2f}s vs batch "
          f"{batch.size / tts.sr:.2f}s, overlap rel-L2 {rel:.3f} (advisory), "
          f"stream rms {rms:.4f}")
    print(f"  LISTEN to both: {p_s}  |  {p_b}")
    ok = streamed.size > tts.sr // 2 and rms > 1e-4
    print("PASS: streamed render is live audio — do the listen" if ok
          else "FAIL: streamed render is empty/silent")
    return ok


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--wav", default=None,
                    help="real speech wav for the tokenizer parity check")
    ap.add_argument("--ckpt", default=None,
                    help="dir with the real checkpoint files (downloaded "
                         "from HF when omitted)")
    ap.add_argument("--out-dir", default=None,
                    help="where stage E writes the listening wavs")
    ap.add_argument("--skip-tokenizer", action="store_true")
    ap.add_argument("--skip-perth", action="store_true")
    ap.add_argument("--skip-int8", action="store_true")
    ap.add_argument("--skip-cfm", action="store_true")
    ap.add_argument("--skip-stream", action="store_true")
    args = ap.parse_args()

    ok = True
    if not args.skip_tokenizer:
        ok = verify_s3tokenizer(args.wav) and ok
    if not args.skip_perth:
        ok = verify_perth() and ok
    if not (args.skip_int8 and args.skip_cfm and args.skip_stream):
        ckpt = _resolve_ckpt(args.ckpt)
        if ckpt is None:
            ok = False
        else:
            if not args.skip_int8:
                ok = verify_int8_defaults(ckpt) and ok
            if not args.skip_cfm:
                ok = verify_cfm_cache(ckpt) and ok
            if not args.skip_stream:
                ok = verify_streaming_render(ckpt, args.out_dir) and ok
    print("\nALL CHECKS PASSED" if ok else "\nVERIFICATION FAILED")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
