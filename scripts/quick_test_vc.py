"""Deploy-readiness smoke test (reference: quick_test_vc.py — generates a
440 Hz sine wav and runs the full create_voice_clone pipeline end-to-end;
exit code signals readiness).

Runs with random weights in hermetic environments (--random, default when no
checkpoint directory is given).
"""
import argparse
import os
import sys
import tempfile

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", help="converted checkpoint dir (default: random weights)")
    args = ap.parse_args()

    os.environ.setdefault("CHATTERBOX_LOCAL_STORAGE", tempfile.mkdtemp(prefix="cb_store_"))

    from chatterbox_embed_tpu import ChatterboxVC
    vc = ChatterboxVC.from_local(args.ckpt) if args.ckpt else ChatterboxVC.from_random()

    # test 1: the TTS integration point exists (the reference asserts a
    # text_encoder wiring; ours is the built-in t3 path)
    assert vc.t3_params is not None and vc.tokenizer is not None, "tts path missing"
    print("TEST 1 PASSED: profile-based TTS path wired")

    # test 2: full clone pipeline on a synthetic voice
    sr = 24_000
    t = np.arange(3 * sr) / sr
    wav = (0.4 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
    from chatterbox_embed_tpu.stitching.stitcher import write_wav
    with tempfile.NamedTemporaryFile(suffix=".wav", delete=False) as f:
        write_wav(f.name, wav, sr)
        path = f.name
    try:
        result = vc.create_voice_clone(path, voice_id="smoke_voice",
                                       voice_name="Smoke Voice", user_id="smoke")
    finally:
        os.unlink(path)
    assert result["status"] == "success", result
    assert "profile_url" in result and "sample_url" in result
    print("TEST 2 PASSED: create_voice_clone end-to-end")
    print("READY")
    return 0


if __name__ == "__main__":
    sys.exit(main())
