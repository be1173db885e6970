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

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", help="converted checkpoint dir (default: random weights)")
    args = ap.parse_args()

    os.environ.setdefault("CHATTERBOX_LOCAL_STORAGE", tempfile.mkdtemp(prefix="cb_store_"))

    from chatterbox_embed_tpu import ChatterboxVC
    if args.ckpt:
        vc = ChatterboxVC.from_local(args.ckpt)
    else:
        # hermetic smoke: tiny random config exercises the identical code path
        import os as _os
        _os.environ.setdefault("JAX_PLATFORMS", "cpu")
        import jax as _jax
        try:
            _jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
        import sys as _sys
        _sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), "..", "tests"))
        from test_pipeline import TINY
        import chatterbox_embed_tpu.vc as vcmod
        vcmod._TOKEN_BUCKETS = (32, 64, 128)
        vc = ChatterboxVC.from_random(config=TINY)

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
